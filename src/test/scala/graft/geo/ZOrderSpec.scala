package graft.geo

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def refSpread(v0: Long): Long = {
    var v = v0
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    (v | (v << 1)) & 0x55555555L
  }
  private def refZ(lat: Double, lon: Double): Long = {
    val latQ = math.floor((lat + 90.0) / 180.0 * 65535.0).toLong
    val lonQ = math.floor((lon + 180.0) / 360.0 * 65535.0).toLong
    refSpread(latQ) | (refSpread(lonQ) << 1)
  }

  test("zValue matches the reference Morton interleave bit for bit") {
    val pts = Seq((-90.0, -180.0), (0.0, 0.0), (89.9, 179.9),
      (-33.87, 151.21), (51.5, -0.13))
    val got = pts.toDF("lat", "lon")
      .select(ZOrder.zValue(col("lat"), col("lon")).as("z"))
      .as[Long].collect().toSeq
    assert(got == pts.map { case (la, lo) => refZ(la, lo) })
  }

  test("z ordering keeps nearby points together") {
    // points in two far-apart clusters; sorted by z, each cluster's points
    // must be contiguous (spatial locality of the curve)
    val cluster1 = (0 until 10).map(i => (10.0 + i * 0.001, 20.0, "a"))
    val cluster2 = (0 until 10).map(i => (-60.0 + i * 0.001, -150.0, "b"))
    val order = (cluster1 ++ cluster2).toDF("lat", "lon", "c")
      .select(col("c"), ZOrder.zValue(col("lat"), col("lon")).as("z"))
      .orderBy("z").select("c").as[String].collect().toSeq
    assert(order.sliding(10).exists(_.forall(_ == "a")))
    assert(order.sliding(10).exists(_.forall(_ == "b")))
  }
}
