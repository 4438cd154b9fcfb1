package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RecordLinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import RecordLinkage.FieldParams

  private val f1 = FieldParams("city", 0.9, 0.1)  // agree +log2(9), disagree +log2(1/9)
  private val f2 = FieldParams("zip", 0.8, 0.2)   // agree +2, disagree +log2(0.25)

  private val df = Seq(
    (1L, 10, "Springfield", "12345"),
    (2L, 10, "springfield ", "12345"),  // agrees on both after normalise
    (3L, 10, "Shelbyville", "12345"),   // agrees on zip only
    (4L, 20, "Springfield", "12345")    // other block — never paired with 1-3
  ).toDF("id", "blk", "city", "zip")

  private def run(tU: Double, tL: Double) =
    RecordLinkage.fellegiSunter(df, "id", "blk", Seq(f1, f2), tU, tL)
      .select("id_a", "id_b", "weight", "decision")
      .as[(Long, Long, Double, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("weights are the summed log2 likelihood ratios") {
    val got = run(3.0, 0.0)
    val both = math.log(9.0) / math.log(2.0) + 2.0
    val zipOnly = math.log((1 - 0.9) / (1 - 0.1)) / math.log(2.0) + 2.0
    assert(math.abs(got((1L, 2L))._1 - both) < 1e-3)
    assert(math.abs(got((1L, 3L))._1 - zipOnly) < 1e-3)
  }

  test("blocking: cross-block pairs never form; ids ordered a < b") {
    val got = run(3.0, 0.0)
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("decisions split at the thresholds") {
    val got = run(3.0, 0.0)
    assert(got((1L, 2L))._2 == "match")      // ≈ 5.17 > 3
    assert(got((2L, 3L))._2 == "nonmatch")   // ≈ −1.17 ≤ 0
  }

  test("null on either side disagrees") {
    val withNull = Seq(
      (1L, 10, null.asInstanceOf[String], "12345"),
      (2L, 10, "springfield", "12345")
    ).toDF("id", "blk", "city", "zip")
    val w = RecordLinkage.fellegiSunter(withNull, "id", "blk",
        Seq(f1, f2), 10.0, -10.0)
      .select("weight").as[Double].head()
    val expect = math.log((1 - 0.9) / (1 - 0.1)) / math.log(2.0) + 2.0
    assert(math.abs(w - expect) < 1e-3)
  }
}
