package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TDigestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic log-normal-ish heavy tail: rank error is the honest
  // metric (value error explodes on the tail by construction)
  private def skewed(n: Int): IndexedSeq[Double] =
    (0 until n).map { i =>
      val u = (i * 2654435761L % 1000003L).toDouble / 1000003.0
      math.exp(6.0 * u) // 1 .. ~400
    }

  private def rankOf(sorted: IndexedSeq[Double], x: Double): Double = {
    val below = sorted.count(_ <= x)
    below.toDouble / sorted.size
  }

  test("rank error stays under 1% at compression 100 on a heavy tail") {
    val xs = skewed(50000)
    val agg = new TDigestAgg(100.0)
    val digest = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(digest.length <= 200, s"centroids=${digest.length}")
    assert(digest.map(_._2).sum == 50000L) // weight conservation
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999)) {
      val est = TDigestAgg.quantile(digest, q)
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err < 0.01, s"q=$q est=$est rankErr=$err")
    }
    // extremes clamp to the outermost centroid means, which sit inside
    // the data range and within the tail rank bound
    val lo = TDigestAgg.quantile(digest, 0.0)
    val hi = TDigestAgg.quantile(digest, 1.0)
    assert(lo >= sorted.head && hi <= sorted.last)
    assert(rankOf(sorted, lo) < 0.005 && rankOf(sorted, hi) > 0.995)
  }

  test("merge of partial digests matches the single-pass error bound") {
    val xs = skewed(30000)
    val agg = new TDigestAgg(100.0)
    // three partials in interleaved order (as partitions would see them)
    val parts = (0 until 3).map(p =>
      xs.zipWithIndex.collect { case (x, i) if i % 3 == p => x })
    val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = agg.finish(partials.reduce(agg.merge))
    assert(merged.map(_._2).sum == 30000L)
    val sorted = xs.sorted
    for (q <- Seq(0.05, 0.5, 0.95, 0.99)) {
      val err = math.abs(rankOf(sorted, TDigestAgg.quantile(merged, q)) - q)
      assert(err < 0.01, s"q=$q rankErr=$err")
    }
    // associativity of the error bound: (a+b)+c vs a+(b+c) both in spec
    val alt = agg.finish(agg.merge(partials(0), agg.merge(partials(1), partials(2))))
    for (q <- Seq(0.5, 0.99)) {
      val err = math.abs(rankOf(sorted, TDigestAgg.quantile(alt, q)) - q)
      assert(err < 0.01, s"alt merge q=$q rankErr=$err")
    }
  }

  test("cdf inverts quantile within the same rank bound") {
    val xs = skewed(20000)
    val agg = new TDigestAgg(100.0)
    val digest = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val x = TDigestAgg.quantile(digest, q)
      assert(math.abs(TDigestAgg.cdf(digest, x) - q) < 0.015, s"q=$q")
    }
    assert(TDigestAgg.cdf(digest, Double.NegativeInfinity) == 0.0)
    assert(TDigestAgg.cdf(digest, Double.PositiveInfinity) == 1.0)
  }

  test("small groups are exact (every point its own centroid)") {
    val xs = IndexedSeq(3.0, 1.0, 4.0, 1.5, 9.0)
    val agg = new TDigestAgg(100.0)
    val digest = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(digest.map(_._1) == xs.sorted)
    assert(TDigestAgg.quantile(digest, 0.5) == 3.0)
  }

  test("distributed aggregate stays within the rank bound per group") {
    val xs = skewed(12000)
    val df = xs.zipWithIndex
      .map { case (x, i) => (i % 4, x) }.toDF("g", "x")
      .repartition(8)
    val tdAgg = udaf(new TDigestAgg(100.0))
    val rows = df.groupBy("g").agg(tdAgg(col("x")).as("td")).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val g = r.getInt(0)
      val digest = r.getSeq[org.apache.spark.sql.Row](1)
        .map(c => (c.getDouble(0), c.getLong(1)))
      val mine = xs.zipWithIndex.collect { case (x, i) if i % 4 == g => x }.sorted
      assert(digest.map(_._2).sum == mine.size.toLong)
      for (q <- Seq(0.5, 0.95)) {
        val err = math.abs(rankOf(mine, TDigestAgg.quantile(digest, q)) - q)
        assert(err < 0.015, s"g=$g q=$q rankErr=$err")
      }
    }
  }
}
