package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val depth = 3
  private val width = 8

  test("every row of the matrix sums to the total occurrence count") {
    val items = Seq("a", "b", "a", "c", "a", "b")
    val agg = new CountMinAgg(depth, width)
    val sketch = items.foldLeft(agg.zero)(agg.reduce)
    for (r <- 0 until depth)
      assert((0 until width).map(b => sketch(r * width + b)).sum == 6L)
  }

  test("estimate is never below the true count (one-sided error)") {
    val items = Seq.fill(5)("hot") ++ ('a' to 'z').map(_.toString)
    val agg = new CountMinAgg(depth, width)
    val sketch = items.foldLeft(agg.zero)(agg.reduce)
    assert(CountMinAgg.estimate(sketch, depth, width, "hot") >= 5L)
    for (c <- 'a' to 'z')
      assert(CountMinAgg.estimate(sketch, depth, width, c.toString) >= 1L)
  }

  test("merge of split halves equals single-pass build") {
    val items = (1 to 40).map(i => s"item${i % 7}")
    val agg = new CountMinAgg(depth, width)
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(
      items.take(13).foldLeft(agg.zero)(agg.reduce),
      items.drop(13).foldLeft(agg.zero)(agg.reduce))
    assert(whole.toSeq == merged.toSeq)
  }

  test("bucket matches the SQL restatement formula") {
    // md5("x:0") first 8 hex chars, unsigned, mod width — recompute via
    // BigInt to cross-check the byte arithmetic
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("x:0".getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    assert(CountMinAgg.bucket("x", 0, width) ==
      (BigInt(hex, 16) % width).toInt)
  }

  test("distributed build over a DataFrame matches the local build") {
    val items = (1 to 200).map(i => s"v${i % 17}")
    val df = items.toDF("x")
    val got = graft.operators.Frequency
      .countMinSketch(df, "x", depth, width)
      .as[(Int, Int, Long)].collect()
      .map { case (r, b, c) => (r * width + b) -> c }.toMap
    val agg = new CountMinAgg(depth, width)
    val local = items.foldLeft(agg.zero)(agg.reduce)
    assert(got.size == depth * width)
    for (i <- 0 until depth * width) assert(got(i) == local(i))
  }
}
