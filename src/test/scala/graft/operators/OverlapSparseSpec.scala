package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 roaring-style segment overlap: the compressed path must be
  * row-identical to the dense popcount path on the shared id range
  * (the cost-chooser contract — switching representations can never
  * change an answer), handle id spaces the dense path refuses, and its
  * container algebra must be exact across the array/bitmap kind
  * boundary (conversion at cardinality 1024). */
class OverlapSparseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("seg_a", "seg_b")
      .collect()
      .map(r => (r.getAs[String]("seg_a"), r.getAs[String]("seg_b"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_common"), r.getAs[Long]("n_union"),
        r.getAs[Double]("jaccard"))).toSeq

  test("sparse path row-identical to dense path on int-range ids, " +
    "including a bitmap-converted chunk") {
    // s1: 1500 members in chunk 0 (forces array→bitmap conversion at
    // 1024) + a sparse tail in chunk 3; s2 overlaps half of each; s3
    // disjoint chunk entirely
    val rows =
      (0L until 1500L).map(("s1", _)) ++
        Seq(("s1", 200000L), ("s1", 200001L)) ++
        (750L until 2250L).map(("s2", _)) ++ Seq(("s2", 200001L)) ++
        (70000L until 70040L).map(("s3", _))
    val ev = rows.toDF("seg", "user").repartition(8)
    val dense = canon(Overlap.segmentOverlap(ev, "seg", "user", 1 << 20))
    val sparse = canon(Overlap.segmentOverlapSparse(ev, "seg", "user"))
    assert(dense == sparse)
    // hand-check the s1/s2 row: |s1|=1502, |s2|=1501, common=750..1499 +
    // 200001 = 751
    val r12 = sparse.find(r => r._1 == "s1" && r._2 == "s2").get
    assert(r12._3 == 1502L && r12._4 == 1501L && r12._5 == 751L &&
      r12._6 == 2252L)
  }

  test("candidate pre-filter reconstructs zero-overlap rows exactly " +
    "(disjoint per-tenant id spaces)") {
    // round-12 output-sensitivity: 6 tenants in fully disjoint chunk
    // ranges plus one genuinely overlapping pair — the bitmap join sees
    // only candidates sharing a container key, yet the contract's full
    // C(8,2) upper triangle (zero rows included) must come out intact
    val rows = (0 until 6).flatMap { t =>
      val base = (t.toLong + 1) * (1L << 20)
      (0L until 50L).map(m => (s"t$t", base + m))
    } ++ (0L until 30L).map(m => ("x1", 99L + m)) ++
      (0L until 30L).map(m => ("x2", 109L + m))
    val ev = rows.toDF("seg", "user").repartition(4)
    val out = canon(Overlap.segmentOverlapSparse(ev, "seg", "user"))
    assert(out.size == 8 * 7 / 2, "full upper triangle expected")
    assert(out.count(_._5 > 0) == 1, "exactly one overlapping pair")
    val x = out.find(r => r._1 == "x1" && r._2 == "x2").get
    assert(x._5 == 20L && x._6 == 40L && x._7 == 0.5)
    // and the whole table must still match the dense path bit-for-bit
    assert(out == canon(Overlap.segmentOverlap(ev, "seg", "user", 1 << 24)))
  }

  test("auto overload dispatches to the sparse path past 2^27 and stays " +
    "exact on a 5e9-wide id space") {
    val wide = Seq(
      ("a", 5L), ("a", 5000000000L), ("a", 5000000001L),
      ("b", 5L), ("b", 5000000001L), ("b", 7000000000L))
      .toDF("seg", "user")
    val out = canon(Overlap.segmentOverlap(wide, "seg", "user"))
    assert(out == Seq(("a", "b", 3L, 3L, 2L, 4L, 0.5)))
  }

  test("sparse reduce rejects ids outside [0, 2^47) loudly") {
    val bad = Seq(("s", 1L << 47)).toDF("seg", "user")
    val e = intercept[Exception] {
      Overlap.segmentOverlapSparse(bad, "seg", "user").collect()
    }
    var c: Throwable = e
    while (c.getCause != null && (c.getCause ne c)) c = c.getCause
    assert(c.getMessage != null && c.getMessage.contains("2^47"))
  }

  test("container algebra: or/and exact across array and bitmap kinds") {
    val arrA = Array(1L, 5L, 9L, 100L)
    val arrB = Array(5L, 9L, 200L)
    val big = (0L until 1500L).toArray // becomes bitmap on conversion
    val bmp = Overlap.toBitmap(big)
    assert(Overlap.isBitmap(bmp) && Overlap.containerCard(bmp) == 1500L)
    // array ∪ array stays array below 1024, exact sorted union
    val u = Overlap.containerOr(arrA, arrB)
    assert(!Overlap.isBitmap(u) && u.toSeq == Seq(1L, 5L, 9L, 100L, 200L))
    // array ∪ array crossing 1024 converts to bitmap, same cardinality.
    // (1023-value arrays: by construction an ARRAY container never
    // reaches length 1024 — that length always means bitmap)
    val evens = (0L until 2046L by 2).toArray
    val odds = (1L until 2046L by 2).toArray
    val conv = Overlap.containerOr(evens, odds)
    assert(Overlap.isBitmap(conv) && Overlap.containerCard(conv) == 2046L)
    // and-cardinalities across all kind pairs
    assert(Overlap.containerAndCard(arrA, arrB) == 2L)
    assert(Overlap.containerAndCard(arrA, bmp) == 4L)
    assert(Overlap.containerAndCard(bmp, arrA) == 4L)
    assert(Overlap.containerAndCard(bmp, Overlap.toBitmap(evens)) ==
      750L) // evens < 1500
  }
}
