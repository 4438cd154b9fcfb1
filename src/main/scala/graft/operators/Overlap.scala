package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.functions._

/** Audience / segment overlap: for every pair of segments, how many
  * distinct members they share (|A∩B|, |A∪B|, Jaccard) — the OLAP query
  * behind audience planning, cohort comparison, and dedup-across-sources
  * reporting.
  *
  * Scale shape: the naive form is a distinct-(member, segment) self-join
  * on member — one shuffle of the FULL membership per segment pair. Here
  * each segment is collapsed to a dense bitset by a mergeable typed
  * `Aggregator` (elementwise-OR merge ⇒ map-side partials, one bitset per
  * partition per segment on the wire), and the pairwise popcount algebra
  * runs over the segments-×-segments table — rows = segment count, not
  * member count. With |members| = 1e9 a bitset is 125 MB: still one row
  * per segment, but at that width switch to compressed (roaring) bitmaps
  * or KMV sketches ([[graft.functions.BottomKAgg]]) — the exact-join
  * fallback below this file's popcount algebra stays the verify pass.
  */
object Overlap {

  /** Mergeable dense bitset over member ids in [0, numBits). Out-of-range
    * ids fail loudly — silent truncation would corrupt the counts. */
  class BitsetAgg(val numBits: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits > 0, "numBits must be positive")
    private val words = (numBits + 63) >>> 6

    override def zero: Array[Long] = new Array[Long](words)

    override def reduce(bits: Array[Long], x: Long): Array[Long] = {
      require(x >= 0 && x < numBits, s"member id $x outside [0, $numBits)")
      bits((x >>> 6).toInt) |= 1L << (x & 63)
      bits
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(bits: Array[Long]): Array[Long] = bits

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Pairwise segment overlap matrix (upper triangle, seg_a < seg_b):
    * (seg_a, seg_b, n_a, n_b, n_common, n_union, jaccard). Exact —
    * the bitsets are exact distinct-member sets, and every output number
    * is integer popcount algebra (jaccard an exact rational, rounded 6dp).
    */
  /** As the explicit-width overload, but the bitset width is derived from
    * the data: one scalar `max(memberCol)` pre-pass (a single-row driver
    * action, not a collect) sizes the aggregator, so the operator never
    * fails on a larger scale factor just because a hard-coded ceiling was
    * tuned for a smaller one. Widths past 2^27 bits (16 MB of buffer per
    * segment on the shuffle wire) fail loudly with the roaring/KMV advice
    * from the header — a dense bitmap is the wrong tool there.
    */
  def segmentOverlap(events: DataFrame, segCol: String,
      memberCol: String): DataFrame = {
    val mxRow = events.agg(max(col(memberCol).cast("long"))).head()
    require(!mxRow.isNullAt(0),
      s"cannot derive a bitset width: max($memberCol) is null — empty " +
        "input, or a member column that casts to all-null longs")
    val mx = mxRow.getLong(0)
    require(mx >= 0, s"max($memberCol) is negative: $mx")
    require(mx + 1 <= (1L << 27),
      s"max($memberCol)=$mx needs a ${(mx + 1 + 63) >>> 6}-word dense " +
        "bitset per segment; use roaring bitmaps or the KMV sketch " +
        "(BottomKAgg) at this width")
    segmentOverlap(events, segCol, memberCol, (mx + 1).toInt)
  }

  def segmentOverlap(events: DataFrame, segCol: String, memberCol: String,
      maxMembers: Int): DataFrame = {
    val bm = udaf(new BitsetAgg(maxMembers))
    val segs = events
      .groupBy(col(segCol).as("seg"))
      .agg(bm(col(memberCol).cast("long")).as("bits"))
    val pop = udf { (a: Array[Long]) =>
      var s = 0L; var i = 0
      while (i < a.length) { s += java.lang.Long.bitCount(a(i)); i += 1 }
      s
    }
    val popAnd = udf { (a: Array[Long], b: Array[Long]) =>
      var s = 0L; var i = 0
      while (i < a.length) { s += java.lang.Long.bitCount(a(i) & b(i)); i += 1 }
      s
    }
    segs.select(col("seg").as("seg_a"), col("bits").as("_ba"))
      .join(segs.select(col("seg").as("seg_b"), col("bits").as("_bb")),
        col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        pop(col("_ba")).as("n_a"), pop(col("_bb")).as("n_b"),
        popAnd(col("_ba"), col("_bb")).as("n_common"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_common"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") / col("n_union"), 6))
  }
}
