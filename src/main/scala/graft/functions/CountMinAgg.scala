package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a mergeable typed
  * `Aggregator`: a depth×width counter matrix; each occurrence increments
  * one bucket per row, a point estimate is the min over rows (always an
  * over-estimate; error ≤ εN with ε = e/width at confidence 1 − e^−depth).
  *
  * Why an Aggregator and not `groupBy(item).count()` first: the sketch is
  * for streams/corpora whose ITEM table is itself too large to aggregate
  * comfortably — the buffer is a fixed depth·width array of longs, so the
  * shuffle carries one matrix per partition (map-side partial aggregation)
  * and the item table never materialises. Merge is elementwise add —
  * associative and commutative.
  *
  * Bucket assignment is content-addressed (md5 of `item ++ ":" ++ row`,
  * first 8 hex chars mod width) rather than seeded integer hashing, so the
  * sketch CONTENTS are deterministic on any engine with md5 — the whole
  * matrix hash-checks against a DuckDB restatement (unusual for a sketch;
  * same discipline as the KMV sketch in [[BottomKAgg]]).
  */
class CountMinAgg(val depth: Int, val width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth > 0 && width > 0)

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], v: String): Array[Long] = {
    if (v == null) return buf
    var r = 0
    while (r < depth) {
      buf(r * width + CountMinAgg.bucket(v, r, width)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object CountMinAgg {

  /** Row-r bucket of an item: first 8 hex chars of md5("item:r") mod
    * width — byte-identical to the DuckDB restatement
    * `CAST('0x' || substring(md5(item || ':' || r), 1, 8) AS UBIGINT)
    *  % width`. */
  def bucket(item: String, row: Int, width: Int): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest((item + ":" + row).getBytes("UTF-8"))
    // first 4 bytes = first 8 hex chars, as an unsigned 32-bit value
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (u % width).toInt
  }

  /** Point estimate from a finished sketch: min over depth rows. */
  def estimate(sketch: Array[Long], depth: Int, width: Int,
      item: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(r * width + bucket(item, r, width))
      if (c < best) best = c
      r += 1
    }
    best
  }
}
