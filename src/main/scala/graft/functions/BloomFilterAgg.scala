package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Mergeable Bloom filter over 64-bit element hashes, as a typed Dataset
  * `Aggregator` (the UDAF tier of SURVEY §2.9).
  *
  * The buffer is the raw bitset (`Array[Long]`, `numBits/64` words) and
  * `merge` is elementwise OR — Bloom filters built over disjoint partitions
  * OR together into exactly the filter a single pass would have built, so
  * Spark's partial aggregation ships one bitset per partition instead of
  * the element stream. `finish` returns the bitset itself; probing happens
  * wherever the (broadcast) bitset travels via [[BloomFilterAgg.mightContain]].
  *
  * Probe positions use Kirsch–Mitzenmacher double hashing: position_i =
  * h1 + i·h2 mod m, with h1/h2 derived from the input hash by the same
  * splitmix64 finalizer the shingle hashes use. False-positive rate for n
  * elements is ~(1 − e^(−k·n/m))^k; with the default k = 7 and
  * m = 10·n bits it is < 1%. False positives only ever ADMIT a candidate —
  * exactness is restored by a verify pass (see `Curation.decontaminateBloom`).
  */
class BloomFilterAgg(val numBits: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits > 0 && numBits % 64 == 0, "numBits must be a multiple of 64")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(bits: Array[Long], x: Long): Array[Long] = {
    BloomFilterAgg.set(bits, x)
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

object BloomFilterAgg {
  /** Probes per element. */
  val NumHashes = 7

  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private[functions] def set(bits: Array[Long], x: Long): Unit = {
    val m = bits.length * 64
    val h1 = mix(x); val h2 = mix(h1) | 1L
    var i = 0
    while (i < NumHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, m).toInt
      bits(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  /** True if `x` may be in the set; false means definitely absent. */
  def mightContain(bits: Array[Long], x: Long): Boolean = {
    val m = bits.length * 64
    val h1 = mix(x); val h2 = mix(h1) | 1L
    var i = 0
    while (i < NumHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, m).toInt
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bit size giving ~`bitsPerElement` bits per expected element, rounded
    * up to a whole number of 64-bit words (min one word). */
  def sizeFor(expectedElements: Long, bitsPerElement: Int = 10): Int = {
    val want = math.max(64L, expectedElements * bitsPerElement)
    (((want + 63) / 64) * 64).min(1L << 30).toInt
  }
}
