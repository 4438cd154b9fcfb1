package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Merging t-digest (Dunning's MergingDigest, public algorithm) as a
  * mergeable typed `Aggregator` — the quantile member of the sketch
  * family (CMS = frequency, KMV/HLL = distinct, MG = heavy hitters,
  * Bloom = membership). The buffer is a mean-sorted centroid list
  * `(mean, weight)` bounded by the compression parameter δ: ~2δ
  * centroids regardless of input size, so the shuffle carries O(δ) per
  * group per partition and partial aggregation stays map-side —
  * `percentile_approx`-class machinery, but as an explicit mergeable
  * value usable in `flatMapGroups`, streaming state, and sketch-table
  * joins.
  *
  * Scale function k₁(q) = (δ/2π)·asin(2q−1): cluster capacity shrinks
  * toward the tails, so extreme quantiles (p99, p999 — the SLO numbers)
  * get the most resolution and mid-range clusters absorb the bulk —
  * rank error is O(q(1−q)/δ), tightest exactly where tail latencies
  * live.
  *
  * Determinism: compression of a given centroid multiset is
  * deterministic (stable mean-sort, greedy left-to-right capacity
  * fill); digests built under different partitionings agree to within
  * the rank-error bound (asserted by spec), identically when the merge
  * order is fixed.
  */
class TDigestAgg(val compression: Double = 100.0)
    extends Aggregator[Double, Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(compression >= 20.0, "compression < 20 gives useless accuracy")
  private val bufferCap: Int = (4 * compression).toInt

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], v: Double): Seq[(Double, Long)] = {
    val appended = buf :+ ((v, 1L))
    if (appended.length > bufferCap) TDigestAgg.compress(appended, compression)
    else appended
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    TDigestAgg.compress(a ++ b, compression)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    TDigestAgg.compress(buf, compression)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TDigestAgg {

  /** Greedy merge of a centroid multiset under the k₁ capacity rule:
    * sort by mean, then absorb left-to-right while the cluster's
    * k-interval stays ≤ 1. Deterministic for a given multiset. */
  def compress(cents: Seq[(Double, Long)], compression: Double): Seq[(Double, Long)] = {
    if (cents.length <= 1) return cents.toVector
    val sorted = cents.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum.toDouble
    def k(q: Double): Double =
      compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)
    val out = Vector.newBuilder[(Double, Long)]
    var (curSum, curW) = (sorted.head._1 * sorted.head._2, sorted.head._2)
    var wSoFar = 0L // weight fully emitted
    var kLeft = k(0.0)
    sorted.iterator.drop(1).foreach { case (m, w) =>
      val qRight = (wSoFar + curW + w) / total
      if (k(qRight) - kLeft <= 1.0) { curSum += m * w; curW += w }
      else {
        out += ((curSum / curW, curW))
        wSoFar += curW
        kLeft = k(wSoFar / total)
        curSum = m * w; curW = w
      }
    }
    out += ((curSum / curW, curW))
    out.result()
  }

  /** Quantile estimate by linear interpolation between centroid means
    * (centroid i covers ranks centered at w₁+…+wᵢ₋₁ + wᵢ/2). */
  def quantile(cents: Seq[(Double, Long)], q: Double): Double = {
    require(q >= 0 && q <= 1, "q in [0,1]")
    if (cents.isEmpty) return Double.NaN
    if (cents.length == 1) return cents.head._1
    val total = cents.iterator.map(_._2).sum.toDouble
    val target = q * total
    var cum = 0.0
    var prevMid = 0.0; var prevMean = cents.head._1
    var i = 0
    while (i < cents.length) {
      val (m, w) = cents(i)
      val mid = cum + w / 2.0
      if (target < mid) {
        if (i == 0) return m // below first centroid's center: clamp
        val f = (target - prevMid) / (mid - prevMid)
        return prevMean + f * (m - prevMean)
      }
      prevMid = mid; prevMean = m; cum += w; i += 1
    }
    cents.last._1
  }

  /** Quantile as a Column over the sketch's serialized
    * array<struct<mean,weight>> form (what `udaf(new TDigestAgg)`
    * returns) — extraction is per-group driver-free. */
  def quantileOf(digest: org.apache.spark.sql.Column, q: Double): org.apache.spark.sql.Column = {
    val f = org.apache.spark.sql.functions.udf {
      (cents: Seq[org.apache.spark.sql.Row]) =>
        if (cents == null) Double.NaN
        else quantile(cents.map(r => (r.getDouble(0), r.getLong(1))), q)
    }
    f(digest)
  }

  /** Rank (CDF) estimate of value x — the inverse of [[quantile]]. */
  def cdf(cents: Seq[(Double, Long)], x: Double): Double = {
    if (cents.isEmpty) return Double.NaN
    val total = cents.iterator.map(_._2).sum.toDouble
    var cum = 0.0
    var prevMid = Double.NegativeInfinity; var prevMean = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      val (m, w) = cents(i)
      val mid = cum + w / 2.0
      if (x < m) {
        if (i == 0) return 0.0
        val f = (x - prevMean) / (m - prevMean)
        return (prevMid + f * (mid - prevMid)) / total
      }
      prevMid = mid; prevMean = m; cum += w; i += 1
    }
    1.0
  }
}
