package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer
import scala.math.{pow, sqrt}

/** Reverse-jackknife environmental-outlier statistics.
  *
  * Faithful re-implementation of the reference algorithm
  * (`outliers/JackKnife.scala:14-99` in
  * /root/reference/src/main/scala/au/org/ala/biocache/): sort samples,
  * compute gap statistic y·(dist from mean)/stddev per point, flag points
  * whose statistic exceeds the threshold `(0.95·√n + 0.2)·range/50`, extend
  * flags to the tails, fail safe when more than half the samples flag.
  *
  * Exposed as a typed Spark `Aggregator` so `groupBy(taxon, layer)` computes
  * all per-group stats in one shuffle with partial aggregation (the buffer
  * carries raw samples; groups are small — at most tens of thousands of
  * points per taxon — so the collect-style buffer is bounded).
  */
case class JackKnifeStats(
    sampleSize: Int, min: Float, max: Float, mean: Float, stdDev: Float,
    range: Float, threshold: Float, outlierValues: Array[Float],
    triggerFailsafe: Boolean)

object JackKnife {
  val MinSampleThreshold = 20

  def mean(values: Seq[Float]): Float =
    values.foldLeft(0.0)(_ + _).toFloat / values.size.toFloat

  def stddev(values: Seq[Float]): Float = {
    val m = mean(values)
    sqrt(values.foldLeft(0.0)((t, v) => t + pow(v - m, 2.0)) / values.size.toFloat).toFloat
  }

  /** Core algorithm; see reference `outliers/JackKnife.scala:14`. */
  def jackknife(sampledUnsorted: Seq[Float],
      minSampleThreshold: Int = MinSampleThreshold): Option[JackKnifeStats] = {
    if (sampledUnsorted.isEmpty || sampledUnsorted.size < minSampleThreshold)
      return None

    val samples = sampledUnsorted.sorted
    val n = samples.size
    val outliers = Array.fill(n)(false)
    val cArray = Array.fill(n)(0.0f)

    val mn = samples.min
    val mx = samples.max
    val smean = mean(samples)
    val sstd = stddev(samples)
    val srange = mx - mn
    val threshold = ((0.95 * sqrt(n) + 0.2) * (srange / 50)).toFloat
    if (threshold <= 0) return None

    for (i <- 0 until n) {
      val y: Double = samples(i).compare(smean) match {
        case -1 => (samples(i + 1) - samples(i)) * (smean - samples(i))
        case 1  => (samples(i) - samples(i - 1)) * (samples(i) - smean)
        case 0  => 0.0
      }
      val c = y / sstd
      if (c > threshold) {
        outliers(i) = true
        if (samples(i) < smean && i > 0) {
          var q = i
          while (q >= 0) { outliers(q) = true; q -= 1 }
        }
        if (samples(i) > smean && i < n - 1) {
          var q = i
          while (q < n) { outliers(q) = true; q += 1 }
        }
      }
      cArray(i) = c.toFloat
    }

    for (i <- 0 until n)
      if (samples(i) > smean && i > 0 && outliers(i - 1))
        cArray(i) = cArray(i) + cArray(i - 1)

    var i = n - 1
    while (i >= 0) {
      if (samples(i) < smean && outliers(i) && i < n - 1)
        cArray(i) = cArray(i) + cArray(i + 1)
      i -= 1
    }

    val outlierValues = new ArrayBuffer[Float]
    for (j <- outliers.indices) if (outliers(j)) outlierValues += samples(j)
    val triggerFailsafe = outlierValues.size > samples.length / 2
    if (triggerFailsafe) outlierValues.clear()

    Some(JackKnifeStats(n, mn, mx, smean, sstd, srange, threshold,
      outlierValues.toArray, triggerFailsafe))
  }
}

/** Typed aggregator: one shuffle per grouped jackknife run. */
class JackKnifeAggregator(minSamples: Int = JackKnife.MinSampleThreshold)
    extends Aggregator[Float, ArrayBuffer[Float], Option[JackKnifeStats]] {
  override def zero: ArrayBuffer[Float] = ArrayBuffer.empty
  override def reduce(b: ArrayBuffer[Float], a: Float): ArrayBuffer[Float] = { b += a; b }
  override def merge(b1: ArrayBuffer[Float], b2: ArrayBuffer[Float]): ArrayBuffer[Float] = b1 ++= b2
  override def finish(r: ArrayBuffer[Float]): Option[JackKnifeStats] =
    JackKnife.jackknife(r.toSeq, minSamples)
  override def bufferEncoder: Encoder[ArrayBuffer[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Option[JackKnifeStats]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
