package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Per-group ridge regression as a mergeable typed `Aggregator` over the
  * NORMAL EQUATIONS — the distributed multi-feature big brother of
  * `Profiling.groupOls`'s closed-form simple regression. The buffer is
  * the sufficient-statistics triple (XᵀX upper triangle, Xᵀy, n, Σy,
  * Σy²) for k features plus intercept: O(k²) doubles per group per
  * partition on the wire regardless of row count, so partial
  * aggregation does all the heavy lifting and a group with 10⁹ rows
  * costs the same shuffle bytes as one with 10. The finish phase solves
  * `(XᵀX + λI)β = Xᵀy` by Gaussian elimination with partial pivoting —
  * a k+1 ≤ 16 system, microseconds — and reports (β, intercept, r²).
  *
  * λ = 0 is plain OLS (the spec recovers a planted model exactly);
  * λ > 0 shrinks — the intercept is conventionally NOT penalized.
  * Near-singular systems (collinear features) rely on the ridge term;
  * with λ = 0 and a singular XᵀX the solve returns null coefficients
  * rather than garbage (pivot threshold 1e-12).
  *
  * Input rows: (features array of length k, y). Output:
  * (coeffs array length k, intercept, r2, n) — null coeffs on singular.
  */
class RidgeAgg(val k: Int, val lambda: Double = 0.0)
    extends Aggregator[(Seq[Double], Double), RidgeAgg.Buf, RidgeAgg.Fit] {
  require(k >= 1 && k <= 15, s"k=$k outside [1,15]")
  require(lambda >= 0.0)
  private val d = k + 1 // + intercept column (always 1.0)

  override def zero: RidgeAgg.Buf =
    RidgeAgg.Buf(Vector.fill(d * (d + 1) / 2)(0.0), Vector.fill(d)(0.0),
      0L, 0.0, 0.0)

  override def reduce(b: RidgeAgg.Buf, row: (Seq[Double], Double)): RidgeAgg.Buf = {
    val (xs, y) = row
    require(xs.length == k, s"feature arity ${xs.length} != $k")
    val x = new Array[Double](d)
    var i = 0
    while (i < k) { x(i) = xs(i); i += 1 }
    x(k) = 1.0
    val xtx = b.xtx.toArray
    val xty = b.xty.toArray
    var p = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) { xtx(p) += x(i) * x(j); p += 1; j += 1 }
      xty(i) += x(i) * y
      i += 1
    }
    RidgeAgg.Buf(xtx.toVector, xty.toVector, b.n + 1, b.sy + y,
      b.syy + y * y)
  }

  override def merge(a: RidgeAgg.Buf, b: RidgeAgg.Buf): RidgeAgg.Buf =
    RidgeAgg.Buf(
      a.xtx.zip(b.xtx).map { case (u, v) => u + v },
      a.xty.zip(b.xty).map { case (u, v) => u + v },
      a.n + b.n, a.sy + b.sy, a.syy + b.syy)

  override def finish(b: RidgeAgg.Buf): RidgeAgg.Fit = {
    if (b.n == 0) return RidgeAgg.Fit(null, None, None, 0L)
    // unpack the packed upper triangle into a full matrix + ridge term
    val m = Array.ofDim[Double](d, d + 1)
    var p = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) { m(i)(j) = b.xtx(p); m(j)(i) = b.xtx(p); p += 1; j += 1 }
      m(i)(d) = b.xty(i)
      i += 1
    }
    i = 0
    while (i < k) { m(i)(i) += lambda; i += 1 } // intercept unpenalized
    // Gaussian elimination with partial pivoting on the augmented system
    i = 0
    var singular = false
    while (i < d && !singular) {
      var piv = i
      var j = i + 1
      while (j < d) { if (math.abs(m(j)(i)) > math.abs(m(piv)(i))) piv = j; j += 1 }
      if (math.abs(m(piv)(i)) < 1e-12) singular = true
      else {
        val t = m(i); m(i) = m(piv); m(piv) = t
        j = i + 1
        while (j < d) {
          val f = m(j)(i) / m(i)(i)
          var c = i
          while (c <= d) { m(j)(c) -= f * m(i)(c); c += 1 }
          j += 1
        }
      }
      i += 1
    }
    if (singular) RidgeAgg.Fit(null, None, None, b.n)
    else {
      val beta = new Array[Double](d)
      i = d - 1
      while (i >= 0) {
        var s = m(i)(d)
        var j = i + 1
        while (j < d) { s -= m(i)(j) * beta(j); j += 1 }
        beta(i) = s / m(i)(i)
        i -= 1
      }
      // r² from sufficient statistics: SSE = yᵀy − 2βᵀXᵀy + βᵀXᵀXβ
      val xty = b.xty.toArray
      var bXty = 0.0
      i = 0
      while (i < d) { bXty += beta(i) * xty(i); i += 1 }
      var bXtXb = 0.0
      p = 0
      i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          val v = b.xtx(p) * beta(i) * beta(j)
          bXtXb += (if (i == j) v else 2 * v)
          p += 1; j += 1
        }
        i += 1
      }
      val sse = b.syy - 2 * bXty + bXtXb
      val sst = b.syy - b.sy * b.sy / b.n
      val r2 = if (sst > 0) Some(1.0 - sse / sst) else None
      RidgeAgg.Fit(beta.take(k).toSeq, Some(beta(k)), r2, b.n)
    }
  }

  override def bufferEncoder: Encoder[RidgeAgg.Buf] =
    ExpressionEncoder[RidgeAgg.Buf]()
  override def outputEncoder: Encoder[RidgeAgg.Fit] =
    ExpressionEncoder[RidgeAgg.Fit]()
}

object RidgeAgg {
  /** Sufficient statistics: packed upper-triangular XᵀX, Xᵀy, n, Σy, Σy². */
  case class Buf(xtx: Seq[Double], xty: Seq[Double], n: Long,
    sy: Double, syy: Double)
  /** Fit: feature coefficients (null if singular), intercept, r², n. */
  case class Fit(coeffs: Seq[Double], intercept: Option[Double],
    r2: Option[Double], n: Long)
}
