package graft.operators

import graft.functions.CountMinAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-cardinality estimation from count-min sketches — the optimizer
  * statistic behind "can this join explode?", computable in one pass per
  * side without materialising either key histogram.
  *
  * `|A ⋈ B|  =  Σ_k cntA(k)·cntB(k)`, and a CMS row's inner product
  * `Σ_w A[r][w]·B[r][w]` always OVER-estimates it (hash collisions only
  * add mass), so the min over depth rows is a one-sided estimate with the
  * usual CMS error bound (Cormode & Muthukrishnan 2005, §4.2). Because
  * [[CountMinAgg]] buckets by md5, the estimate is bit-reproducible on any
  * engine — the whole statistic hash-checks against a SQL restatement.
  *
  * Scale shape: each sketch is one mergeable aggregate (a depth×width long
  * matrix per partition on the wire); the inner product is a tiny
  * matrix-dot. The exact count it is compared against is the join itself —
  * in production you run the sketch INSTEAD of the join; the exact side
  * here is the verify.
  */
object JoinStats {

  /** One-row estimate: (est, exact, rel_err). `rel_err` is the one-sided
    * overestimate fraction, exact rational of two integers. */
  def cmsJoinEstimate(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val agg = udaf(new CountMinAgg(depth, width))
    val sa = a.agg(agg(aKey.cast("string")).as("sa"))
    val sb = b.agg(agg(bKey.cast("string")).as("sb"))
    val inner = udf { (x: Array[Long], y: Array[Long]) =>
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        var s = 0L
        var w = 0
        while (w < width) { s += x(r * width + w) * y(r * width + w); w += 1 }
        if (s < best) best = s
        r += 1
      }
      best
    }
    val exact = a.select(aKey.as("k")).join(b.select(bKey.as("k")), Seq("k"))
      .agg(count(lit(1)).as("exact"))
    sa.crossJoin(sb)
      .select(inner(col("sa"), col("sb")).as("est"))
      .crossJoin(exact)
      .select(col("est"), col("exact"),
        // empty join (exact = 0) → rel_err undefined, not a div-by-zero
        when(col("exact") === 0, lit(null).cast("double"))
          .otherwise(round(
            (col("est") - col("exact")).cast("double") / col("exact"), 6))
          .as("rel_err"))
  }
}
