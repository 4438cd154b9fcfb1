package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) over two criteria — minimize `minCol`,
  * maximize `maxCol`: the rows no other row beats-or-ties on both axes
  * while strictly beating on one. The multi-objective "best offers"
  * query (cheapest-for-its-quality supplier, shortest-for-its-score
  * document, …) that a naive formulation writes as an O(n²) NOT EXISTS
  * anti-join.
  *
  * Distributed sort-sweep, no self-join:
  *   1. dedupe to distinct (x, y) points (dominance only sees values);
  *   2. range-bucket x into `buckets` slices (one tiny min/max scan);
  *   3. per-bucket max-y rolls into a strict-prefix max over the
  *      bucket table (buckets ≤ 256 rows — driver-sized by design);
  *   4. inside each bucket one window ordered (x asc, y desc) keeps a
  *      running max-y over PRECEDING rows; a point is dominated iff
  *      `max(prefix-bucket max, running max) ≥ its y`.
  * Every earlier-bucket point has strictly smaller x (bucket is a
  * function of x), and within a bucket the (x asc, y desc) order makes
  * "preceding with y ≥ mine" exactly the dominance test, so the sweep
  * is exact — including duplicate-x ties. Cost: one distinct shuffle +
  * one bucket-keyed window; the only unpartitioned window runs over the
  * ≤`buckets`-row bucket table.
  */
object Skyline {

  /** Skyline of distinct (minCol, maxCol) points, with `n_rows` = how
    * many input rows sit at each frontier point. Null coordinates are
    * excluded (null never dominates and is never ranked). */
  def skyline2D(df: DataFrame, minCol: String, maxCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1 && buckets <= 256,
      s"skyline2D: buckets=$buckets outside [1,256] (bucket table must stay driver-sized)")
    val x = col(minCol).cast("double")
    val y = col(maxCol).cast("double")
    val pts = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(x.as("x"), y.as("y")).agg(count(lit(1)).as("n_rows"))

    val Array(lo, hi) = pts.agg(min("x"), max("x")).collect()(0) match {
      case r if r.isNullAt(0) => Array(0.0, 1.0) // empty input
      case r => Array(r.getDouble(0), r.getDouble(1))
    }
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    val bucketed = pts.withColumn("_b",
      least(floor((col("x") - lit(lo)) / lit(span) * buckets),
        lit(buckets - 1L)).cast("long"))

    // strict-prefix max-y per bucket: ≤`buckets` rows, broadcast back
    val wPrefix = Window.orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = bucketed.groupBy("_b").agg(max("y").as("_bmax"))
      .withColumn("_pmax", max("_bmax").over(wPrefix))
      .select("_b", "_pmax")

    val wSweep = Window.partitionBy("_b")
      .orderBy(col("x").asc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(prefix), Seq("_b"))
      .withColumn("_rmax", max("y").over(wSweep))
      // dominated iff some strictly-cheaper-or-tied predecessor reaches y;
      // −∞ stands in for "no predecessor at all"
      .withColumn("_dmax", greatest(
        coalesce(col("_pmax"), lit(Double.NegativeInfinity)),
        coalesce(col("_rmax"), lit(Double.NegativeInfinity))))
      .filter(col("_dmax") < col("y"))
      .select(col("x").as(minCol), col("y").as(maxCol), col("n_rows"))
  }
}
