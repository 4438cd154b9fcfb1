package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column null counts, exact distinct counts,
  * and min/max, in long format — the `ANALYZE TABLE`-style summary a
  * pipeline runs before trusting a new 100 TB drop.
  *
  * ONE scan: every per-column aggregate lands in a single `agg` (Spark
  * computes them all in one pass with partial aggregation), and the 1-row
  * result is unpivoted with `stack` — never one scan per column, never a
  * self-union of aggregate branches (each branch would re-run the scan).
  * Exact `count(DISTINCT x)` per column expands the aggregate to
  * one `Expand` node (the standard multi-distinct plan); swap for
  * `approx_count_distinct` when estimates suffice at scale.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    agged.select(col("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_null, n_distinct, min_str, max_str)"))
      .select("col_name", "n_rows", "n_null", "n_distinct",
        "min_str", "max_str")
  }
}
