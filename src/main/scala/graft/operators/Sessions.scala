package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: consecutive events of the
  * same key belong to one session while the gap between them stays within
  * `maxGap`; a larger gap opens a new session.
  *
  * Shape: one shuffle on the key (the two windows share the same
  * partitioning, so Spark plans a single Exchange + sort). Session ids are
  * deterministic: (key, index of the session's first event). At 100 TB the
  * per-key sort is parallel across keys; no global ordering is ever
  * required. The streaming analogue is a `flatMapGroupsWithState` with an
  * event-time timeout — this is the batch/backfill form.
  *
  * Why not the built-in `session_window`? Two contract differences: (1) it
  * identifies sessions by their time bounds, not a stable per-key 1,2,3…
  * sequence (which downstream session-id joins need and `assignSessions`
  * provides per row); (2) its merge rule is end-EXCLUSIVE (an event at
  * exactly start+gap opens a new session) where this operator keeps
  * `gap <= maxGap` together — the convention the q64 oracle pins down.
  * Same single-exchange plan either way, so nothing is lost.
  */
object Sessions {

  /** Adds `session_seq` (1-based per-key session index) to every row. */
  def assignSessions(events: DataFrame, keyCol: String, tsCol: String,
      maxGapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(tsCol)
    val gap = unix_micros(col(tsCol)) -
      unix_micros(lag(col(tsCol), 1).over(byKey))
    val isNew = when(gap.isNull || gap > maxGapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("_new", isNew)
      .withColumn("session_seq",
        sum(col("_new")).over(byKey.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("_new")
  }

  /** One row per session: key, session_seq, start/end, event count and the
    * sum of `valueCol`. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, maxGapSeconds: Long): DataFrame =
    assignSessions(events, keyCol, tsCol, maxGapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(tsCol).as("session_start"),
        max(tsCol).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(valueCol), 2).as("total_value"))

  /** Streaming sessionization over an event stream: Spark's native
    * `session_window` + watermark (state closes once the watermark passes a
    * session's end + gap, so state is bounded by OPEN sessions, not
    * history). Note the built-in's end-exclusive merge rule — an event at
    * exactly start+gap opens a new session — differs from the batch
    * operator's inclusive `<= maxGap`; use the same form on both sides when
    * comparing (StreamingSpec does). */
  def sessionizeStream(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("sw"), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(valueCol), 2).as("total_value"))
      .select(col(keyCol), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"), col("total_value"))
}
