package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance planning — the operational layer a 100 TB store
  * needs around the query engine: the reference's per-data-resource
  * housekeeping tools (resource cleanup, column renames, compaction of
  * its many small per-load SSTables) generalise here to planning over
  * file listings.
  */
object Maintenance {

  /** Small-file compaction plan: within each table partition, files (in
    * path order) are assigned to merge groups by cumulative-sum binning —
    * file i joins bin `⌊(cumsum_before_i) / targetBytes⌋`. True greedy
    * first-fit is inherently sequential; the cumsum rule is one window
    * per partition, fully distributed, and bounds every bin into
    * `[targetBytes − maxFile, targetBytes + maxFile)` — the property
    * compaction actually needs (no bin far from target) without a
    * sequential pass. Integer arithmetic throughout (`div`), so the plan
    * is bit-identical on any engine. Returns
    * `(partition, path, size_bytes, bin)`.
    *
    * Shape at 100 TB: one hash exchange on the partition key; the window
    * sorts file listings (≪ data), never data. Oversized files land in
    * their own bin and are left alone by the executor reading the plan.
    */
  def compactionPlan(files: DataFrame, partitionCol: String,
      pathCol: String, sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    // explicit ROWS frame (default is RANGE, which lumps tied keys into
    // one cumulative step) ordered by (path, size) — with duplicate
    // path+size rows the per-row bins remain deterministic as a MULTISET,
    // which is what the plan's consumers read
    val w = Window.partitionBy(col("partition"))
      .orderBy(col("path"), col("size_bytes"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.select(col(partitionCol).as("partition"),
        col(pathCol).as("path"),
        col(sizeCol).cast("long").as("size_bytes"))
      .withColumn("_cum", sum("size_bytes").over(w))
      .withColumn("bin",
        expr(s"(_cum - size_bytes) div ${targetBytes}L"))
      .drop("_cum")
  }

  /** Snapshot diff between two corpus versions keyed by `idCol`: each id
    * is classified `added` / `removed` / `changed` / `unchanged` by
    * content hash of `contentCol`. The audit step between ingests —
    * "what did this crawl refresh actually change?" — and the input to
    * incremental reprocessing (only `added` + `changed` ids need work,
    * the same splice discipline as the incremental duplicates tool).
    *
    * Shape at 100 TB: ids + 32-byte hashes shuffle for the full outer
    * join — never the payloads; both sides hash map-only first. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    def hashed(df: DataFrame, tag: String) = df.select(
      col(idCol).as("id"), md5(col(contentCol).cast("string")).as(s"h_$tag"))
    hashed(prev, "prev").join(hashed(cur, "cur"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_prev").isNull, lit("added"))
          .when(col("h_cur").isNull, lit("removed"))
          .when(col("h_prev") =!= col("h_cur"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** MERGE-style CDC apply: `source` carries the target's columns plus a
    * boolean `deleteFlagCol`; matched rows are replaced by the source
    * version (or dropped when the flag is set), unmatched source rows
    * insert, unmatched target rows survive — the standard "apply a
    * change-log to a table" maintenance step (Delta/Iceberg MERGE
    * semantics, expressed as one plan).
    *
    * Shape at 100 TB: ONE full-outer shuffle join on the key (both
    * sides key-partitioned; a small changeset broadcast-joins
    * automatically). Source must be key-unique — enforce upstream with
    * a last-write-wins window if the log can carry several versions. */
  def mergeApply(target: DataFrame, source: DataFrame, keyCol: String,
      deleteFlagCol: String): DataFrame = {
    val dataCols = target.columns.filter(_ != keyCol)
    val t = target.select(col(keyCol).as("_k") +:
      dataCols.map(c => col(c).as(s"_t_$c")): _*)
    val s = source.select(col(keyCol).as("_k") +:
      col(deleteFlagCol).as("_del") +: lit(1).as("_src") +:
      dataCols.map(c => col(c).as(s"_s_$c")): _*)
    t.join(s, Seq("_k"), "full_outer")
      .filter(!(col("_del") <=> lit(true))) // matched-delete drops here
      .select(col("_k").as(keyCol) +: dataCols.map { c =>
        when(col("_src").isNotNull, col(s"_s_$c"))
          .otherwise(col(s"_t_$c")).as(c)
      }: _*)
  }

  /** Incremental aggregate maintenance: merge a signed changeset into a
    * standing (key, cnt, sum) aggregate state WITHOUT rescanning the
    * base — the 100 TB answer to "the nightly agg only changed for 0.1%
    * of keys". `delta` carries `op` = +1 (insert) / −1 (delete of a row
    * that is IN the base) and the row's value; the merged state is
    * bit-identical to a full recompute over (base ∖ deletes ∪ inserts),
    * and keys whose count reaches zero disappear, exactly as a
    * recompute would drop them.
    *
    * Shape: the delta aggregates first (map-side partial over the
    * CHANGESET only), then one key join against the state table. */
  def incrementalAggMerge(state: DataFrame, delta: DataFrame,
      keyCol: String, valueCol: String, opCol: String): DataFrame = {
    val d = delta.groupBy(col(keyCol).as("_k"))
      .agg(sum(col(opCol)).as("_dcnt"),
        sum(col(opCol).cast("double") * col(valueCol).cast("double"))
          .as("_dsum"))
    state.select(col(keyCol).as("_k"), col("cnt").as("_cnt"),
        col("sum").as("_sum"))
      .join(d, Seq("_k"), "full_outer")
      .select(col("_k").as(keyCol),
        (coalesce(col("_cnt"), lit(0L)) + coalesce(col("_dcnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("_sum"), lit(0.0)) + coalesce(col("_dsum"), lit(0.0)))
          .as("sum"))
      .filter(col("cnt") > 0)
  }

  /** Incremental JOIN maintenance — the insert-delta algebra every
    * materialized join view needs:
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * Given the BASE snapshots and their insert deltas, returns exactly
    * the join rows the maintained view must append — the recompute
    * `(A∪ΔA) ⋈ (B∪ΔB)` never runs (that is the point: at 100 TB the
    * base⋈base term is the whole job, and it is the term this identity
    * avoids). Deltas are usually tiny, so both delta-sided joins
    * broadcast; the one base-sided scan per term is join-key-partitioned
    * with pushdown intact. Columns: left columns then right columns,
    * join key once. */
  def incrementalJoinDelta(baseA: DataFrame, deltaA: DataFrame,
      baseB: DataFrame, deltaB: DataFrame, key: String): DataFrame =
    deltaA.join(baseB, Seq(key))
      .unionByName(baseA.join(deltaB, Seq(key)))
      .unionByName(deltaA.join(deltaB, Seq(key)))
}
