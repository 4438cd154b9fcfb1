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

  /** EXECUTE a compaction: plan ([[compactionPlan]]) → rewrite → atomic
    * swap, against a real parquet table directory — the serving-path
    * analogue of the reference's index optimise step (SOLR
    * commit+optimise after heavy writes, `index/SolrIndexDAO.scala`
    * 509-575): many small per-load files become ~targetBytes files
    * without a reader ever seeing a half-compacted table.
    *
    * Layout: a flat parquet dir, or one level of hive-style `k=v`
    * partition subdirectories (each partition compacts independently —
    * exactly the plan's grouping). Mechanics:
    *
    *   1. REWRITE into a sibling staging dir: each multi-file bin is
    *      read and written back as one file; singleton bins hard-copy
    *      byte-identically (no decode cost for already-right-sized
    *      files). The live dir is untouched throughout.
    *   2. ATOMIC SWAP: `tableDir` → `tableDir.compact-old` →  staging
    *      renamed in — two same-filesystem directory renames, each
    *      atomic, then the old dir is deleted. A crash between the
    *      renames leaves BOTH complete copies on disk (the staging and
    *      the `.compact-old` snapshot) — recoverable, never a torn mix
    *      of old and new files.
    *
    * Returns the executed plan: (partition, bin, n_files_in, bytes_in,
    * out_file). Driver-side work is file LISTINGS only; the data moves
    * through one distributed read+write per multi-file bin. */
  def compactTable(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, targetBytes: Long): DataFrame = {
    import java.io.File
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = new File(tableDir)
    require(root.isDirectory, s"$tableDir is not a directory")
    val partDirs: Seq[(String, File)] = {
      val subs = Option(root.listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.isDirectory && f.getName.contains("=")).toSeq
      if (subs.nonEmpty) subs.map(d => d.getName -> d).sortBy(_._1)
      else Seq("" -> root)
    }
    def parquetFiles(d: File): Seq[File] =
      Option(d.listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .sortBy(_.getName).toSeq
    val listing = partDirs.flatMap { case (p, d) =>
      parquetFiles(d).map(f => (p, f.getAbsolutePath, f.length()))
    }
    require(listing.nonEmpty, s"$tableDir holds no parquet files")
    import spark.implicits._
    val plan = compactionPlan(listing.toDF("pt", "path", "bytes"),
        "pt", "path", "bytes", targetBytes)
      .select("partition", "bin", "path", "size_bytes")
      .as[(String, Long, String, Long)].collect()
    val stage = new File(tableDir + ".compact-tmp")
    deleteRecursively(stage)
    val summary = plan.groupBy(r => (r._1, r._2)).toSeq.sortBy(_._1)
      .map { case ((part, bin), rows) =>
        val partStage = if (part.isEmpty) stage else new File(stage, part)
        partStage.mkdirs()
        val out = new File(partStage, f"compacted-$bin%05d.parquet")
        val paths = rows.map(_._3)
        if (paths.size == 1)
          Files.copy(Paths.get(paths.head), out.toPath,
            StandardCopyOption.COPY_ATTRIBUTES)
        else {
          val tmp = new File(stage, s".rewrite-${part.hashCode}-$bin")
          spark.read.parquet(paths: _*).coalesce(1)
            .write.mode("overwrite").parquet(tmp.getAbsolutePath)
          val written = parquetFiles(tmp)
          require(written.size == 1, s"expected one rewritten file in $tmp")
          Files.move(written.head.toPath, out.toPath)
          deleteRecursively(tmp)
        }
        (part, bin, paths.size.toLong, rows.map(_._4).sum, out.getName)
      }
    // table-level markers (_SUCCESS etc.) survive the swap verbatim
    partDirs.foreach { case (part, d) =>
      Option(d.listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.isFile && !f.getName.endsWith(".parquet"))
        .foreach { f =>
          val partStage = if (part.isEmpty) stage else new File(stage, part)
          partStage.mkdirs()
          Files.copy(f.toPath, new File(partStage, f.getName).toPath)
        }
    }
    val old = new File(tableDir + ".compact-old")
    deleteRecursively(old)
    Files.move(root.toPath, old.toPath, StandardCopyOption.ATOMIC_MOVE)
    Files.move(stage.toPath, root.toPath, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
    summary.toSeq
      .toDF("partition", "bin", "n_files_in", "bytes_in", "out_file")
      .orderBy("partition", "bin")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRecursively)
    f.delete(): Unit
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
