package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes for hostile key distributions and time-series alignment —
  * the two places a plain equi-join stops working at 100 TB.
  *
  * Reference behaviours covered: the reference serialises its hot-key
  * workloads (per-year duplicate-detection threads,
  * `tool/DuplicationDetection.scala:434-452` in
  * /root/reference/src/main/scala/au/org/ala/biocache/) because its engine
  * has no shuffle; on Spark the same problem is solved declaratively with
  * salting. The as-of join covers the "most recent sample/processed value
  * at load time" lookups the reference does row-by-row against Cassandra.
  */
object ScaleJoins {

  /** Inner equi-join with the big side's hot keys spread over `saltFactor`
    * sub-partitions and the small side replicated to match. Result is
    * row-identical to `big.join(small, key)` — only the shuffle layout
    * changes.
    *
    * Use when ONE key carries a disproportionate share of the big side
    * (AQE's skew-join split handles skewed PARTITIONS, but a join key that
    * is itself hot still lands every row in one task without salting).
    * The small side must tolerate `saltFactor`× replication — it stays the
    * dimension side.
    *
    * The salt is deterministic (hash of the whole big-side row, mod
    * `saltFactor`), so re-runs partition identically — no RNG, no
    * recomputation hazard under task retry (a `rand()` salt can send the
    * same logical row to different buckets across attempts). */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)),
        lit(saltFactor))
        .cast("int"))
    val smallReplicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallReplicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Backward as-of join: for every left row, attach `valueCol` from the
    * right row with the greatest `timeCol` ≤ the left row's time, within
    * the same `keyCol` group (DuckDB `ASOF JOIN`, kdb `aj`, pandas
    * `merge_asof`). Left rows with no prior right row keep a null.
    *
    * NOT implemented as a join at all: both sides are union-tagged and a
    * single per-key window carries the last non-null right value forward
    * (`last(..., ignoreNulls)` over rows unbounded-preceding..current,
    * right rows ordered before left rows at equal timestamps, so "at or
    * before" is inclusive). One shuffle on the key, zero join blow-up:
    * a range-condition join on (key, time) would otherwise explode into
    * per-key cross products at 100 TB — this is the standard scale-safe
    * as-of shape.
    *
    * Determinism contract: (keyCol, timeCol) should be unique on the right
    * side; if two right rows tie on the exact same timestamp, which one
    * wins is unspecified (same as DuckDB ASOF). */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCol: String,
      asofName: String = "asof_value"): DataFrame = {
    val leftCols = left.columns
    // right rows carry only (key, time, value); left rows carry their full
    // payload plus a null value slot. _tag orders right before left at ties.
    val payloadCols = leftCols.filterNot(c => c == keyCol || c == timeCol)
    val taggedRight = right.select(
      Seq(col(keyCol), col(timeCol), lit(0).as("_tag"),
        col(valueCol).as(asofName)) ++
        payloadCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(keyCol), col(timeCol), lit(1).as("_tag"),
        lit(null).cast(right.schema(valueCol).dataType).as(asofName)) ++
        payloadCols.map(col): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn(asofName, last(col(asofName), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag")
      .select((leftCols.map(col) :+ col(asofName)).toIndexedSeq: _*)
  }

  /** Blocked sorted-neighborhood candidate pairs — the classic entity-
    * resolution alternative to pure key blocking (q108): within each
    * block, rows sort by `sortCol` and every row pairs with its next
    * `windowSize` neighbours in that order. Catches near-matches that
    * share a block but no exact blocking key value, at cost
    * O(block · windowSize) instead of O(block²).
    *
    * Output: (block, id_a, id_b, rank_dist) with id_a the earlier row in
    * sort order; score/verify downstream (e.g. a codegen'd jaro_winkler
    * filter, as q120 does).
    *
    * Shape at 100 TB: the rank window partitions by the block (per-key
    * sort, parallel across blocks — never a global order-by), and the
    * neighbour join EXPLODES each row to its `windowSize` forward ranks
    * and equi-joins on (block, rank) — no range-join nested loop anywhere.
    * A pure (unblocked) sorted neighborhood needs a global rank; use a
    * coarse range-bucket column as the block to approximate it without a
    * single-reducer sort. */
  def sortedNeighborhoodPairs(df: DataFrame, blockCol: String,
      sortCol: String, idCol: String, windowSize: Int): DataFrame = {
    require(windowSize >= 1)
    val w = Window.partitionBy(blockCol).orderBy(col(sortCol), col(idCol))
    // persist: both join sides derive from the ranked table — without it
    // the per-block sort + window run twice (ReuseExchange only dedups the
    // shuffle). Cached blocks live until clearCache()/session end.
    val ranked = df.select(col(blockCol), col(sortCol), col(idCol))
      .withColumn("_rank", row_number().over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val left = ranked.select(col(blockCol),
      col(idCol).as("id_a"), col(sortCol).as(s"${sortCol}_a"),
      col("_rank").as("_rank_a"),
      explode(sequence(col("_rank") + 1,
        col("_rank") + windowSize)).as("_rank_b"))
    val right = ranked.select(col(blockCol), col(idCol).as("id_b"),
      col(sortCol).as(s"${sortCol}_b"), col("_rank").as("_rank_b"))
    left.join(right, Seq(blockCol, "_rank_b"))
      .select(col(blockCol), col("id_a"), col("id_b"),
        col(s"${sortCol}_a"), col(s"${sortCol}_b"),
        (col("_rank_b") - col("_rank_a")).as("rank_dist"))
  }

  /** Haversine distance in metres as pure column algebra (codegen'd; the
    * exact formula the DuckDB oracle restates). */
  def haversineMetres(latA: Column, lonA: Column,
      latB: Column, lonB: Column): Column =
    lit(2.0 * 6371000.0) * asin(sqrt(
      pow(sin(radians(latB - latA) / 2), 2) +
        cos(radians(latA)) * cos(radians(latB)) *
          pow(sin(radians(lonB - lonA) / 2), 2)))

  /** All point pairs within `maxMetres` (great-circle): grid-cell
    * bucketing with one side exploded to its 3×3 cell neighbourhood, then
    * an exact haversine verify — the distance self-join behind "records
    * at the same locality" duplicate predicates (reference
    * `tool/DuplicationDetection.scala` spatial rules work on rounded
    * coordinates; this is the metric form).
    *
    * Recall contract: cell size is `2·maxMetres/111000` degrees, which
    * covers the lat-span of any qualifying pair everywhere and the
    * lon-span up to |lat| ≤ 60° (lon degrees shrink by cos(lat); at 60°
    * the factor-2 margin is exactly spent). Callers above 60° must widen
    * the cell.
    *
    * Shape at 100 TB: candidates come from the (cx, cy) equi-join only —
    * 9× explode on one side, never a cross join; each qualifying pair is
    * produced exactly once (the un-exploded side's cell is unique, so no
    * distinct pass). The threshold compares the ROUNDED distance, making
    * the boundary decision reproducible on any engine. */
  def distanceSelfJoin(points: DataFrame, idCol: String, latCol: String,
      lonCol: String, maxMetres: Double): DataFrame = {
    require(maxMetres > 0, "maxMetres must be positive")
    val s = 2.0 * maxMetres / 111000.0
    val base = points.select(col(idCol).as("id"),
        col(latCol).cast("double").as("lat"),
        col(lonCol).cast("double").as("lon"))
      .withColumn("cx", floor(col("lat") / s).cast("long"))
      .withColumn("cy", floor(col("lon") / s).cast("long"))
    val offsets = for (dx <- -1L to 1L; dy <- -1L to 1L)
      yield struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))
    val aSide = base
      .select(col("id").as("id_a"), col("lat").as("lat_a"),
        col("lon").as("lon_a"), explode(array(offsets: _*)).as("c"))
      .select(col("id_a"), col("lat_a"), col("lon_a"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
    val bSide = base.select(col("id").as("id_b"), col("lat").as("lat_b"),
      col("lon").as("lon_b"), col("cx"), col("cy"))
    aSide.join(bSide, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(haversineMetres(col("lat_a"), col("lon_a"),
          col("lat_b"), col("lon_b")), 1).as("dist_m"))
      .filter(col("dist_m") <= maxMetres)
  }

  /** Interval-overlap self-join: all pairs of rows whose [start, end]
    * intervals (inclusive, integer units — epoch days, sequence numbers)
    * intersect — as an EQUI-join, never a range cross-product: each
    * interval explodes to the `bucketSize`-sized buckets it covers, pairs
    * meet on the bucket key, duplicates from multi-bucket overlaps are
    * removed by crediting a pair only in the FIRST shared bucket
    * (`greatest(bucket_start_a, bucket_start_b) = bucket`), and the exact
    * interval test keeps true overlaps. Pick `bucketSize` ≈ the typical
    * interval length: the explode factor is len/bucketSize + 1 per row,
    * and a bucket's pair volume is bounded by the intervals ACTIVE in
    * that bucket — the same locality argument as [[distanceSelfJoin]]'s
    * grid. Long outlier intervals degrade gracefully (more buckets, same
    * correctness); at 100 TB, split the handful of such rows first. */
  def intervalOverlapJoin(df: DataFrame, idCol: String, startCol: String,
      endCol: String, bucketSize: Long): DataFrame = {
    require(bucketSize >= 1, "bucketSize must be >= 1")
    val base = df.select(col(idCol).as("id"),
        col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"))
      .filter(col("s") <= col("e"))
    val buckets = base.select(col("id"), col("s"), col("e"),
      explode(sequence(floor(col("s") / bucketSize).cast("long"),
        floor(col("e") / bucketSize).cast("long"))).as("bucket"))
    val a = buckets.select(col("bucket"), col("id").as("id_a"),
      col("s").as("s_a"), col("e").as("e_a"))
    val b = buckets.select(col("bucket"), col("id").as("id_b"),
      col("s").as("s_b"), col("e").as("e_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b") &&
        col("s_a") <= col("e_b") && col("s_b") <= col("e_a") &&
        greatest(floor(col("s_a") / bucketSize),
          floor(col("s_b") / bucketSize)).cast("long") === col("bucket"))
      .select(col("id_a"), col("id_b"),
        (least(col("e_a"), col("e_b")) -
          greatest(col("s_a"), col("s_b")) + 1).as("overlap_units"))
  }
}
