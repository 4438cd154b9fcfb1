package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model (JASA 1969),
  * the statistical backbone of real-world entity resolution (master data
  * dedup, census linkage). Complements the distance-based ER pipeline
  * (q108: blocking → Jaro-Winkler → connected components) with the
  * likelihood-ratio decision theory: each comparison field carries an
  * agreement weight log2(m/u) and a disagreement weight
  * log2((1−m)/(1−u)), where m = P(agree | same entity) and
  * u = P(agree | different entities); a pair's total weight classifies it
  * as match / possible / nonmatch against two thresholds.
  *
  * Shape at 100 TB: candidate pairs come from an equi-join on the blocking
  * key (never a cross join); the per-field agreement tests and the weight
  * sum are pure column algebra inside the join's whole-stage codegen, so
  * the cost is the blocked pair count — the blocking key bounds the
  * quadratic term exactly as in q108 and J8.
  */
object RecordLinkage {

  /** One comparison field: column name plus the Fellegi–Sunter m / u
    * probabilities (0 < u < m < 1 for a discriminating field). */
  final case class FieldParams(name: String, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1, s"m,u in (0,1): $name")
    val agreeWeight: Double = math.log(m / u) / math.log(2.0)
    val disagreeWeight: Double =
      math.log((1.0 - m) / (1.0 - u)) / math.log(2.0)
  }

  /** Self-linkage of `df` within `blockCol` blocks. Agreement on a field
    * is exact equality of the trimmed lowercase string form; a null on
    * either side disagrees (conservative — the standard simple treatment).
    * Returns one row per candidate pair (idA < idB) with the total weight
    * and the decision at (`tUpper`, `tLower`]. */
  def fellegiSunter(df: DataFrame, idCol: String, blockCol: String,
      fields: Seq[FieldParams], tUpper: Double, tLower: Double): DataFrame = {
    require(fields.nonEmpty && tUpper >= tLower, "fields + ordered thresholds")
    def side(tag: String) = df.select(
      col(idCol).as(s"id_$tag") +: col(blockCol).as(s"blk_$tag") +:
        fields.map(f => lower(trim(col(f.name).cast("string")))
          .as(s"${f.name}_$tag")): _*)
    val pairs = side("a").join(side("b"),
      col("blk_a") === col("blk_b") && col("id_a") < col("id_b"))
    val weight = fields.map { f =>
      val a = col(s"${f.name}_a"); val b = col(s"${f.name}_b")
      when(a.isNotNull && b.isNotNull && a === b, lit(f.agreeWeight))
        .otherwise(lit(f.disagreeWeight))
    }.reduce(_ + _)
    pairs.select(col("id_a"), col("id_b"), col("blk_a").as("block"),
        round(weight, 4).as("weight"))
      .withColumn("decision",
        when(col("weight") > tUpper, lit("match"))
          .when(col("weight") > tLower, lit("possible"))
          .otherwise(lit("nonmatch")))
  }

  /** All distinct ≤`tau`-deletion variants of `s`, as 64-bit hashes
    * (hash collisions only ADD candidates — the exact verify removes
    * them). Variant count is bounded by Σ_{k≤tau} C(|s|, k) — 172 for an
    * 18-char string at tau = 2. */
  private[operators] def deletionVariantHashes(s: String,
      tau: Int): Array[Long] = {
    val seen = new java.util.HashSet[String]()
    var frontier = List(s)
    seen.add(s)
    for (_ <- 1 to tau) {
      frontier = frontier.flatMap { v =>
        (0 until v.length).iterator.map { i =>
          v.substring(0, i) + v.substring(i + 1)
        }.filter(seen.add).toList
      }
    }
    val it = seen.iterator()
    val out = new Array[Long](seen.size())
    var i = 0
    while (it.hasNext) { out(i) = graft.functions.HashKernels.hash64(it.next()); i += 1 }
    out
  }

  /** Exact edit-distance self-join for small `tau` via SymSpell-style
    * deletion neighborhoods — the LOSSLESS replacement for quadratic
    * within-block scanning when the block key can't be refined:
    * ed(a, b) ≤ τ implies a and b share a common string reachable by ≤ τ
    * deletions from each (delete each side's chars aligned to edits), so
    * candidates are an EQUI-JOIN on (block, variant-hash) over ~C(L, τ)
    * keys per row instead of Σ block² comparisons; every candidate is
    * then verified with the exact banded DP. Output per qualifying pair
    * (idA < idB): (block cols…, id_a, id_b) — row-for-row identical to
    * the naive within-block scan (proved in spec), at O(n · C(L, τ))
    * candidate keys. The 10× rehearsal measured the naive form at 82 s
    * (quadratic in block population); this shape stays linear in rows ×
    * neighborhood size.
    *
    * Reference behaviour anchor: occurrence duplicate detection compares
    * within taxon blocks (`dedup/DuplicationDetection.scala`) — this is
    * the same candidate-bounding move applied to string keys. */
  def editDistanceSelfJoin(df: DataFrame, idCol: String, strCol: String,
      tau: Int, blockCols: Seq[String]): DataFrame = {
    require(tau >= 1 && tau <= 3, s"tau=$tau in [1,3] (C(L,τ) keys per row)")
    val variants = udf((s: String) =>
      if (s == null) Array.empty[Long] else deletionVariantHashes(s, tau))
    val within = udf((a: String, b: String) =>
      graft.functions.HashKernels.levenshteinWithin(a, b, tau))
    repCollapsedPairs(df, idCol, strCol, blockCols, variants,
      (a, b) => within(a, b))
  }

  /** The shared candidate skeleton: rep-collapse (the boundedSelfPairs
    * move — the variant join runs over DISTINCT (block, string), so
    * duplicate-heavy corpora don't square every bucket), candidates from
    * the (block, variant-hash) equi-join, exact `verify` on rep pairs
    * only, then expansion back to id pairs through two string equi-joins;
    * same-string pairs (verify(s,s) must hold for any reflexive
    * predicate) come from the exact self-join. */
  private def repCollapsedPairs(df: DataFrame, idCol: String,
      strCol: String, blockCols: Seq[String],
      variants: org.apache.spark.sql.expressions.UserDefinedFunction,
      verify: (Column, Column) => Column): DataFrame = {
    val blk = blockCols.map(col)
    val rows = df
      .select(blk :+ col(idCol).as("_id") :+ col(strCol).as("_s"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reps = rows.select(blk :+ col("_s"): _*).distinct()
      .withColumn("_v", explode(variants(col("_s"))))
    val repPairs = reps
      .select(blk :+ col("_v") :+ col("_s").as("_sa"): _*)
      .join(reps.select(blk :+ col("_v") :+ col("_s").as("_sb"): _*),
        blockCols :+ "_v")
      .filter(col("_sa") < col("_sb"))
      .select(blk ++ Seq(col("_sa"), col("_sb")): _*)
      .distinct() // the same rep pair can meet in many variant buckets
      .filter(verify(col("_sa"), col("_sb")))
    val cross = repPairs
      .join(rows.select(blk :+ col("_s").as("_sa") :+
        col("_id").as("_ia"): _*), blockCols :+ "_sa")
      .join(rows.select(blk :+ col("_s").as("_sb") :+
        col("_id").as("_ib"): _*), blockCols :+ "_sb")
      .select(blk ++ Seq(least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b")): _*)
    val sameString = rows
      .join(rows.withColumnRenamed("_id", "_ib"), blockCols :+ "_s")
      .filter(col("_id") < col("_ib") && verify(col("_s"), col("_s")))
      .select(blk ++ Seq(col("_id").as("id_a"), col("_ib").as("id_b")): _*)
    cross.unionByName(sameString)
  }

  /** Exact high-threshold Jaro–Winkler self-join with LOSSLESS
    * candidate generation for uniform-length corpora — the scale path
    * for the q106/q108 family, whose within-block scan is otherwise
    * quadratic in block population.
    *
    * Derivation (each step an upper bound, so candidates can only be a
    * superset): with the standard p = 0.1, ℓ ≤ 4 boost,
    * JW ≥ t ⟹ Jaro J ≥ (t − 0.4)/0.6; for two strings of equal length
    * L, J ≤ (2m/L + 1)/3, so m ≥ ⌈(3J₀ − 1)·L/2⌉ matched characters;
    * Jaro matches are injective over occurrences, so the character
    * MULTISETS share ≥ m occurrences; each side therefore differs from
    * the shared multiset by δ = L − m deletions — i.e. the pairs'
    * SORTED character strings share a common ≤δ-deletion variant.
    * Candidates are the (block, sorted-variant-hash) equi-join; every
    * candidate is verified with the exact Jaro–Winkler at the query's
    * round(·, 6) convention, so the output is row-for-row the
    * within-block scan's (spec-pinned). At t = 0.96, L = 18: δ = 1 (19
    * keys/row); at t = 0.98: δ = 0 (sorted-string equality).
    *
    * Falls back to the plain scan when the largest block is small
    * (≤ maxNaiveBlock — small blocks beat candidate overhead), when
    * lengths are not uniform (the m bound needs one L), or when the
    * threshold is too low for a usable δ (> maxDelta). */
  def jaroWinklerPairs(df: DataFrame, idCol: String, strCol: String,
      threshold: Double, blockCols: Seq[String],
      maxNaiveBlock: Long = 2000L, maxDelta: Int = 2): DataFrame = {
    require(threshold > 0.7 && threshold <= 1.0, "high-threshold operator")
    graft.plans.GraftFunctions.register(df.sparkSession)
    val verify = (a: Column, b: Column) =>
      round(graft.plans.GraftFunctions.jaro_winkler(a, b), 6) >= threshold
    val blk = blockCols.map(col)
    val stats = df.agg(min(length(col(strCol))).as("mn"),
      max(length(col(strCol))).as("mx")).head()
    val uniform = !stats.isNullAt(0) && stats.getInt(0) == stats.getInt(1)
    val maxBlock = df.groupBy(blk: _*)
      .agg(count(lit(1)).as("_c")).agg(max("_c")).head().getLong(0)
    // 1e-6 margin: the verify compares round(jw, 6) ≥ t, which admits
    // true JW down to t − 5e-7 — the bound must cover those pairs too
    val j0 = (threshold - 1e-6 - 0.4) / 0.6
    val delta = if (!uniform) Int.MaxValue else {
      val L = stats.getInt(0)
      L - math.ceil((3.0 * j0 - 1.0) * L / 2.0).toInt
    }
    if (maxBlock <= maxNaiveBlock || delta > maxDelta || delta < 0) {
      val a = df.select(blk :+ col(idCol).as("id_a") :+
        col(strCol).as("_sa"): _*)
      val b = df.select(blk :+ col(idCol).as("id_b") :+
        col(strCol).as("_sb"): _*)
      a.join(b, blockCols)
        .filter(col("id_a") < col("id_b") && verify(col("_sa"), col("_sb")))
        .select(blk ++ Seq(col("id_a"), col("id_b")): _*)
    } else {
      val d = delta
      val variants = udf((s: String) =>
        if (s == null) Array.empty[Long]
        else {
          val sorted = new String(s.toCharArray.sorted)
          if (d == 0)
            Array(graft.functions.HashKernels.hash64(sorted))
          else deletionVariantHashes(sorted, d)
        })
      repCollapsedPairs(df, idCol, strCol, blockCols, variants, verify)
    }
  }

  /** Cost-chosen exact blocked edit-distance pairs — the NameMatcher-
    * style physical contract: while the LARGEST block population is ≤
    * `maxNaiveBlock`, the plain within-block pair scan wins (Σ block²
    * bounded by blocks · maxNaiveBlock²; variant buckets can be LESS
    * selective than small blocks — measured 15.7 s vs 3.4 s on sf0.1's
    * 600-row blocks); beyond it, [[editDistanceSelfJoin]]'s deletion
    * neighborhoods take over (measured 15.7 s vs 92 s quadratic on the
    * 10× rehearsal's 6000-row blocks). Both paths are exact and
    * identical row-for-row, so the result is scale-stable. */
  def blockedEditDistancePairs(df: DataFrame, idCol: String,
      strCol: String, tau: Int, blockCols: Seq[String],
      maxNaiveBlock: Long = 2000L): DataFrame = {
    val maxBlock = df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("_c")).agg(max("_c")).head().getLong(0)
    if (maxBlock <= maxNaiveBlock) {
      val within = udf((a: String, b: String) =>
        graft.functions.HashKernels.levenshteinWithin(a, b, tau))
      val blk = blockCols.map(col)
      val a = df.select(blk :+ col(idCol).as("id_a") :+
        col(strCol).as("_sa"): _*)
      val b = df.select(blk :+ col(idCol).as("id_b") :+
        col(strCol).as("_sb"): _*)
      a.join(b, blockCols)
        .filter(col("id_a") < col("id_b") && within(col("_sa"), col("_sb")))
        .select(blk ++ Seq(col("id_a"), col("id_b")): _*)
    } else editDistanceSelfJoin(df, idCol, strCol, tau, blockCols)
  }
}
