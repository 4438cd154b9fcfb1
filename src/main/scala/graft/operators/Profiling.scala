package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Deterministic Poisson bootstrap — confidence intervals for corpus
    * metrics without sampling n-of-n with replacement (impossible to
    * coordinate across a cluster): each (row, replicate) draws a
    * Poisson(1) weight from the inverse CDF of a content-addressed uniform
    * (md5(id:salt:b)), and replicate b's statistic is the weighted mean.
    * Weights are i.i.d. Poisson(1), which is the standard streaming/
    * distributed approximation of the multinomial bootstrap.
    *
    * Deterministic end to end (no RNG state, engine-portable — the DuckDB
    * oracle re-draws identical weights), and one pass: the replicate
    * explode multiplies rows by B but every downstream aggregate is
    * map-side partial, so the shuffle carries B rows per partition.
    * Output: (replicate, wmean, n_drawn) per replicate, wmean rounded to
    * 4 dp for cross-engine float stability. */
  def poissonBootstrap(df: DataFrame, idCol: String, valueCol: String,
      replicates: Int, salt: String): DataFrame = {
    require(replicates >= 1)
    // P(X<=k) for Poisson(1): cumulative thresholds on the uniform draw
    val cdf = Seq(0.36787944117144233, 0.7357588823428846,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563)
    val u = (conv(substring(md5(concat_ws(":", col(idCol).cast("string"),
      lit(salt), col("b").cast("string"))), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val weight = cdf.zipWithIndex.foldRight(lit(5): Column) {
      case ((thr, k), acc) => when(u < thr, k).otherwise(acc)
    }
    df.select(col(idCol), col(valueCol).cast("double").as("_x"))
      .crossJoin(spark_range_df(df, replicates))
      .select(col("b"), col("_x"), weight.cast("long").as("_w"))
      .groupBy(col("b").as("replicate"))
      .agg(round(sum(col("_w") * col("_x")) / sum(col("_w")), 4).as("wmean"),
        sum("_w").as("n_drawn"))
  }

  /** 0..n-1 as a one-column broadcastable frame (`b`). */
  private def spark_range_df(df: DataFrame, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    broadcast((0 until n).toDF("b"))
  }

  /** Deterministic permutation test for a difference in group means (the
    * "did pipeline B actually change quality?" check): the observed
    * |mean_A − mean_B| is compared against `permutations` random
    * relabelings, each drawn Bernoulli(n_A/(n_A+n_B)) from a
    * content-addressed uniform md5(id:salt:b) — the standard random-
    * relabeling approximation of the exact size-preserving permutation
    * test (documented; exact sizes would need a global sort per
    * replicate). p = (1 + #{b : |diff_b| ≥ |observed|}) / (B + 1), the
    * add-one form that keeps p > 0.
    *
    * One pass over rows × B relabelings, all aggregates map-side partial;
    * deterministic end to end — the DuckDB oracle re-draws identical
    * relabelings. Output: one row (observed_diff, p_value, n_perms). */
  def permutationTest(df: DataFrame, idCol: String, valueCol: String,
      groupCol: String, groupA: String, groupB: String,
      permutations: Int, salt: String): DataFrame = {
    require(permutations >= 1)
    val rows = df
      .filter(col(groupCol) === groupA || col(groupCol) === groupB)
      .select(col(idCol), (col(groupCol) === groupA).as("_isA"),
        col(valueCol).cast("double").as("_x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val Array(nA, nB) = rows.agg(
      sum(when(col("_isA"), 1L).otherwise(0L)),
      sum(when(!col("_isA"), 1L).otherwise(0L)))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    require(nA > 0 && nB > 0, "both groups must be present")
    val observed = rows.agg(
      (sum(when(col("_isA"), col("_x"))) / nA -
        sum(when(!col("_isA"), col("_x"))) / nB).as("d"))
      .head().getDouble(0).abs
    val pA = nA.toDouble / (nA + nB)
    val u = (conv(substring(md5(concat_ws(":", col(idCol).cast("string"),
      lit(salt), col("b").cast("string"))), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val spark = df.sparkSession
    import spark.implicits._
    val perms = rows
      .crossJoin(broadcast((0 until permutations).toDF("b")))
      .select(col("b"), col("_x"), (u < pA).as("_toA"))
      .groupBy("b")
      .agg(abs(sum(when(col("_toA"), col("_x"))) /
          sum(when(col("_toA"), 1L).otherwise(0L)) -
        sum(when(!col("_toA"), col("_x"))) /
          sum(when(!col("_toA"), 1L).otherwise(0L))).as("absdiff"))
    perms.agg(
        (round(lit(observed), 4) + lit(0.0)).as("observed_diff"),
        round((lit(1L) + sum(when(col("absdiff") >= lit(observed), 1L)
          .otherwise(0L))).cast("double") / lit(permutations + 1.0), 4)
          .as("p_value"),
        lit(permutations.toLong).as("n_perms"))
  }

  /** Join/groupBy key-skew report: the distribution of per-key row counts
    * (exact p50/p90/p99/max quantiles) plus the `topK` hottest keys — the
    * numbers that decide whether a key needs salting ([[ScaleJoins]]) or
    * AQE skew handling before a 100 TB shuffle. Two aggregates: per-key
    * counts (one shuffle), then a |keys|-row stats pass. Output is one
    * row per hot key with the quantile columns repeated (long format,
    * engine-comparable). */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("key_rows"))
    val stats = counts.agg(
      floor(expr("percentile(key_rows, 0.5)")).cast("long").as("p50"),
      floor(expr("percentile(key_rows, 0.9)")).cast("long").as("p90"),
      floor(expr("percentile(key_rows, 0.99)")).cast("long").as("p99"),
      max("key_rows").as("max_rows"),
      count(lit(1)).as("n_keys"))
    counts.orderBy(col("key_rows").desc, col("key")).limit(topK)
      .crossJoin(broadcast(stats))
  }

  /** Functional-dependency check A → B: for each value of `detCol`, the
    * dependent should be single-valued; the violation count is
    * Σ_groups (rows − rows of the modal B), i.e. the minimum number of
    * rows to fix for the FD to hold exactly. Returns one row:
    * (n_groups, n_violating_groups, violation_rows, fd_holds). The
    * schema-discovery / data-quality screen (does occurrenceID determine
    * catalogNumber? does order determine customer?).
    *
    * Shape at 100 TB: one (A, B) count aggregate (partial map-side),
    * one per-A max — both bounded by distinct-pair cardinality, never
    * raw rows. Modal ties don't matter: only the max count enters. */
  def fdCheck(df: DataFrame, detCol: String, depCol: String): DataFrame = {
    val pairs = df.groupBy(col(detCol).as("a"), col(depCol).as("b"))
      .agg(count(lit(1)).as("n"))
    pairs.groupBy("a")
      .agg(sum("n").as("rows"), max("n").as("modal"),
        count(lit(1)).as("n_b"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_b") > 1, 1L).otherwise(0L))
          .as("n_violating_groups"),
        sum(col("rows") - col("modal")).as("violation_rows"))
      .select(col("n_groups"), col("n_violating_groups"),
        col("violation_rows"),
        (col("violation_rows") === 0L).as("fd_holds"))
  }

  /** Pairwise Pearson correlations of `cols` from ONE aggregate pass:
    * all first/second-order moments (d sums, d sums-of-squares,
    * d(d−1)/2 cross-products) accumulate in a single map-side-partial
    * scan; the d×d matrix assembles driver-side from that one row. The
    * feature-redundancy screen before training-data feature selection.
    *
    * Null handling: rows with a null in ANY of `cols` are dropped
    * (listwise deletion), so every pair sees the same n and the matrix
    * stays positive semi-definite. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val spark = df.sparkSession
    import spark.implicits._
    val clean = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      .na.drop(cols)
    val aggs =
      Seq(count(lit(1)).cast("double").as("n")) ++
        cols.map(c => sum(col(c)).as(s"s_$c")) ++
        cols.map(c => sum(col(c) * col(c)).as(s"ss_$c")) ++
        (for (i <- cols.indices; j <- cols.indices if i < j)
          yield sum(col(cols(i)) * col(cols(j)))
            .as(s"sp_${cols(i)}_${cols(j)}"))
    val row = clean.agg(aggs.head, aggs.tail: _*).head()
    def d(name: String) = row.getDouble(row.fieldIndex(name))
    val n = d("n")
    val pairs = for (i <- cols.indices; j <- cols.indices if i < j) yield {
      val (a, b) = (cols(i), cols(j))
      val cov = n * d(s"sp_${a}_$b") - d(s"s_$a") * d(s"s_$b")
      val va = n * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")
      val vb = n * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b")
      (a, b, BigDecimal(cov / math.sqrt(va * vb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    pairs.toDF("col_a", "col_b", "corr")
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the `valueCol`
    * distributions of two slices: D = max_x |F₁(x) − F₂(x)| over the
    * empirical CDFs. The distribution-shift screen that, unlike the mean
    * tests (q123), catches shape changes at equal means.
    *
    * Shape at 100 TB: per-distinct-value counts partial-aggregate first;
    * the CDF cumsum window runs over DISTINCT values of the measure
    * (value-bounded, same contract as the Zipf ranking — for continuous
    * measures, bucket first). */
  def ksTest(df: DataFrame, valueCol: String, sliceCol: String,
      sliceA: String, sliceB: String): DataFrame = {
    val perValue = df
      .filter(col(sliceCol).isin(sliceA, sliceB) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("x"))
      .agg(sum(when(col(sliceCol) === sliceA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(sliceCol) === sliceB, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = perValue
      .select(col("x"), sum("ca").over(w).as("cuma"),
        sum("cb").over(w).as("cumb"))
    // totals = the final cumulative counts (cumsums of non-negatives)
    val tot = cums.agg(max("cuma").as("n1"), max("cumb").as("n2"))
    cums.crossJoin(broadcast(tot))
      .agg(max("n1").as("n1"), max("n2").as("n2"),
        round(max(abs(
          col("cuma").cast("double") / col("n1").cast("double") -
            col("cumb").cast("double") / col("n2").cast("double"))), 6)
          .as("d_stat"))
  }

  /** Benford first-significant-digit profile of a positive numeric
    * column: observed fraction per digit 1..9 vs the Benford expectation
    * log10(1 + 1/d), with the chi-square statistic. The classic
    * fabricated-data / unit-mix screen for measurement columns. Rows
    * with null, zero, or negative values are excluded.
    *
    * First digit via string algebra (regexp over the plain-decimal cast)
    * rather than log10-floor powers: float pow drifts across engines,
    * string extraction is exact. One digit-count aggregate, map-side
    * partial — scan-bound, no data-sized shuffle. */
  def benfordProfile(df: DataFrame, valueCol: String): DataFrame = {
    // first nonzero digit of the absolute decimal representation
    val firstDigit = regexp_extract(
      col(valueCol).cast("double").cast("string"), "[1-9]", 0)
    val counts = df.filter(col(valueCol).isNotNull &&
        col(valueCol).cast("double") > 0)
      .select(firstDigit.as("d"))
      .filter(col("d") =!= "")
      .groupBy("d").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("d").cast("int").as("digit"), col("n"),
        round(col("n") / col("total"), 6).as("observed"),
        round(log10(lit(1.0) + lit(1.0) / col("d").cast("double")), 6)
          .as("expected"),
        round(pow(col("n") / col("total") -
            log10(lit(1.0) + lit(1.0) / col("d").cast("double")), 2) /
            log10(lit(1.0) + lit(1.0) / col("d").cast("double")) *
            col("total"), 4).as("chi2_term"))
      .orderBy("digit")
  }
}
