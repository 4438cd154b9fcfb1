package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column null counts, exact distinct counts,
  * and min/max, in long format — the `ANALYZE TABLE`-style summary a
  * pipeline runs before trusting a new 100 TB drop.
  *
  * Physical shape (round 10): ONE COLUMN-PRUNED SCAN PER COLUMN, each a
  * two-level hash aggregate — group by the column's value (map-side
  * partial collapses each partition to its distinct values), then fold
  * the value-count table into (nulls, distinct, min, max). The previous
  * all-in-one-agg form looked cheaper (one scan) but planned
  * catastrophically: c exact `count(DISTINCT)`s expand every row c+1×,
  * and string-typed min/max buffers are ineligible for HashAggregate,
  * so Spark SORT-aggregated the (c+1)·n expanded stream twice — 8.1 s
  * vs 1.4 s at sf0.1 for three lineitem columns. Per-column scans read
  * the SAME total bytes from columnar storage (each scan prunes to
  * exactly one column), stay hash-aggregated end-to-end (any
  * SortAggregate fallback touches only the distinct-value table), and
  * n_rows falls out of each column's Σcount for free.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    cols.map { c =>
      df.groupBy(col(c).as("_v")).agg(count(lit(1)).as("_n"))
        .agg(
          coalesce(sum("_n"), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("_v").isNull, col("_n"))), lit(0L))
            .as("n_null"),
          count(when(col("_v").isNotNull, lit(1))).as("n_distinct"),
          min(col("_v")).cast("string").as("min_str"),
          max(col("_v")).cast("string").as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionByName _)
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
        cols.map(c => coalesce(sum(col(c)), lit(0.0)).as(s"s_$c")) ++
        cols.map(c =>
          coalesce(sum(col(c) * col(c)), lit(0.0)).as(s"ss_$c")) ++
        (for (i <- cols.indices; j <- cols.indices if i < j)
          yield coalesce(sum(col(cols(i)) * col(cols(j))), lit(0.0))
            .as(s"sp_${cols(i)}_${cols(j)}"))
    val row = clean.agg(aggs.head, aggs.tail: _*).head()
    def d(name: String) = row.getDouble(row.fieldIndex(name))
    val n = d("n")
    // a zero-variance column (constant, or n ≤ 1) has no defined
    // correlation — emit NULL, matching SQL's corr() on the same input
    val pairs = for (i <- cols.indices; j <- cols.indices if i < j) yield {
      val (a, b) = (cols(i), cols(j))
      val cov = n * d(s"sp_${a}_$b") - d(s"s_$a") * d(s"s_$b")
      val va = n * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")
      val vb = n * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b")
      val corr: Option[Double] =
        if (va <= 0.0 || vb <= 0.0) None
        else Some(BigDecimal(cov / math.sqrt(va * vb))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (a, b, corr)
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

  /** Chi-square test of independence between two categorical columns,
    * plus Cramér's V (the normalized effect size) — the "are these two
    * facets actually related?" screen (language × source, segment ×
    * priority). Null categories are excluded.
    *
    * Uses the identity Σ(o−e)²/e = n·Σ_cells o²/(rowTot·colTot) − n, so
    * only OBSERVED cells are aggregated — zero-observed cells contribute
    * nothing to Σo²/e, and the margins come from the same cell table.
    * Shape at 100 TB: one (a, b) cell-count aggregate (map-side partial,
    * bounded by the category-pair cardinality), then margin joins over
    * the cell table — never a second scan of the data. */
  def chiSquareIndependence(df: DataFrame, colA: String,
      colB: String): DataFrame = {
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).cast("string").as("a"),
        col(colB).cast("string").as("b"))
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("a").agg(sum("o").as("ra"))
    val colTot = cells.groupBy("b").agg(sum("o").as("rb"))
    cells.join(broadcast(rowTot), "a").join(broadcast(colTot), "b")
      .agg(
        sum("o").as("n"),
        count_distinct(col("a")).as("r"),
        count_distinct(col("b")).as("c"),
        sum(col("o").cast("double") * col("o").cast("double") /
          (col("ra").cast("double") * col("rb").cast("double"))).as("_q"))
      .select(col("n"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        round(col("n").cast("double") * col("_q") - col("n"), 6)
          .as("chi2"),
        round(sqrt(greatest(lit(0.0),
          (col("n") * col("_q") - col("n")) /
            (col("n") * least(col("r") - 1, col("c") - 1)
              .cast("double")))), 6).as("cramers_v"))
  }

  /** Welch's unequal-variance t-test between two slices' means — the
    * "did slice B's mean move?" screen that pairs with the KS shape test
    * ([[ksTest]]): one moment aggregate (n, Σx, Σx² per slice), then the
    * t statistic and Welch–Satterthwaite degrees of freedom in closed
    * form. Scan-bound, no data-sized shuffle. Sample variance (n−1). */
  def welchTTest(df: DataFrame, valueCol: String, sliceCol: String,
      sliceA: String, sliceB: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val isA = col(sliceCol) === sliceA
    val m = df
      .filter(col(sliceCol).isin(sliceA, sliceB) && x.isNotNull)
      .agg(
        sum(when(isA, 1L).otherwise(0L)).cast("double").as("na"),
        sum(when(isA, x)).as("sa"),
        sum(when(isA, x * x)).as("qa"),
        sum(when(!isA, 1L).otherwise(0L)).cast("double").as("nb"),
        sum(when(!isA, x)).as("sb"),
        sum(when(!isA, x * x)).as("qb"))
    val ma = col("sa") / col("na")
    val mb = col("sb") / col("nb")
    val va = (col("qa") - col("sa") * col("sa") / col("na")) / (col("na") - 1)
    val vb = (col("qb") - col("sb") * col("sb") / col("nb")) / (col("nb") - 1)
    val sea = va / col("na")
    val seb = vb / col("nb")
    m.select(
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
      round((ma - mb) / sqrt(sea + seb), 6).as("t_stat"),
      round(pow(sea + seb, 2) /
        (pow(sea, 2) / (col("na") - 1) + pow(seb, 2) / (col("nb") - 1)), 4)
        .as("welch_df"))
  }

  /** Per-group ordinary-least-squares fit of `yCol` against `xCol`
    * (slope, intercept, r², n) — the per-segment trend screen ("is
    * quality drifting per source?"). One groupBy moment aggregate
    * (n, Σx, Σy, Σxy, Σx², Σy² — map-side partial), closed-form OLS per
    * group; never a per-group iterative fit. `xCenter` is subtracted
    * from x before the moments to keep the nΣxy − ΣxΣy cancellation
    * well-conditioned when x is a large epoch-like measure (the
    * intercept is reported at x = xCenter). Groups with < 2 points or
    * zero x-variance are dropped (no defined slope). */
  def groupOls(df: DataFrame, groupCol: String, xCol: String, yCol: String,
      xCenter: Double = 0.0): DataFrame = {
    val x = col(xCol).cast("double") - lit(xCenter)
    val y = col(yCol).cast("double")
    val m = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val covn = col("n") * col("sxy") - col("sx") * col("sy")
    val varxn = col("n") * col("sxx") - col("sx") * col("sx")
    val varyn = col("n") * col("syy") - col("sy") * col("sy")
    m.filter(col("n") >= 2 && varxn > 0)
      .select(col("grp"),
        col("n").cast("long").as("n"),
        round(covn / varxn, 6).as("slope"),
        round((col("sy") - covn / varxn * col("sx")) / col("n"), 6)
          .as("intercept"),
        round(when(varyn > 0, covn * covn / (varxn * varyn))
          .otherwise(lit(null)), 6).as("r2"))
  }

  /** Source-balance inequality report: Lorenz curve + Gini coefficient
    * of a per-group mass (row counts, token mass) — the corpus-mixing
    * dashboard number ("is 90% of the corpus one crawl?"). Returns one
    * row per group ordered ascending by mass: cumulative group share,
    * cumulative mass share, and the Gini repeated (long format, like
    * [[keySkewReport]]).
    *
    * Gini via the rank formula G = Σ(2i−n−1)·vᵢ / (n·Σv) over ascending
    * vᵢ — tie-safe (equal values make the coefficient sum invariant to
    * tie order). Shape: one mass aggregate (map-side partial), then
    * windows over the GROUP-cardinality table only. */
  def giniReport(df: DataFrame, groupCol: String,
      massCol: Column): DataFrame = {
    val mass = df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(massCol.cast("double").as("mass"))
    val w = Window.orderBy(col("mass"), col("grp"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = mass.select(col("grp"), col("mass"),
      row_number().over(w).as("i"),
      sum("mass").over(cum).as("cum_mass"))
    val tot = ranked.agg(count(lit(1)).cast("double").as("ng"),
      sum("mass").as("total"),
      sum((lit(2) * col("i") - 1).cast("double") * col("mass")).as("wsum"))
    ranked.crossJoin(broadcast(tot))
      .select(col("grp"), col("mass").cast("long").as("mass"),
        round(col("i") / col("ng"), 6).as("cum_group_share"),
        round(col("cum_mass") / col("total"), 6).as("cum_mass_share"),
        round(col("wsum") / (col("ng") * col("total")) - 1.0, 6)
          .as("gini"))
  }

  /** k-anonymity / l-diversity audit over a set of quasi-identifier
    * columns — the re-identification screen a training-data release runs
    * before publishing: every QI combination shared by fewer than `k`
    * rows is a linkage risk, and a group whose sensitive column is
    * single-valued leaks the attribute even at size ≥ k. Returns one
    * row: group counts, rows at risk, the smallest group, and the
    * minimum l-diversity (distinct sensitive values) over NON-risky
    * groups (risky groups need suppression anyway).
    *
    * Shape at 100 TB: one (QI..., sensitive) count aggregate (map-side
    * partial, bounded by distinct-combination cardinality), then
    * group-level algebra — raw rows never shuffle. */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 1)
    val cells = df.groupBy(
        (qiCols.map(col) :+ col(sensitiveCol).as("_sens")): _*)
      .agg(count(lit(1)).as("_n"))
    cells.groupBy(qiCols.map(col): _*)
      .agg(sum("_n").as("grp_rows"),
        count_distinct(col("_sens")).as("l_div"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("grp_rows") < k, 1L).otherwise(0L))
          .as("n_risky_groups"),
        sum(when(col("grp_rows") < k, col("grp_rows")).otherwise(0L))
          .as("rows_at_risk"),
        min("grp_rows").as("min_group_size"),
        min(when(col("grp_rows") >= k, col("l_div")))
          .as("min_l_diversity"))
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

  /** Mann–Whitney U rank-sum test between two slices — the
    * nonparametric mean-shift screen that, unlike [[welchTTest]], is
    * robust to the heavy-tailed length/score distributions corpus
    * columns actually have. Tie-corrected normal approximation.
    *
    * Ranks are never assigned per row: one per-DISTINCT-VALUE count
    * aggregate (map-side partial), then average ranks via a cumulative
    * window over the distinct-value table — the same value-bounded
    * contract as [[ksTest]]. A tied run of t values ending at cumulative
    * count c has average rank c − t + (t+1)/2; R_A = Σ tA·avgrank,
    * U_A = R_A − nA(nA+1)/2, and the tie term Σ(t³−t) corrects σ. */
  def mannWhitneyU(df: DataFrame, valueCol: String, sliceCol: String,
      sliceA: String, sliceB: String): DataFrame = {
    val byVal = df
      .filter(col(sliceCol).isin(sliceA, sliceB) &&
        col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(sum(when(col(sliceCol) === sliceA, 1L).otherwise(0L)).as("ta"),
        count(lit(1)).as("t"))
    val cum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byVal.select(col("ta"), col("t"),
      (sum("t").over(cum) - col("t") +
        (col("t") + 1).cast("double") / 2).as("avgrank"))
    val m = ranked.agg(
      sum("ta").cast("double").as("na"),
      sum(col("t") - col("ta")).cast("double").as("nb"),
      sum(col("ta") * col("avgrank")).as("rank_a"),
      sum(col("t") * col("t") * col("t") - col("t")).cast("double")
        .as("ties"))
    val n = col("na") + col("nb")
    val u = col("rank_a") - col("na") * (col("na") + 1) / 2
    val mu = col("na") * col("nb") / 2
    val sigma = sqrt(col("na") * col("nb") / 12 *
      ((n + 1) - col("ties") / (n * (n - 1))))
    m.select(col("na").cast("long").as("n_a"),
      col("nb").cast("long").as("n_b"),
      round(u, 2).as("u_a"),
      round((u - mu) / sigma, 6).as("z"))
  }

  /** Benjamini–Hochberg FDR screen over per-slice mean drift: every
    * slice's mean is z-tested against the REST of the data (Welch form
    * from the same single moment aggregate — rest = total − slice), the
    * two-sided p-value comes from the Abramowitz–Stegun 7.1.26 erfc
    * polynomial (closed-form arithmetic, reproducible on any engine —
    * there is no portable built-in normal CDF), and the BH step-up rule
    * at level `alpha` marks which slices survive multiple-testing
    * correction. p is computed from the 6-dp-ROUNDED z so engine
    * float-sum ordering cannot flip a boundary decision.
    *
    * Shape at 100 TB: one slice-keyed moment aggregate (map-side
    * partial), then all testing algebra on the slice-cardinality table;
    * the BH ranking window sorts slices, never rows. */
  def sliceDriftFdr(df: DataFrame, valueCol: String, sliceCol: String,
      alpha: Double): DataFrame = {
    val x = col(valueCol).cast("double")
    val m = df.filter(col(sliceCol).isNotNull && x.isNotNull)
      .groupBy(col(sliceCol).as("slice"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(x).as("s"), sum(x * x).as("q"))
    val tot = m.agg(sum("n").as("tn"), sum("s").as("ts"),
      sum("q").as("tq"))
    val j = m.crossJoin(broadcast(tot))
      .withColumn("rn", col("tn") - col("n"))
      .withColumn("rs", col("ts") - col("s"))
      .withColumn("rq", col("tq") - col("q"))
    val mean = col("s") / col("n")
    val rmean = col("rs") / col("rn")
    val v = (col("q") - col("s") * col("s") / col("n")) / (col("n") - 1)
    val rv = (col("rq") - col("rs") * col("rs") / col("rn")) /
      (col("rn") - 1)
    val zc = round((mean - rmean) / sqrt(v / col("n") + rv / col("rn")), 6)
    // two-sided p = erfc(|z|/√2) via A-S 7.1.26 (max abs error 1.5e-7)
    val az = abs(col("z")) / math.sqrt(2.0)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * az)
    val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t +
      lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t
    val scored = j.select(col("slice"), col("n").cast("long").as("n"),
        round(mean, 6).as("mean"), zc.as("z"))
      .withColumn("p", round(poly * exp(-az * az), 8))
    val byP = Window.orderBy(col("p"), col("slice"))
    val all = Window.orderBy(col("p"), col("slice"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val mCount = count(lit(1)).over(all)
    val ranked = scored.select(col("slice"), col("n"), col("mean"),
      col("z"), col("p"), row_number().over(byP).as("rank"),
      max(when(col("p") <= row_number().over(byP) * alpha / mCount,
        row_number().over(byP))).over(all).as("k"))
    ranked.select(col("slice"), col("n"), col("mean"), col("z"), col("p"),
      col("rank"), (col("k").isNotNull && col("rank") <= col("k"))
        .as("significant"))
  }

  /** Offline CUSUM changepoint detection per key: the point where the
    * cumulative sum of deviations from the key's mean is farthest from
    * zero — the classic "when did this metric shift?" screen over a
    * keyed time series (level changes show as a V in S_t). Returns per
    * key: n, the changepoint order value (max |S|, ties → earliest),
    * max|S|, and the scale-free statistic max|S|/(sd·√n).
    *
    * Shape at 100 TB: the key mean (unbounded frame) and the running
    * cumsum (ordered frame) are two window specs over the SAME
    * partitioning — one exchange, one sort; the per-key argmax is a
    * groupBy max over a (|S|, −order) struct, never a second sort. */
  def cusumChangepoint(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val byKey = Window.partitionBy("key")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ordered = Window.partitionBy("key").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.select(col(keyCol).as("key"),
        col(orderCol).as("ord"), col(valueCol).cast("double").as("x"))
      .filter(col("x").isNotNull && col("ord").isNotNull)
    val s = base
      .withColumn("mean", avg("x").over(byKey))
      .withColumn("sd", stddev_samp("x").over(byKey))
      .withColumn("nk", count(lit(1)).over(byKey))
      .withColumn("cusum", sum(col("x") - col("mean")).over(ordered))
    // |S| is rounded to 6 dp BEFORE the argmax: engines sum floats in
    // different orders, and a sub-noise |S| tie must not flip the
    // reported changepoint.
    s.groupBy("key")
      .agg(first("nk").as("n"), first("sd").as("sd"),
        max(struct(round(abs(col("cusum")), 6).as("a"),
          (-col("ord")).as("no"))).as("best"))
      .select(col("key"), col("n"),
        (-col("best.no")).as("changepoint_at"),
        round(col("best.a"), 4).as("max_abs_cusum"),
        round(col("best.a") / (col("sd") * sqrt(col("n"))), 6)
          .as("cusum_stat"))
  }

  /** Exact lower weighted median per group: the smallest value whose
    * cumulative weight (in (value, tieCol) order) reaches half the
    * group's total weight — all integer/exact comparisons, no
    * interpolation, so any engine lands on the identical row. One
    * group-keyed window + one tiny aggregate. With weight ≡ 1 this is the
    * plain lower median; with weight = bytes it answers "the size at
    * which half the corpus VOLUME sits in smaller rows". */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col(valueCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(groupCol)
    df
      .withColumn("_cum", sum(col(weightCol)).over(w))
      .withColumn("_tot", sum(col(weightCol)).over(tot))
      .filter(col("_cum") * 2 >= col("_tot"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("weighted_median"),
        max("_tot").as("total_weight"))
  }

  /** Differentially-private count release (Laplace mechanism) with
    * CONTENT-ADDRESSED noise: noise_g = Laplace(sensitivity/ε) drawn by
    * inverse-CDF from the md5-uniform of `group:salt` — the same
    * no-RNG-on-the-cluster discipline as every sampler here (a new salt
    * is a fresh draw; the same salt replays bit-identically, so the
    * release is auditable and engine-portable). Map-only after one count
    * aggregate. For a real release drop `n_true` from the projection —
    * it is returned so calibration tests (and the oracle) can check the
    * mechanism; the DP guarantee is about `n_noisy` alone.
    * Output: (group, n_true, n_noisy rounded 6 dp). */
  def dpNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
      salt: String, sensitivity: Double = 1.0): DataFrame = {
    require(epsilon > 0, s"dpNoisyCounts: epsilon=$epsilon must be > 0")
    // u in [0,1) from the first 13 hex chars (52 bits — exact in double)
    val u = conv(substring(md5(concat_ws(":",
      col("group").cast("string"), lit(salt))), 1, 13), 16, 10)
      .cast("double") / lit(4503599627370496.0) // 2^52
    val centered = u - 0.5
    val noise = (-lit(sensitivity / epsilon)) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    df.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("n_noisy", round(col("n_true") + noise, 6))
  }

  /** Differentially-private SUM release: each row's contribution is
    * CLIPPED to [0, clip] (the standard bounded-sensitivity trick — the
    * clip bound, not the data, sets the noise scale), then Laplace
    * noise with scale clip/ε is added per group, content-addressed like
    * [[dpNoisyCounts]]. Output: (group, sum_clipped, sum_noisy 6 dp);
    * drop `sum_clipped` for a real release. */
  def dpNoisySums(df: DataFrame, groupCol: String, valueCol: String,
      clip: Double, epsilon: Double, salt: String): DataFrame = {
    require(epsilon > 0 && clip > 0)
    val u = conv(substring(md5(concat_ws(":",
      col("group").cast("string"), lit(salt))), 1, 13), 16, 10)
      .cast("double") / lit(4503599627370496.0)
    val centered = u - 0.5
    val noise = (-lit(clip / epsilon)) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    df.groupBy(col(groupCol).as("group"))
      .agg(sum(greatest(least(col(valueCol), lit(clip)), lit(0.0)))
        .as("sum_clipped"))
      .select(col("group"), round(col("sum_clipped"), 6).as("sum_clipped"),
        round(col("sum_clipped") + noise, 6).as("sum_noisy"))
  }

  /** ROC AUC per slice for a score column against a binary label,
    * computed exactly as the Mann–Whitney U statistic over fractional
    * mid-ranks (the only correct treatment of tied scores):
    * AUC = (R₊ − n₊(n₊+1)/2) / (n₊·n₋) where R₊ = sum of positive
    * ranks. Two slice-keyed windows + one aggregate — no pairwise join,
    * so a slice with 10⁹ rows costs one sort, not 10¹⁸ pairs. Output:
    * (slice, n_pos, n_neg, auc 6 dp); slices with one class yield null. */
  def groupAuc(df: DataFrame, sliceCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val w = Window.partitionBy(sliceCol).orderBy(col(scoreCol))
    val wt = Window.partitionBy(sliceCol, scoreCol)
    val y = col(labelCol).cast("int")
    val ranked = df
      .filter(col(scoreCol).isNotNull && y.isin(0, 1))
      .withColumn("_r",
        rank().over(w) + (count(lit(1)).over(wt) - 1) / 2.0)
    ranked.groupBy(col(sliceCol).as("slice"))
      .agg(sum(y).cast("long").as("n_pos"),
        sum(lit(1) - y).cast("long").as("n_neg"),
        sum(when(y === 1, col("_r"))).as("_rpos"))
      .withColumn("auc", when(col("n_pos") > 0 && col("n_neg") > 0,
        round((col("_rpos") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
          (col("n_pos") * col("n_neg")), 6)))
      .drop("_rpos")
  }

  /** Spearman rank correlation per group: Pearson over fractional
    * (mid-) ranks, the tie-robust monotone-association measure —
    * [[correlationMatrix]]'s Pearson answers "linear", this answers
    * "monotone" (heavy-tailed quality scores, token counts). Fractional
    * rank = rank() + (ties−1)/2, computed with two group-keyed windows;
    * ranks then feed one `corr` partial aggregate. All shuffles keyed on
    * the group. Output: (group, n, spearman rounded 6 dp). */
  def spearmanCorr(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    def fracRank(c: String, out: String)(d: DataFrame): DataFrame = d
      .withColumn(out,
        rank().over(Window.partitionBy(groupCol).orderBy(col(c))) +
          (count(lit(1)).over(Window.partitionBy(groupCol, c)) - 1) / 2.0)
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .transform(fracRank(xCol, "_rx"))
      .transform(fracRank(yCol, "_ry"))
      .groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"),
        round(corr(col("_rx"), col("_ry")), 6).as("spearman"))
  }

  /** Isotonic (PAV) calibration over binned scores: the monotone
    * score→probability map that calibration plots want, fitted at scale
    * the standard way — scores aggregate into `bins` equi-width bins
    * distributively (each bin: count + positive count), then the
    * pool-adjacent-violators sweep runs over the ≤`bins`-row summary on
    * the driver (the model is a dimension, like k-means centroids — the
    * corpus never moves). The fitted step function is returned as a
    * per-bin table; joining it back to score rows is a broadcast.
    * Output: (bin, lo, hi, n, n_pos, raw_rate, calibrated) with
    * calibrated non-decreasing in bin order; empty bins are skipped
    * (PAV pools over observed bins). */
  def isotonicCalibrate(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 100): DataFrame = {
    require(bins >= 1 && bins <= 4096,
      s"isotonicCalibrate: bins=$bins outside [1,4096] (bin table must stay driver-sized)")
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("double")
    val base = df.filter(s.isNotNull && y.isNotNull)
    val Array(lo, hi) = base.agg(min(s), max(s)).collect()(0) match {
      case r if r.isNullAt(0) => Array(0.0, 1.0)
      case r => Array(r.getDouble(0), r.getDouble(1))
    }
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    val binned = base
      .withColumn("_b", least(floor((s - lit(lo)) / lit(span) * bins),
        lit(bins - 1L)).cast("long"))
      .groupBy("_b")
      .agg(count(lit(1)).as("n"), sum(y).as("n_pos"))
      .orderBy("_b")
      .collect() // ≤ bins rows by construction
    // PAV: pool adjacent bins while the rate decreases (weighted means)
    case class Block(b0: Long, b1: Long, n: Double, pos: Double) {
      def rate: Double = pos / n
    }
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    for (r <- binned) {
      var blk = Block(r.getLong(0), r.getLong(0),
        r.getLong(1).toDouble, r.getDouble(2))
      while (blocks.nonEmpty && blocks.last.rate > blk.rate) {
        val p = blocks.remove(blocks.length - 1)
        blk = Block(p.b0, blk.b1, p.n + blk.n, p.pos + blk.pos)
      }
      blocks += blk
    }
    val fitted = binned.map { r =>
      val b = r.getLong(0)
      val cal = blocks.find(k => k.b0 <= b && b <= k.b1).get.rate
      (b, lo + b * span / bins, lo + (b + 1) * span / bins,
        r.getLong(1), r.getDouble(2).toLong,
        BigDecimal(r.getDouble(2) / r.getLong(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(cal).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toSeq
    import df.sparkSession.implicits._
    fitted.toDF("bin", "lo", "hi", "n", "n_pos", "raw_rate", "calibrated")
  }

  /** CUPED variance-reduced treatment-effect estimate (Deng, Xu, Kohavi
    * & Walker, WSDM 2013) — the standard controlled-experiment readout
    * when a pre-period covariate exists: with per-unit pre-period metric
    * X and experiment metric Y, fit θ = cov(X,Y)/var(X) POOLED across
    * arms, adjust Ŷ = Y − θ·(X − E[X]), and report the adjusted arm
    * difference. Squared correlation ρ² is the variance removed.
    *
    * `units` must be ONE ROW PER EXPERIMENT UNIT with an `armCol` of two
    * values; everything reduces to a single moment aggregate
    * (n, Σx, Σy, Σxy, Σx², Σy² per arm — map-side partial, no
    * data-sized shuffle), and the estimator is closed-form over those
    * twelve scalars: effect_cuped = effect_raw − θ·(E[X|b] − E[X|a]).
    * Scan-bound at any corpus size.
    *
    * Output (one row): n_a, n_b, mean_y_a, mean_y_b, theta, effect_raw,
    * effect_cuped, rho_sq — 6 dp. Each output NULLs only on what it
    * needs: means/effect_raw require both arms, theta/effect_cuped
    * additionally var(X) > 0 (a constant covariate has nothing to
    * remove), rho_sq additionally var(Y) > 0. */
  def cuped(units: DataFrame, armCol: String, armB: String,
      preCol: String, metricCol: String): DataFrame = {
    val x = col(preCol).cast("double")
    val y = col(metricCol).cast("double")
    val isB = (col(armCol) === armB).cast("double")
    val isA = lit(1.0) - isB
    val m = units.agg(
      sum(isA).as("na"), sum(isB).as("nb"),
      sum(isA * x).as("sxa"), sum(isB * x).as("sxb"),
      sum(isA * y).as("sya"), sum(isB * y).as("syb"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val n = col("na") + col("nb")
    val sx = col("sxa") + col("sxb")
    val sy = col("sya") + col("syb")
    val covXY = n * col("sxy") - sx * sy
    val varX = n * col("sxx") - sx * sx
    val varY = n * col("syy") - sy * sy
    // each output NULLs only on what IT needs: means/effect_raw need
    // both arms; theta/effect_cuped additionally var(X)>0; rho_sq
    // additionally var(Y)>0 — a constant metric still has defined means
    val arms = col("na") > 0 && col("nb") > 0
    def guard(cond: Column)(c: Column): Column =
      when(cond, round(c, 6)).otherwise(lit(null).cast("double"))
    val theta = covXY / varX
    val effectRaw = col("syb") / col("nb") - col("sya") / col("na")
    val effectCuped = effectRaw -
      theta * (col("sxb") / col("nb") - col("sxa") / col("na"))
    m.select(
        coalesce(col("na"), lit(0.0)).cast("long").as("n_a"),
        coalesce(col("nb"), lit(0.0)).cast("long").as("n_b"),
        guard(arms)(col("sya") / col("na")).as("mean_y_a"),
        guard(arms)(col("syb") / col("nb")).as("mean_y_b"),
        guard(arms && varX > 0)(theta).as("theta"),
        guard(arms)(effectRaw).as("effect_raw"),
        guard(arms && varX > 0)(effectCuped).as("effect_cuped"),
        guard(arms && varX > 0 && varY > 0)(covXY * covXY / (varX * varY))
          .as("rho_sq"))
  }

  /** The other two standard A/B readouts next to [[cuped]], from the same
    * one-row moment aggregate:
    *
    *   - **Sample-ratio mismatch** (the #1 experiment health check): χ² of
    *     the observed arm counts against the expected B fraction,
    *     `srm_ok = χ² ≤ 3.841` (95th percentile of χ²₁ — a flagged split
    *     means randomization is broken and every downstream metric is
    *     suspect).
    *   - **Difference-in-differences** over a pre/post panel:
    *     did = (E[Y|b] − E[Y|a]) − (E[X|b] − E[X|a]) — the parallel-trends
    *     estimator that removes any fixed arm-level offset the
    *     randomization failed to balance.
    *
    * `units` is one row per unit (as in [[cuped]]); X = pre-period
    * metric, Y = post-period metric. One scan, map-side partials, six
    * scalars, closed form. NULL-degrades when an arm is missing. */
  def didHealth(units: DataFrame, armCol: String, armB: String,
      preCol: String, postCol: String,
      expectedB: Double = 0.5): DataFrame = {
    require(expectedB > 0 && expectedB < 1, "0 < expectedB < 1")
    val x = col(preCol).cast("double")
    val y = col(postCol).cast("double")
    val isB = (col(armCol) === armB).cast("double")
    val isA = lit(1.0) - isB
    val m = units.agg(
      sum(isA).as("na"), sum(isB).as("nb"),
      sum(isA * x).as("sxa"), sum(isB * x).as("sxb"),
      sum(isA * y).as("sya"), sum(isB * y).as("syb"))
    val n = col("na") + col("nb")
    val eb = n * expectedB
    val ea = n * (1.0 - expectedB)
    val chi2 = (col("nb") - eb) * (col("nb") - eb) / eb +
      (col("na") - ea) * (col("na") - ea) / ea
    val deltaA = col("sya") / col("na") - col("sxa") / col("na")
    val deltaB = col("syb") / col("nb") - col("sxb") / col("nb")
    def guarded(c: Column): Column =
      when(col("na") > 0 && col("nb") > 0, round(c, 6))
        .otherwise(lit(null).cast("double"))
    // SRM is defined (and maximally alarming, χ² = n) for a fully
    // one-sided split — that's the exact failure it exists to flag, so
    // it only NULLs on a truly empty experiment
    val anyUnit = coalesce(n, lit(0.0)) > 0
    m.select(
      coalesce(col("na"), lit(0.0)).cast("long").as("n_a"),
      coalesce(col("nb"), lit(0.0)).cast("long").as("n_b"),
      when(anyUnit, round(chi2, 6)).otherwise(lit(null).cast("double"))
        .as("srm_chi2"),
      when(anyUnit, chi2 <= 3.841)
        .otherwise(lit(null).cast("boolean")).as("srm_ok"),
      guarded(deltaA).as("delta_a"),
      guarded(deltaB).as("delta_b"),
      guarded(deltaB - deltaA).as("did"))
  }
}
