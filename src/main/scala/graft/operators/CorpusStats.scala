package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level distributional statistics for training-data curation:
  * per-slice drift against the rest of the corpus (the signal behind
  * source-mixture rebalancing and contamination triage) and vocabulary
  * coverage (the tokenizer-design input).
  *
  * Shape at 100 TB: everything is token-count algebra — one explode +
  * count shuffle keyed by (slice, word), then joins between aggregates
  * whose cardinality is the vocabulary (millions of rows, trivially
  * distributed), never the corpus. No driver-side state beyond scalars.
  */
object CorpusStats {

  /** Smoothed KL divergence KL(P_slice ‖ P_rest) per value of `sliceCol`,
    * over whitespace-token unigram distributions with add-`alpha` smoothing
    * on the union vocabulary. High KL = the slice's language is far from
    * the rest of the corpus (over-sampled boilerplate, a different domain,
    * or contamination). Returns `(slice, kl, n_tokens)` with `kl` rounded
    * to 6 dp for cross-engine float stability.
    */
  def klDrift(docs: DataFrame, textCol: String, sliceCol: String,
      alpha: Double = 0.5): DataFrame = {
    val words = docs.select(col(sliceCol).as("slice"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val counts = words.groupBy("slice", "w")
      .agg(count(lit(1)).cast("double").as("c"))
    val totals = counts.groupBy("slice").agg(sum("c").as("tot"))
    val corpus = counts.groupBy("w").agg(sum("c").as("call"))
    val vocabSize = corpus.count().toDouble
    val grandTotal = totals.agg(coalesce(sum("tot"), lit(0.0)))
      .head().getDouble(0)
    // (slice × vocab) grid: every slice scores every vocab word, so the
    // smoothing mass is identical across slices
    val grid = totals.crossJoin(corpus)
      .join(counts, Seq("slice", "w"), "left")
      .select(col("slice"), col("tot"), col("call"),
        coalesce(col("c"), lit(0.0)).as("c"))
    val p = (col("c") + lit(alpha)) / (col("tot") + lit(alpha) * vocabSize)
    val q = (col("call") - col("c") + lit(alpha)) /
      (lit(grandTotal) - col("tot") + lit(alpha) * vocabSize)
    grid.groupBy("slice")
      .agg(round(sum(p * log(p / q)), 6).as("kl"),
        sum("c").cast("long").as("n_tokens"))
  }

  /** Vocabulary coverage: take the top-`k` corpus words by frequency (ties
    * broken lexically), then per slice report what fraction of token
    * occurrences the vocabulary covers — the OOV-rate table a tokenizer
    * design iterates on. Returns `(slice, n_tokens, covered, coverage)`.
    *
    * The top-k is a full count shuffle followed by a k-row sort — partial
    * aggregation reduces the sort input to the distinct vocabulary, and k
    * rows broadcast back against the per-slice counts.
    */
  def vocabCoverage(docs: DataFrame, textCol: String, sliceCol: String,
      k: Int): DataFrame = {
    val words = docs.select(col(sliceCol).as("slice"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val vocab = words.groupBy("w").agg(count(lit(1)).as("cw"))
      .orderBy(col("cw").desc, col("w")).limit(k)
      .select(col("w"), lit(1).as("in_vocab"))
    words.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("slice")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("in_vocab"), lit(0)).cast("long")).as("covered"))
      .select(col("slice"), col("n_tokens"), col("covered"),
        round(col("covered").cast("double") / col("n_tokens"), 6)
          .as("coverage"))
  }

  /** PMI collocations (Church & Hanks 1990): adjacent word pairs scored
    * by pointwise mutual information
    * `log2( (c_ab/NB) / ((c_a/N)·(c_b/N)) )` — high-PMI pairs are
    * multiword units ("new york") a tokenizer or phrase-miner should keep
    * together; raw bigram counts alone just surface stopword pairs.
    * Pairs below `minCount` are cut first (PMI is noise at tiny counts).
    * Returns the `topK` rows as `(bigram, c_ab, c_a, c_b, pmi)` ordered
    * by the ROUNDED pmi (4 dp, cross-engine float-stable) desc, bigram.
    *
    * Shape at 100 TB: one token-count shuffle each for unigrams and
    * bigrams (both partial-aggregated to vocabulary cardinality), then
    * two joins keyed on the component words of the surviving (≥ minCount)
    * bigram table — vocabulary-sized tables only, never the corpus. N and
    * NB are two scalar actions over those aggregates.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long = 5, topK: Int = 20): DataFrame = {
    val toks = docs
      .select(split(lower(trim(col(textCol))), "\\s+").as("ws"))
      .select(filter(col("ws"), w => length(w) > 0).as("ws"))
    val unigrams = toks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val bigrams = toks
      .select(explode(graft.functions.TextFunctions
        .wordBigrams(col("ws"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val n = unigrams.agg(coalesce(sum("cw"), lit(0L)))
      .head().getLong(0).toDouble
    val nBigrams = toks
      .select(greatest(size(col("ws")) - 1, lit(0)).cast("long").as("nb"))
      .agg(coalesce(sum("nb"), lit(0L))).head().getLong(0).toDouble
    val joined = bigrams
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(unigrams.select(col("w").as("w1"), col("cw").as("c_a")), Seq("w1"))
      .join(unigrams.select(col("w").as("w2"), col("cw").as("c_b")), Seq("w2"))
    joined.select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
        round(log2((col("c_ab") / lit(nBigrams)) /
          ((col("c_a") / lit(n)) * (col("c_b") / lit(n)))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(topK)
  }

  /** Zipf rank-frequency fit over the top-`topN` terms: OLS slope and
    * intercept of ln(count) against ln(rank), plus R². Natural-language
    * corpora sit near slope ≈ −1; a corpus drifting away from that (after
    * aggressive filtering, or when machine-generated text floods in) is a
    * health signal worth alerting on. Rank ties break by term, so the fit
    * is deterministic on any engine.
    *
    * Shape at 100 TB: the term-count table partial-aggregates to
    * vocabulary cardinality; ranking the top N is a vocabulary-sized sort
    * (never the corpus) and the OLS moments are one scalar aggregate over
    * N rows.
    */
  def zipfFit(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).cast("double").as("c"))
    val ranked = counts
      .withColumn("rk",
        row_number().over(Window.orderBy(col("c").desc, col("w"))))
      .filter(col("rk") <= topN)
      .select(log(col("rk").cast("double")).as("x"), log(col("c")).as("y"))
    ranked.agg(count(lit(1)).cast("double").as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n").cast("long").as("n_terms"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - col("sx") *
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")))) / col("n"), 6)
          .as("intercept"),
        round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
  }

  /** Behavioural-pattern novelty curve: per day, what fraction of the
    * day's event-type trigrams (per-user consecutive windows, the
    * [[EventAnalytics.eventTrigrams]] pattern unit) had NEVER been seen
    * on an earlier day — the corpus-freshness / drift-onset signal a
    * pipeline monitors to notice when yesterday's dedup no longer covers
    * today's traffic. A pattern's first day comes from one min-aggregate
    * over the (pattern, day) table; novelty is then a day-keyed rollup.
    * Shuffles: user-keyed window, pattern-keyed min, day-keyed sum —
    * all partial-aggregable. Output: (day, n_patterns, n_new, novelty
    * rounded 6 dp), one row per active day. */
  def patternNovelty(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val pats = events
      .select(to_date(col(tsCol)).as("day"), col(typeCol).as("_a"),
        lead(col(typeCol), 1).over(w).as("_b"),
        lead(col(typeCol), 2).over(w).as("_c"))
      .filter(col("_b").isNotNull && col("_c").isNotNull)
      .select(col("day"),
        concat_ws(">", col("_a"), col("_b"), col("_c")).as("pattern"))
    val daily = pats.groupBy("day", "pattern").agg(count(lit(1)).as("n"))
    val firstDay = daily.groupBy("pattern").agg(min("day").as("first_day"))
    daily.join(firstDay, Seq("pattern"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_patterns"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("n_new"))
      .withColumn("novelty",
        round(col("n_new").cast("double") / col("n_patterns"), 6))
  }

  /** Pairwise Jensen–Shannon divergence (log₂, so ∈ [0,1]) between the
    * unigram distributions of every slice pair — [[klDrift]]'s symmetric,
    * bounded sibling: the drift MATRIX a mixture designer reads to see
    * which sources are interchangeable and which are a different language
    * entirely. No smoothing needed: with the mixture m=(p+q)/2, zero-mass
    * terms drop out natively (p·log(p/m) → 0 as p → 0, and m > 0 whenever
    * either side has mass).
    *
    * Shape: one (slice × vocab) grid like klDrift's (smoothing-free, so
    * absent words coalesce to 0), self-joined on the word with a
    * triangular slice guard — the join key is the HIGH-cardinality word,
    * the pair count is |slices|², and every aggregate is partial. Output:
    * (slice_a, slice_b, jsd) for a < b, 6 dp. */
  def jsDivergenceMatrix(docs: DataFrame, textCol: String,
      sliceCol: String): DataFrame = {
    val words = docs.select(col(sliceCol).as("slice"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val counts = words.groupBy("slice", "w")
      .agg(count(lit(1)).cast("double").as("c"))
    val totals = counts.groupBy("slice").agg(sum("c").as("tot"))
    val corpus = counts.select("w").distinct()
    val grid = totals.crossJoin(corpus)
      .join(counts, Seq("slice", "w"), "left")
      .select(col("slice"), col("w"),
        (coalesce(col("c"), lit(0.0)) / col("tot")).as("p"))
    val a = grid.select(col("slice").as("slice_a"), col("w"),
      col("p").as("pa"))
    val b = grid.select(col("slice").as("slice_b"), col("w"),
      col("p").as("pb"))
    val mCol = (col("pa") + col("pb")) / 2
    def term(p: org.apache.spark.sql.Column) =
      when(p > 0, p * log(2.0, p / mCol)).otherwise(lit(0.0))
    a.join(b, Seq("w")).filter(col("slice_a") < col("slice_b"))
      .groupBy("slice_a", "slice_b")
      .agg(round(sum((term(col("pa")) + term(col("pb"))) / 2), 6).as("jsd"))
  }
}
