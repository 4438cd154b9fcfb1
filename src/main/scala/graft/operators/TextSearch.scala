package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Term-relevance ranked retrieval over a text column — the analytics-side
  * equivalent of the reference's SOLR free-text ranking
  * (`index/SolrIndexDAO.scala` query paths in
  * /root/reference/src/main/scala/au/org/ala/biocache/): BM25 scoring
  * expressed as pure column algebra.
  *
  * Shape at 100 TB: the per-(doc, term) term frequencies come from one
  * explode filtered to the query terms BEFORE the shuffle (the filter is a
  * literal IN over a handful of terms, so the exploded volume is tiny);
  * document frequencies and average document length are one-row/tiny
  * aggregates attached by broadcast. Nothing collects to the driver.
  */
object TextSearch {

  /** BM25 score per document for a bag-of-terms query; only documents
    * containing at least one query term are returned. Standard Okapi
    * parameters (k1 term-saturation, b length-normalisation); idf uses the
    * ln(1 + (N − df + 0.5)/(df + 0.5)) form, non-negative by construction. */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "at least one query term")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val toks = split(lower(trim(col(textCol))), "\\s+")
    // corpus stats straight off the docs scan — one map-only aggregate,
    // no word explode and no per-doc shuffle
    val stats = docs.agg(count(lit(1)).cast("double").as("N"),
      avg(size(toks).cast("double")).as("avgdl"))
    // tf for query terms only — the IN filter runs before the shuffle,
    // so only matching words are ever exploded into the aggregation
    val tf = docs.select(col(idCol),
        size(toks).cast("double").as("dl"), explode(toks).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).cast("double").as("tf"), first("dl").as("dl"))
    val df_ = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) +
      (col("N") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    tf.join(broadcast(df_), "w")
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        (idf * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
          .as("term_score"))
      .groupBy(col(idCol))
      .agg(round(sum("term_score"), 4).as("bm25"))
  }

  /** Inverted index build: term → sorted posting list of document ids, with
    * document frequency. Terms with df > `maxDf` are dropped (stopword-class
    * terms whose postings would be the whole corpus — the standard df cutoff
    * that also removes the worst key skew before the posting-list shuffle).
    *
    * Shape at 100 TB: distinct (term, doc) pairs from the explode are
    * partially aggregated map-side; one shuffle keyed by term builds the
    * posting lists. The df cutoff bounds the largest reduce-side group to
    * `maxDf` entries, so no single term key can dominate a task. Posting
    * lists are emitted as sorted arrays — the natural layout for delta
    * encoding in a real serving store.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long): DataFrame = {
    val postings = docs
      .select(col(idCol).as("doc"),
        explode(array_distinct(split(lower(trim(col(textCol))), "\\s+")))
          .as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sort_array(collect_list("doc")).as("docs"))
    postings.filter(col("df") <= maxDf)
      .select(col("term"), col("df"), col("docs"))
  }

  /** Top-k TF-IDF terms per document — the classic keyword/topic signature
    * (and the dense-retrieval fallback when no embedding exists). Term
    * frequency is raw count over whitespace tokens; idf is the smooth
    * `ln((1 + N) / (1 + df)) + 1` form (never negative, defined for
    * df = N). Ranking is deterministic: (score desc, term asc) per doc.
    *
    * Shape at 100 TB: one explode → (doc, term) partial-aggregated count,
    * document frequencies partial-aggregate from the same table, attached
    * by broadcast when the vocabulary is broadcast-able (it is: vocab ≪
    * corpus); the per-doc top-k window partitions by doc — group size is
    * the doc's distinct-term count, never corpus-scale.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      topK: Int, minTermLen: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol).as("doc"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) >= minTermLen)
      .groupBy("doc", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val n = docs.agg(count(lit(1)).cast("double").as("N"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val w = Window.partitionBy("doc")
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(df_), "term")
      .crossJoin(broadcast(n))
      .select(col("doc"), col("term"),
        round(col("tf") *
          (log((lit(1.0) + col("N")) / (lit(1.0) + col("df"))) + lit(1.0)),
          6).as("tfidf"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
  }

  /** MOSS-style winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003): character k-gram hashes, one fingerprint per complete
    * window of `w` consecutive grams — the guaranteed-coverage local
    * document signature (any shared substring of length ≥ k + w − 1
    * yields at least one shared fingerprint), the standard code/quote
    * plagiarism detector.
    *
    * Selection is restated windowless-streaming-free: with (md5) gram
    * hashes, a position is selected iff its hash is the minimum of SOME
    * complete window containing it — checked with `w` frame-shifted
    * window minima over ONE (doc, pos) sort (same window spec, different
    * frames → a single exchange + sort; hash ties across positions are
    * md5-collision-rare and only add a fingerprint, never lose one).
    * Shape at 100 TB: the gram explode is map-only (~len rows per doc,
    * same volume as any shingling pass); the only shuffle is the per-doc
    * window sort; output is the DISTINCT (doc, fingerprint) set, ~2/(w+1)
    * of gram volume.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 2 && w >= 2, "gram size and window must be >= 2")
    // Round 12 (guide §2.4): the per-position explode + per-doc window
    // sort used to shuffle ~len rows per doc just to compute a per-doc
    // sliding minimum — winnowing is doc-local, so the whole selection
    // now runs in one map-only kernel pass ([[HashKernels.winnowHashes]],
    // bit-identical hashes: first 32 md5 bits per gram, same values the
    // DuckDB oracle replays). Normalization stays in engine expressions;
    // the kernel's per-doc distinct set IS the global distinct (doc, h)
    // set, so the trailing distinct() exchange is gone too. Zero
    // shuffles at any scale.
    val fpUdf = udf((t: String) =>
      graft.functions.HashKernels.winnowHashes(t, k, w))
    graft.Tuning.fanOutSmallScan(docs)
      .select(col(idCol).as("doc"),
        regexp_replace(lower(col(textCol)), "\\s+", " ").as("t"))
      .select(col("doc"), explode(fpUdf(col("t"))).as("h"))
  }

  /** Cross-document winnowing matches: pairs of documents sharing at
    * least `minShared` fingerprints, with the shared count. Fingerprints
    * with document frequency above `maxDf` are dropped first (boilerplate
    * grams whose posting groups would dominate the pair join — the same
    * df cutoff as [[invertedIndex]], and the skew bound that keeps any
    * single fingerprint's pair contribution ≤ maxDf²). */
  def winnowSharedPairs(fps: DataFrame, minShared: Long,
      maxDf: Long): DataFrame = {
    // the fingerprint pipeline (per-position gram explode + window minima)
    // feeds the df cutoff AND both pair-join sides — persist it, or the
    // text pass runs three times (same discipline as the minhash/simhash
    // signature tables)
    val f = fps.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = f.join(
      f.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf)
        .select("h"),
      Seq("h"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = kept.select(col("h"), col("doc").as("doc_a"))
    val b = kept.select(col("h"), col("doc").as("doc_b"))
    a.join(b, Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of several candidate
    * rankings: each input is `(name, df)` where df carries `idCol` and
    * `scoreCol`; item rank within each list is by (score desc, id), and the
    * fused score is Σ 1/(k + rank). The standard way to combine lexical
    * (BM25) and dense (embedding cosine) retrieval without score
    * calibration.
    *
    * Contract: inputs are CANDIDATE LISTS (top-M per ranking), not whole
    * corpora — ranking uses an unpartitioned window, which is a global sort
    * of the candidate set. Fusing full-corpus rankings at 100 TB is
    * meaningless anyway (rank 10⁹ contributes ~0); cut candidates first.
    */
  def rrfFusion(rankings: Seq[(String, DataFrame)], idCol: String,
      scoreCol: String, k: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rankings.nonEmpty, "at least one ranking")
    val ranked = rankings.map { case (name, df) =>
      val w = Window.orderBy(col(scoreCol).desc, col(idCol))
      df.select(col(idCol), col(scoreCol))
        .withColumn("rank", row_number().over(w))
        .select(col(idCol), col("rank"), lit(name).as("ranking"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(round(sum(lit(1.0) / (lit(k.toDouble) + col("rank"))), 6)
          .as("rrf"),
        count(lit(1)).as("n_rankings"))
  }
}
