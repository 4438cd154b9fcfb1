package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine trainable text models built from pure count algebra — the
  * "learned quality/domain filter" tier of a training-data pipeline, but
  * with the TRAINING side expressed as relational dataflow too (contrast
  * `q142`, which runs inference for externally-learned weights).
  *
  * Everything here is exact integer counting plus `ln` — no SGD, no RNG —
  * so a DuckDB oracle can restate the whole train→score→evaluate loop and
  * hash-match it. That is the point: the canonical counting classifier
  * (multinomial Naive Bayes, McCallum & Nigam 1998) is the strongest model
  * class whose training is bit-reproducible across engines.
  *
  * Scale shape: training is one token-count shuffle (keyed by (class,
  * token), vocabulary-sized output) and scoring is one token-keyed join —
  * the model is never collected to the driver and never broadcast as a
  * whole, so a 10M-term vocabulary over 10 classes is just a 100M-row
  * dimension that shuffles like any other join input.
  */
object TextModels {

  /** Whitespace tokens of a lowercased string — the same portable
    * tokenization the dedup/statistics operators use (DuckDB:
    * `regexp_split_to_array(lower(trim(x)), '\s+')`). */
  def tokens(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)

  /** Train a multinomial Naive Bayes model with Laplace smoothing.
    *
    * Returns two DataFrames:
    *  - token log-likelihoods: `(tok, cls, ll)` — the COMPLETE vocab×class
    *    grid, so scoring needs no smoothing special-case (tokens seen in
    *    training but absent from a class carry `ln(1 / (N_c + V))`);
    *  - class log-priors: `(cls, logprior)`.
    *
    * The grid is vocab-keyed, not broadcast: at 100 TB the vocabulary is
    * itself big data and the grid stays a shuffle-joined dimension.
    */
  def naiveBayesTrain(train: DataFrame, textCol: String, classCol: String)
      : (DataFrame, DataFrame) = {
    val tok = train.select(col(classCol).as("cls"),
      explode(tokens(col(textCol))).as("tok"))
    val counts = tok.groupBy("cls", "tok").agg(count(lit(1)).as("cnt"))
    val classTotals = tok.groupBy("cls").agg(count(lit(1)).as("n_tok"))
    val vocab = counts.select("tok").distinct()
    val vSize = vocab.agg(count(lit(1)).as("v"))

    val ll = vocab
      .crossJoin(classTotals)
      .join(counts, Seq("cls", "tok"), "left")
      .crossJoin(vSize)
      .select(col("tok"), col("cls"),
        log((coalesce(col("cnt"), lit(0L)) + lit(1)).cast("double") /
          (col("n_tok") + col("v"))).as("ll"))

    val priors = train
      .groupBy(col(classCol).as("cls")).agg(count(lit(1)).as("n"))
      .crossJoin(train.agg(count(lit(1)).as("nd")))
      .select(col("cls"),
        log(col("n").cast("double") / col("nd")).as("logprior"))
    (ll, priors)
  }

  /** Per-doc per-class log-probability table (id, cls, lp). Tokens
    * outside the training vocabulary are dropped (the standard
    * multinomial convention). A document whose tokens are ALL
    * out-of-vocabulary — or that tokenizes to nothing — therefore has no
    * surviving evidence and yields NO rows here, so it gets no prediction
    * from naiveBayesScore/naiveBayesConfidence (rather than a prior-only
    * guess). Callers that need total coverage should left-join their id
    * universe against the score output and apply the prior argmax to the
    * gaps. */
  def classLogProbs(test: DataFrame, idCol: String, textCol: String,
      ll: DataFrame, priors: DataFrame): DataFrame = {
    val tf = test
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    tf.join(ll, Seq("tok"))
      .groupBy("id", "cls").agg(sum(col("tf") * col("ll")).as("tokll"))
      .join(priors, Seq("cls"))
      .select(col("id"), col("cls"),
        (col("tokll") + col("logprior")).as("lp"))
  }

  /** Score documents against a trained model: per-doc argmax class.
    *
    * Ties on log-probability break to the lexicographically smallest
    * class so the argmax is total. Output: `(id, pred, lp)` with `lp` the
    * winning log-probability rounded to 6 dp (rounded AFTER the argmax —
    * the ranking uses full doubles).
    */
  def naiveBayesScore(test: DataFrame, idCol: String, textCol: String,
      ll: DataFrame, priors: DataFrame): DataFrame = {
    val scored = classLogProbs(test, idCol, textCol, ll, priors)
    val w = Window.partitionBy("id").orderBy(col("lp").desc, col("cls").asc)
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("id"), col("cls").as("pred"), round(col("lp"), 6).as("lp"))
  }

  /** Per-doc predicted class with its stable-softmax confidence
    * `p(pred) = 1 / Σ_c exp(lp_c − lp_max)` — the number a calibration
    * audit bins against realized accuracy. Same id-keyed windows as the
    * argmax; no extra shuffle beyond the score itself. */
  def naiveBayesConfidence(test: DataFrame, idCol: String, textCol: String,
      ll: DataFrame, priors: DataFrame): DataFrame = {
    val scored = classLogProbs(test, idCol, textCol, ll, priors)
    val wid = Window.partitionBy("id")
    val w = Window.partitionBy("id").orderBy(col("lp").desc, col("cls").asc)
    scored
      .withColumn("_mx", max("lp").over(wid))
      .withColumn("_z", sum(exp(col("lp") - col("_mx"))).over(wid))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("id"), col("cls").as("pred"),
        (lit(1.0) / col("_z")).as("conf"))
  }
}
