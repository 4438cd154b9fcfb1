package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical feature encoding for model-training pipelines: the two
  * encoders every tabular feature store ships — a frequency-ordered
  * dictionary (string indexer) and leave-one-out smoothed target
  * encoding. Both are deterministic (total tie-breaks, exact integer
  * arithmetic where money is involved) so their outputs hash-check
  * against an oracle.
  */
object FeatureEncoding {

  /** Frequency-ordered dictionary over a categorical column: index 0 =
    * most frequent (ties → lexicographically smaller term). One count
    * shuffle over the DISTINCT-term table; the rank window runs over
    * |vocabulary| rows, not the corpus — the standard scale shape for a
    * fit step (a vocabulary that doesn't fit one task isn't a
    * categorical column). Output: (term, idx, n). */
  def fitDictionary(df: DataFrame, termCol: String): DataFrame = {
    val counts = df.filter(col(termCol).isNotNull)
      .groupBy(col(termCol).as("term"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("term").asc)
    counts.select(col("term"),
      (row_number().over(w) - 1).cast("long").as("idx"), col("n"))
  }

  /** Apply a fitted dictionary: unseen/null terms encode to
    * `defaultIdx` (conventionally |vocab|, the OOV bucket). Broadcast
    * join — the dictionary is vocabulary-sized. */
  def encodeWithDictionary(df: DataFrame, termCol: String,
      dict: DataFrame, defaultIdx: Long = -1L): DataFrame =
    df.join(broadcast(dict.select(col("term").as(termCol), col("idx"))),
        Seq(termCol), "left")
      .withColumn("idx", coalesce(col("idx"), lit(defaultIdx)))

  /** Leave-one-out smoothed target encoding of a categorical column:
    * each row's encoding is the mean target of its OWN category
    * excluding the row itself, shrunk toward the global prior by
    * pseudo-count `m`:
    *
    *   enc = (sum_cat − y + m·prior) / (n_cat − 1 + m)
    *
    * The LOO exclusion is what keeps the feature usable on training
    * rows (plain category means leak the row's own label); `m` keeps
    * rare categories from memorizing. One category aggregate broadcast
    * back, then map-only — no window, no self-join. Target sums run in
    * exact integer `scale`-ths (e.g. cents) so the arithmetic is
    * FP-order-proof; the division happens once per row in double.
    * Output: input columns + `enc` (rounded to 6 dp). Singleton
    * categories with m = 0 yield null (0/0) rather than a fabricated
    * value. */
  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String,
      m: Double, scale: Long = 100L): DataFrame = {
    val yInt = round(col(targetCol) * scale).cast("long")
    val withY = df.withColumn("_y", yInt)
    val catAgg = withY.groupBy(col(catCol))
      .agg(sum("_y").as("_sum"), count(lit(1)).as("_n"))
    val global = withY.agg(
      (sum("_y").cast("double") / count(lit(1)) / scale).as("_prior"))
    val denom = col("_n") - 1 + lit(m)
    withY.join(broadcast(catAgg), Seq(catCol))
      .crossJoin(broadcast(global))
      // explicit null on the m=0 singleton (ANSI division would throw)
      .withColumn("enc", when(denom =!= 0.0, round(
        ((col("_sum") - col("_y")).cast("double") / scale +
          lit(m) * col("_prior")) / denom, 6)))
      .drop("_y", "_sum", "_n", "_prior")
  }
}
