package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association statistics between columns and within baskets — the
  * frequent-pattern / feature-dependence tier of data profiling: which
  * items co-occur (the A-priori L2 pass), and how strongly two
  * categorical columns determine each other (mutual information, the
  * "is this column redundant / leaking the label" screen).
  */
object Associations {

  /** Frequent co-occurring item pairs: distinct items per basket,
    * unordered pairs (a < b) counted across baskets, kept at
    * `support ≥ minSupport` — the candidate-pair (L2) pass of A-priori.
    * Returns the `topK` rows as `(item_a, item_b, support)` ordered by
    * support desc, item_a, item_b.
    *
    * Shape at 100 TB: the pair explosion is a self-join co-partitioned on
    * the basket key, so its volume is Σ |basket|² — bounded by the square
    * of the LARGEST basket, not the table; baskets are short in practice
    * (items per order / tags per doc). A pathological mega-basket is the
    * classic skew key: cap it upstream (filter baskets by size) or salt.
    * The pair count aggregate partial-aggregates map-side.
    */
  def coOccurrencePairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, topK: Int): DataFrame = {
    val items = df.select(col(basketCol).as("basket"),
      col(itemCol).as("item")).distinct()
    val a = items.select(col("basket"), col("item").as("item_a"))
    val b = items.select(col("basket"), col("item").as("item_b"))
    a.join(b, Seq("basket"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .orderBy(col("support").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** Mutual information between two categorical columns, from exact
    * counts: `MI = H(X) + H(Y) − H(X,Y)` in bits, with the entropies
    * reported alongside. `MI ≈ H(Y)` means X determines Y (a redundant
    * or label-leaking feature); `MI ≈ 0` means independent. One row:
    * `(n, h_x, h_y, h_xy, mi)`, all rounded to 6 dp.
    *
    * Shape at 100 TB: ONE shuffle over the data — the (x, y) contingency
    * table — then marginal and entropy algebra over that table, whose
    * cardinality is |X|·|Y| cells, not rows. The scalar total is one
    * action over the cell table.
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).cast("double").as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // entropy of a (key → c) table given the 1-row total alongside it
    val h = lit(0) - sum((col("c") / col("n")) * log2(col("c") / col("n")))
    val tot = cells.agg(sum("c").as("n"))
    def entropyOf(marginal: DataFrame, name: String): DataFrame =
      marginal.crossJoin(tot).agg(h.as(name))
    entropyOf(cells.groupBy("x").agg(sum("c").as("c")), "h_x")
      .crossJoin(entropyOf(cells.groupBy("y").agg(sum("c").as("c")), "h_y"))
      .crossJoin(entropyOf(cells, "h_xy"))
      .crossJoin(tot)
      .select(col("n").cast("long").as("n"),
        round(col("h_x"), 6).as("h_x"), round(col("h_y"), 6).as("h_y"),
        round(col("h_xy"), 6).as("h_xy"),
        round(col("h_x") + col("h_y") - col("h_xy"), 6).as("mi"))
  }
}
