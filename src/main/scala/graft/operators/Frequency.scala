package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.functions._

/** Exact heavy hitters at scale via the two-pass sketch-then-verify
  * pattern: a Misra–Gries summary (Misra & Gries 1982; mergeable-summaries
  * form of Agarwal et al. 2012) nominates ≤ k candidates in one pass, and
  * a second pass counts ONLY those candidates exactly. The MG guarantee —
  * any item with frequency > N/k survives the sketch — makes the final
  * output exact, deterministic, and oracle-checkable, while the full
  * item→count table never materialises.
  *
  * Shape at 100 TB: pass 1 is a typed `Aggregator` with partial
  * aggregation — each task reduces its partition to a ≤ k-entry summary
  * and only summaries shuffle (one per partition, k entries each). Pass 2
  * filters the scan to the ≤ k candidate values (a broadcast-size IN
  * list) before the count shuffle, so the aggregate carries at most k
  * groups. Total: two scans, no wide state anywhere.
  */
object Frequency {

  /** MG summary: capped counter map + the total stream length. */
  final case class MGSummary(counts: Map[String, Long], total: Long)

  /** Misra–Gries with capacity `k`: at most k counters; inserting a
    * non-resident item at capacity decrements all counters (dropping
    * zeros). Merge sums counterparts then strips the (k+1)-largest count —
    * the standard mergeable reduction, preserving the N/k error bound. */
  final class MisraGriesAgg(k: Int)
      extends Aggregator[String, MGSummary, MGSummary] {
    require(k > 1, "capacity must exceed 1")

    override def zero: MGSummary = MGSummary(Map.empty, 0L)

    override def reduce(b: MGSummary, item: String): MGSummary = {
      val c = b.counts
      if (c.contains(item))
        MGSummary(c.updated(item, c(item) + 1L), b.total + 1L)
      else if (c.size < k)
        MGSummary(c.updated(item, 1L), b.total + 1L)
      else {
        // decrement-all: drop zeroed counters, item itself is absorbed
        val dec = c.iterator
          .map { case (w, n) => (w, n - 1L) }
          .filter(_._2 > 0L).toMap
        MGSummary(dec, b.total + 1L)
      }
    }

    override def merge(b1: MGSummary, b2: MGSummary): MGSummary = {
      val sum = (b1.counts.keySet ++ b2.counts.keySet).iterator.map { w =>
        w -> (b1.counts.getOrElse(w, 0L) + b2.counts.getOrElse(w, 0L))
      }.toMap
      val capped =
        if (sum.size <= k) sum
        else {
          // subtract the (k+1)-th largest count from everything
          val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
          sum.iterator.map { case (w, n) => (w, n - cut) }
            .filter(_._2 > 0L).toMap
        }
      MGSummary(capped, b1.total + b2.total)
    }

    override def finish(b: MGSummary): MGSummary = b

    override def bufferEncoder: Encoder[MGSummary] =
      ExpressionEncoder[MGSummary]()
    override def outputEncoder: Encoder[MGSummary] =
      ExpressionEncoder[MGSummary]()
  }

  /** Exact items with frequency strictly above N/k in `valueCol`, with
    * their exact counts. The comparison is integer (`cnt · k > N`) — no
    * float threshold to disagree with an oracle about. */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(valueCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
    val summary = items.as[String]
      .select(new MisraGriesAgg(k).toColumn).head()
    val candidates = summary.counts.keys.toSeq
    if (candidates.isEmpty) {
      items.filter(lit(false))
        .groupBy("item").agg(count(lit(1)).as("cnt"))
    } else {
      items.filter(col("item").isin(candidates: _*))
        .groupBy("item").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * lit(k.toLong) > lit(summary.total))
    }
  }

  /** Count-min sketch of `valueCol` as (row, bucket, cnt) cells — the
    * fixed-size frequency summary for streams whose item table is itself
    * too large to aggregate ([[graft.functions.CountMinAgg]]; the buffer
    * is depth·width longs per partition regardless of input size). Zero
    * cells are included so the output schema/size is (depth·width) always;
    * the matrix contents are content-addressed and deterministic, so every
    * cell hash-checks against a DuckDB groupby restatement. */
  def countMinSketch(df: DataFrame, valueCol: String,
      depth: Int, width: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sketch = df.select(col(valueCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .as[String]
      .select(new graft.functions.CountMinAgg(depth, width).toColumn)
      .head()
    val cells = for (r <- 0 until depth; b <- 0 until width)
      yield (r, b, sketch(r * width + b))
    spark.createDataFrame(cells).toDF("r", "b", "cnt")
      .select(col("r").cast("int"), col("b").cast("int"), col("cnt"))
  }
}
