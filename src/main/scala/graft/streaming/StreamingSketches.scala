package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Frequency.{MGSummary, MisraGriesAgg}

/** Incremental sketch maintenance over streams: the pattern a live
  * counters/alerting surface needs at 100 TB/day — per micro-batch the
  * DISTRIBUTED part reduces the batch to a constant-size mergeable
  * summary (partial aggregation inside the batch, one summary out), and
  * the driver folds summaries together. Driver state is the summary
  * alone (≤ k counters), bounded for any stream length — never a
  * word→count table.
  */
object StreamingSketches {

  /** Drain an AvailableNow stream of string values, maintaining one
    * Misra–Gries summary across all micro-batches. Each batch runs the
    * typed aggregate (partial-aggregated across partitions); the per-batch
    * summaries OR rather MERGE into the running one with the standard
    * mergeable-summaries reduction, preserving the N/k bound over the
    * whole stream. */
  def misraGriesAvailableNow(stream: DataFrame, valueCol: String,
      k: Int, queryName: String): MGSummary = {
    val agg = new MisraGriesAgg(k)
    var summary = agg.zero
    val q = stream
      .select(col(valueCol).cast("string").as("item"))
      .filter(col("item").isNotNull && length(col("item")) > 0)
      .writeStream
      .outputMode("append")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        val batchSummary = batch.select(col("item")).as[String]
          .select(agg.toColumn).head()
        // foreachBatch runs serially per query: plain var is safe
        summary = agg.merge(summary, batchSummary)
      }
      .start()
    q.awaitTermination()
    summary
  }

  /** Exact heavy hitters (count·k > N) where candidate nomination ran
    * INCREMENTALLY over the drained stream and only the exact verify pass
    * touches the static data — identical output to the all-batch
    * `Frequency.heavyHitters` by the MG survival guarantee, demonstrated
    * by the stream ≡ batch spec. */
  def heavyHittersStream(stream: DataFrame, static: DataFrame,
      valueCol: String, k: Int, queryName: String): DataFrame = {
    val summary = misraGriesAvailableNow(stream, valueCol, k, queryName)
    val items = static.select(col(valueCol).cast("string").as("item"))
      .filter(col("item").isNotNull && length(col("item")) > 0)
    val candidates = summary.counts.keys.toSeq
    if (candidates.isEmpty) {
      items.filter(lit(false)).groupBy("item").agg(count(lit(1)).as("cnt"))
    } else {
      items.filter(col("item").isin(candidates: _*))
        .groupBy("item").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * lit(k.toLong) > lit(summary.total))
    }
  }

  /** Event-time windowed tail-latency quantiles whose per-window state is
    * a t-digest ([[graft.functions.TDigestAgg]]) held IN the streaming
    * aggregation's state store: ~2δ centroids per (window, group)
    * regardless of events per window, and partial aggregation ships
    * digests, not rows — the p95/p99-per-window dashboard at stream
    * scale. Complete-mode drain of an AvailableNow source; output one row
    * per (window, group) with the requested quantile estimates
    * (`p50`-style column per requested quantile). */
  def windowedQuantilesStream(stream: DataFrame, tsCol: String,
      groupCol: String, valueCol: String, windowDuration: String,
      quantiles: Seq[Double], queryName: String,
      compression: Double = 100.0): DataFrame = {
    import graft.functions.TDigestAgg
    val td = udaf(new TDigestAgg(compression))
    val agg = stream
      .groupBy(window(col(tsCol), windowDuration).as("w"), col(groupCol))
      .agg(count(lit(1)).as("n"),
        td(col(valueCol).cast("double")).as("digest"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val base = stream.sparkSession.table(queryName)
    // collision-free column names: integral percents stay `p95`-style;
    // fractional ones carry the decimals after an underscore (0.999 →
    // `p99_9`, 0.995 → `p99_5`, 0.005 → `p0_5`). The old
    // round(p*100) scheme mapped 0.995/0.999/1.0 all to "p100" and the
    // foldLeft silently overwrote one requested quantile with another.
    val names = quantiles.map { p =>
      val bp = math.round(p * 10000)
      if (bp % 100 == 0) s"p${bp / 100}"
      else {
        val frac = (bp % 100).toInt
        val fracStr =
          if (frac % 10 == 0) (frac / 10).toString else f"$frac%02d"
        s"p${bp / 100}_$fracStr"
      }
    }
    require(names.distinct.size == names.size,
      s"windowedQuantilesStream: quantiles $quantiles yield colliding " +
        s"column names $names — quantiles must differ at 4 decimal places")
    quantiles.zip(names).foldLeft(base) { case (df, (p, name)) =>
      df.withColumn(name, TDigestAgg.quantileOf(col("digest"), p))
    }.drop("digest")
  }
}
