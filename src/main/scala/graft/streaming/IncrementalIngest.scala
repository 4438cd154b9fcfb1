package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental ingest & continuous aggregation via Structured Streaming.
  *
  * The reference's closest behaviours are batch workarounds — delta row-key
  * files and `loadMissingOnly` (`load/DwCALoader.scala:109`,
  * `cmd/IncrementalTool.scala` in
  * /root/reference/src/main/scala/au/org/ala/biocache/) — which map directly
  * onto `Trigger.AvailableNow` over a landing directory plus foreachBatch
  * upsert (SURVEY.md §2.10).
  */
object IncrementalIngest {

  /** Drain a parquet landing directory into `targetDir`, deduplicating by
    * rowKey within each micro-batch (latest file wins via max _ingestTs).
    * Returns after all available data is processed (batch-like semantics,
    * streaming engine — same code serves continuous ingest). */
  def ingestAvailableNow(spark: SparkSession, landingDir: String,
      schema: org.apache.spark.sql.types.StructType, targetDir: String,
      checkpointDir: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(landingDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("rowKey")
          .orderBy(col("_ingestTs").desc_nulls_last)
        val deduped =
          if (batch.columns.contains("_ingestTs"))
            batch.withColumn("_rn", row_number().over(w))
              .filter(col("_rn") === 1).drop("_rn")
          else batch.dropDuplicates("rowKey")
        deduped.write.mode("append").parquet(targetDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Watermarked sliding-window aggregation over an event stream —
    * the streaming form of the A1 facet (additive capability; the reference
    * has no streaming runtime). */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      window_ : String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_, slide), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
}
