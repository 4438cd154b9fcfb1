package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("availableNow ingest drains landing dir and dedups by rowKey") {
    val landing = Files.createTempDirectory("graft-landing").toString
    val target = Files.createTempDirectory("graft-target").toString + "/occ"
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    val batch = Seq(("k1", "a", 1L), ("k1", "b", 2L), ("k2", "c", 1L))
      .toDF("rowKey", "v", "_ingestTs")
    batch.write.mode("overwrite").parquet(landing)

    IncrementalIngest.ingestAvailableNow(spark, landing, batch.schema,
      target, ckpt)

    val out = spark.read.parquet(target).select("rowKey", "v")
      .as[(String, String)].collect().toMap
    assert(out == Map("k1" -> "b", "k2" -> "c"))
  }

  test("streaming windowed counts equal batch computation") {
    val landing = Files.createTempDirectory("graft-ev").toString
    val events = (0 until 100).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"),
        if (i % 2 == 0) "click" else "view", i.toDouble))
      .toDF("ts", "event_type", "value")
    events.write.mode("overwrite").parquet(landing)

    val stream = spark.readStream.schema(events.schema).parquet(landing)
    val agg = IncrementalIngest.windowedCounts(stream, "ts", "event_type",
      "10 minutes", "10 minutes", "1 minute")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.sql(
      "SELECT window.start, event_type, n, total_value FROM win_out")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = events
      .groupBy(window($"ts", "10 minutes", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select($"window.start", $"event_type", $"n", $"total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batch)
  }
}
