package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

case class CandRow(rowKey: String, taxonGuid: String, year: String,
  month: String, day: String, lat: String, lon: String, collector: String,
  recordNumber: String, catalogueNumber: String, druid: String)

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

  // round-11 (q248 contract): foreachBatch is AT-LEAST-ONCE — a crash
  // after the merge side effect but before the offset commit replays the
  // micro-batch on restart. The CDC loop survives because mergeApply is
  // IDEMPOTENT (re-upserting the same rows and re-deleting absent keys
  // are both no-ops), so the kill+restart run's final state must be
  // byte-identical to the clean run's. The spec forces the replay for
  // real: same checkpoint, crash injected after applying batch 1.
  test("CDC mergeApply loop: micro-batch replay after kill+restart " +
    "leaves the final state identical (idempotent merge)") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-cdc-replay").toString
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val base = Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "A"),
      (4L, 40.0, "C")).toDF("k", "bal", "seg")
    // three ordered changesets: update k=1, delete k=2, insert k=9
    Seq((1L, false, 11.0, "A")).toDF("k", "del", "bal", "seg")
      .coalesce(1).write.parquet(s"$dir/c0")
    Seq((2L, true, 0.0, "B")).toDF("k", "del", "bal", "seg")
      .coalesce(1).write.parquet(s"$dir/c1")
    Seq((9L, false, 90.0, "Z")).toDF("k", "del", "bal", "seg")
      .coalesce(1).write.parquet(s"$dir/c2")
    val files = (0 to 2).map { i =>
      new java.io.File(s"$dir/c$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
    }
    val flat = Files.createTempDirectory("graft-cdc-flat").toString
    files.zipWithIndex.foreach { case (f, i) =>
      val t = java.nio.file.Paths.get(s"$flat/change$i.parquet")
      java.nio.file.Files.copy(f.toPath, t)
      java.nio.file.Files.setLastModifiedTime(t,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
    }
    val schema = Seq((0L, false, 0.0, "")).toDF("k", "del", "bal", "seg")
      .schema

    def runLoop(checkpoint: String,
        crashAfterBatch: Option[Long]): (DataFrame, Seq[Long]) = {
      var state = base.localCheckpoint(true)
      val applied = scala.collection.mutable.ArrayBuffer.empty[Long]
      var crashed = false
      def start() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(flat)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          if (!batch.isEmpty) {
            // side effect FIRST, crash BEFORE the offset commit — the
            // exact at-least-once window the contract covers
            state = graft.operators.Maintenance
              .mergeApply(state, batch, "k", "del").localCheckpoint(true)
            applied += id
            if (!crashed && crashAfterBatch.contains(id)) {
              crashed = true
              throw new RuntimeException("injected crash after merge")
            }
          }
          ()
        }.start()
      try start().awaitTermination()
      catch { case _: org.apache.spark.sql.streaming
          .StreamingQueryException => // injected crash — restart
        start().awaitTermination()
      }
      (state, applied.toSeq)
    }

    val (clean, cleanIds) =
      runLoop(Files.createTempDirectory("ck-clean").toString, None)
    val (replayed, replayIds) = runLoop(ckpt, Some(1L))
    assert(cleanIds == Seq(0L, 1L, 2L))
    // the crash really forced a replay: batch 1 applied twice
    assert(replayIds == Seq(0L, 1L, 1L, 2L),
      s"expected batch 1 replay, got $replayIds")
    def canon(df: DataFrame) =
      df.orderBy("k").as[(Long, Double, String)].collect().toSeq
    assert(canon(replayed) == canon(clean))
    assert(canon(clean) == Seq((1L, 11.0, "A"), (3L, 30.0, "A"),
      (4L, 40.0, "C"), (9L, 90.0, "Z")))
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

  test("streaming sessionization equals batch session_window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val events = Seq(
      (1L, ts(0), 1.0), (1L, ts(30), 2.0),   // one session (gap 30 < 60)
      (1L, ts(200), 4.0),                    // next session
      (2L, ts(10), 8.0), (2L, ts(300), 16.0))

    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val agg = graft.operators.Sessions.sessionizeStream(
      in.toDF().toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", "60 seconds", "1 second")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    in.addData(events.take(3))
    q.processAllAvailable()
    in.addData(events.drop(3))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql(
      "SELECT user_id, session_start, n_events, total_value FROM sess_out")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
    val batch = graft.operators.Sessions.sessionizeStream(
        events.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", "60 seconds", "1 second")
      .select($"user_id", $"session_start", $"n_events", $"total_value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.size == 4) // (1: 2 sessions), (2: 2 sessions)
  }

  test("streaming content dedup drops repeats across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val deduped = IncrementalIngest.dedupStreamByContent(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()

    // batch 1: two distinct contents, one in-batch repeat (min id wins)
    in.addData((1L, "alpha beta"), (2L, "gamma"), (3L, "alpha  BETA "))
    q.processAllAvailable()
    // batch 2: one cross-batch repeat, one genuinely new content
    in.addData((4L, "gamma"), (5L, "delta"))
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT id FROM dedup_out")
      .as[Long].collect().toSet
    // 3 drops to 1 (same normalised content), 4 drops to 2 cross-batch
    assert(got == Set(1L, 2L, 5L))

    // stream ≡ batch: same survivors as Dedup.dropExactDuplicates
    val all = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "alpha  BETA "),
      (4L, "gamma"), (5L, "delta")).toDF("doc_id", "text")
    val batchSurvivors = graft.operators.Dedup
      .dropExactDuplicates(all, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == batchSurvivors)
  }

  test("stream-stream interval join equals batch, across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // times sit well above epoch: a row whose event time is ≤ the query's
    // INITIAL watermark (epoch 0) is filtered as late before any data
    // has advanced it
    def ts(sec: Long) = new java.sql.Timestamp((100000L + sec) * 1000L)
    // impressions (key, imp_id, ts); conversions (key, conv_id, ts)
    val imps = Seq((10L, 100L, ts(0)), (10L, 101L, ts(500)),
      (20L, 102L, ts(0)))
    val convs = Seq((10L, 900L, ts(60)),   // matches imp 100 (in horizon)
      (10L, 901L, ts(560)),                // matches 101; too late for 100
      (20L, 902L, ts(400)),                // outside 300 s horizon of 102
      (30L, 903L, ts(10)))                 // no impression at all

    val impIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val convIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = IncrementalIngest.intervalJoinStreams(
      impIn.toDF().toDF("user_id", "imp_id", "ts"),
      convIn.toDF().toDF("conv_user", "conv_id", "conv_ts"),
      "user_id", "conv_user", "ts", "conv_ts", "10 seconds", 300L)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    // arrivals interleave across micro-batches; matches land in batches
    // AFTER their impression, within each side's watermark
    impIn.addData(imps.take(1) ++ imps.drop(2)) // imp 100, imp 102 (ts 0)
    convIn.addData(convs.drop(3))               // conv 903 (ts 10)
    q.processAllAvailable()
    impIn.addData(imps.slice(1, 2))             // imp 101 (ts 500)
    convIn.addData(convs.take(1) ++ convs.slice(2, 3)) // conv 900, 902
    q.processAllAvailable()
    convIn.addData(convs.slice(1, 2))           // conv 901 (ts 560)
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT imp_id, conv_id FROM ssj_out")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 900L), (101L, 901L)))

    // stream ≡ batch interval join
    val batch = imps.toDF("user_id", "imp_id", "ts")
      .join(convs.toDF("conv_user", "conv_id", "conv_ts"),
        expr("""user_id = conv_user AND conv_ts >= ts AND
                conv_ts <= ts + INTERVAL 300 SECOND"""))
      .select("imp_id", "conv_id").as[(Long, Long)].collect().toSet
    assert(got == batch)
  }

  test("dedupStreamWithinHorizon drops redeliveries inside the horizon " +
      "but re-admits the key after it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp((100000L + sec) * 1000L)
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = IncrementalIngest.dedupStreamWithinHorizon(
      in.toDF().toDF("event_id", "ts", "payload"),
      Seq("event_id"), "ts", "60 seconds")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("horizon_out").start()
    // original + in-batch redelivery
    in.addData((7L, ts(0), "first"), (7L, ts(5), "retry-fast"))
    q.processAllAvailable()
    // cross-batch redelivery still inside the 60 s horizon
    in.addData((7L, ts(30), "retry-slow"), (8L, ts(40), "other"))
    q.processAllAvailable()
    // advance event time far past the horizon: state for key 7 expires,
    // a NEW legitimate event with the recycled id passes
    in.addData((9L, ts(500), "mover"))
    q.processAllAvailable()
    in.addData((7L, ts(520), "recycled"))
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT event_id, payload FROM horizon_out")
      .as[(Long, String)].collect().toSet
    assert(got == Set((7L, "first"), (8L, "other"),
      (9L, "mover"), (7L, "recycled")))
  }

  test("streaming incremental duplication detection equals one batch pass") {
    def cand(rk: String, taxon: String, lat: String, lon: String) =
      CandRow(rk, taxon, "2000", "01", "02", lat, lon, null, null, null,
        "dr1")
    // two landing files processed as TWO micro-batches (maxFilesPerTrigger)
    val landing = Files.createTempDirectory("graft-dupstream").toString
    // batch 1: t1 cluster (a,b); lone c in t2
    Seq(cand("a", "t1", "-35.2", "149.1"),
      cand("b", "t1", "-35.2", "149.1"), cand("c", "t2", "-30.1", "140.2"))
      .toDF().coalesce(1).write.parquet(s"$landing/b1")
    // batch 2: d joins t2 (new cluster); a re-arrives MOVED to t3 —
    // breaking the t1 cluster — and pairs with e there
    Seq(cand("d", "t2", "-30.1", "140.2"),
      cand("a", "t3", "-20.5", "130.5"), cand("e", "t3", "-20.5", "130.5"))
      .toDF().coalesce(1).write.parquet(s"$landing/b2")
    val f1 = new java.io.File(s"$landing/b1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val f2 = new java.io.File(s"$landing/b2").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dir = Files.createTempDirectory("graft-dupland").toString
    java.nio.file.Files.copy(f1.toPath,
      java.nio.file.Paths.get(s"$dir/batch1.parquet"))
    java.nio.file.Files.copy(f2.toPath,
      java.nio.file.Paths.get(s"$dir/batch2.parquet"))
    // file source orders by modification time: stamp batch2 later
    new java.io.File(s"$dir/batch1.parquet").setLastModified(1000000L)
    new java.io.File(s"$dir/batch2.parquet").setLastModified(2000000L)
    val stream = spark.readStream
      .schema(Seq(cand("x", "t", "0", "0")).toDF().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val (all, dups) = IncrementalIngest.duplicatesStream(spark, stream)
    val batchDups = graft.operators.DuplicationDetection
      .findDuplicates(spark, all)
    def key(r: graft.operators.DuplicationDetection.DupResult) =
      (r.rowKey, r.taxonGuid, r.clusterId, r.status)
    assert(dups.collect().map(key).sorted.toSeq ==
      batchDups.collect().map(key).sorted.toSeq)
    // the moved record really did break t1 and cluster in t3
    val byTaxon = dups.collect().groupBy(_.taxonGuid)
    assert(!byTaxon.contains("t1"))
    assert(byTaxon("t3").map(_.rowKey).toSet == Set("a", "e"))
    assert(byTaxon("t2").map(_.rowKey).toSet == Set("c", "d"))
  }
}
