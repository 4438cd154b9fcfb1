package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class StreamingSketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("incremental MG summary over micro-batches preserves heavy hitters") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // 60× "hot", 25× "warm", singletons; split across two micro-batches
    val batch1 = Seq.fill(40)("hot") ++ Seq.fill(10)("warm") ++
      (1 to 30).map(i => s"one$i")
    val batch2 = Seq.fill(20)("hot") ++ Seq.fill(15)("warm") ++
      (31 to 60).map(i => s"one$i")
    val in = MemoryStream[String]
    in.addData(batch1)
    in.addData(batch2)
    val stream = in.toDF().toDF("w")
    val static = (batch1 ++ batch2).toDF("w")
    val got = graft.streaming.StreamingSketches
      .heavyHittersStream(stream, static, "w", 8, "t_mg_hh")
      .as[(String, Long)].collect().toMap
    // N = 145, N/k = 18.1 → hot (60) and warm (25) qualify, nothing else
    assert(got == Map("hot" -> 60L, "warm" -> 25L))
    // stream ≡ batch: identical to the all-batch operator
    val batchSide = graft.operators.Frequency.heavyHitters(static, "w", 8)
      .as[(String, Long)].collect().toMap
    assert(got == batchSide)
  }

  test("windowed t-digest quantiles: stream matches batch within rank bound") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // two event-time hours × two groups, heavy-tailed values; second
    // micro-batch appends MORE data into hour 1 (state-store merge path)
    def rows(seed: Int, n: Int): Seq[(java.sql.Timestamp, String, Double)] =
      (0 until n).map { i =>
        val hour = (i % 2).toLong
        val g = if (i % 3 == 0) "a" else "b"
        val v = math.exp(5.0 * ((i * 2654435761L + seed) % 1000003L) / 1000003.0)
        (new java.sql.Timestamp((1700000000L + hour * 3600) * 1000L), g, v)
      }
    val b1 = rows(1, 3000); val b2 = rows(7, 3000)
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    in.addData(b1); in.addData(b2)
    val stream = in.toDF().toDF("ts", "g", "v")
    val got = graft.streaming.StreamingSketches
      .windowedQuantilesStream(stream, "ts", "g", "v", "1 hour",
        Seq(0.5, 0.95), "t_td_win")
      .select(col("w.start").cast("long").as("h"), col("g"), col("n"),
        col("p50"), col("p95"))
      .as[(Long, String, Long, Double, Double)].collect()
    assert(got.length == 4) // 2 windows × 2 groups
    val all = b1 ++ b2
    got.foreach { case (h, g, n, p50, p95) =>
      val mine = all.collect {
        case (ts, gg, v) if gg == g &&
          ts.getTime / 1000 / 3600 * 3600 == h => v
      }.sorted
      assert(n == mine.size.toLong)
      def rank(x: Double) = mine.count(_ <= x).toDouble / mine.size
      assert(math.abs(rank(p50) - 0.5) < 0.015, s"h=$h g=$g p50 rank=${rank(p50)}")
      assert(math.abs(rank(p95) - 0.95) < 0.015, s"h=$h g=$g p95 rank=${rank(p95)}")
    }
  }

  test("windowed quantile columns are collision-free: 0.995/0.999/1.0 get " +
    "distinct names and colliding requests fail loudly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def mkStream() = {
      val in = MemoryStream[(java.sql.Timestamp, String, Double)]
      in.addData((1 to 50).map(i =>
        (new java.sql.Timestamp(1700000000L * 1000L), "g", i.toDouble)))
      in.toDF().toDF("ts", "g", "v")
    }
    val got = graft.streaming.StreamingSketches
      .windowedQuantilesStream(mkStream(), "ts", "g", "v", "1 hour",
        Seq(0.5, 0.995, 0.999, 1.0), "t_td_names")
    // old round(p*100) naming mapped 0.995/0.999/1.0 ALL to "p100"
    val cols = got.columns.toSet
    assert(Set("p50", "p99_5", "p99_9", "p100").subsetOf(cols), cols)
    val r = got.select("p50", "p99_5", "p99_9", "p100")
      .as[(Double, Double, Double, Double)].head()
    assert(r._1 <= r._2 && r._2 <= r._3 && r._3 <= r._4)
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.StreamingSketches.windowedQuantilesStream(
        mkStream(), "ts", "g", "v", "1 hour",
        Seq(0.995, 0.99501), "t_td_clash")
    }
    assert(ex.getMessage.contains("colliding"))
  }
}
