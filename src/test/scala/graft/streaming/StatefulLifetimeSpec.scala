package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class StatefulLifetimeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import StatefulLifetime._

  test("transformWithState lifetime stats: stream of two batches ≡ batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      UserEvent(1L, "view", 1.0), UserEvent(1L, "view", 2.0),
      UserEvent(2L, "buy", 10.0))
    val b2 = Seq(
      UserEvent(1L, "buy", 5.0), UserEvent(2L, "buy", 20.0),
      UserEvent(2L, "view", 0.5), UserEvent(3L, "view", 7.0))
    val in = MemoryStream[UserEvent]
    val log = withRocksDb(spark) {
      val q = startLifetime(in.toDS(), "t_tws_lifetime",
        availableNow = false)
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
      q.stop()
      spark.table("t_tws_lifetime")
    }
    val got = finalTotals(log)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((3L, 2L, 8.0)),
      2L -> ((3L, 2L, 30.5)),
      3L -> ((1L, 1L, 7.0))))
    // the change-log really is incremental: user 1 appears once per batch
    val updates = spark.table("t_tws_lifetime")
      .filter($"user_id" === 1L).count()
    assert(updates == 2L)
  }
}
