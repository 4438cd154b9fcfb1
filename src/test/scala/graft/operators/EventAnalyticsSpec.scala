package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(day: Long, sec: Long = 0) =
    new java.sql.Timestamp((day * 86400L + sec) * 1000L)

  test("cohortRetention buckets users by first-activity period") {
    val events = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(3)),   // cohort day0: active 0,1,3
      (2L, ts(0)), (2L, ts(0, 30)),            // cohort day0: active 0 only
      (3L, ts(1)), (3L, ts(3)))                // cohort day1: active 1,3
      .toDF("user_id", "ts")
    val got = EventAnalytics.cohortRetention(events, "user_id", "ts", 86400L)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }

  test("funnel requires ordered progression") {
    val events = Seq(
      // user 1 completes in order
      (1L, ts(0), "click"), (1L, ts(1), "view"), (1L, ts(2), "purchase"),
      // user 2: purchase BEFORE first view → stops at view
      (2L, ts(0), "click"), (2L, ts(2), "view"), (2L, ts(1), "purchase"),
      // user 3: no click at all → counts nowhere
      (3L, ts(0), "view"), (3L, ts(1), "purchase"),
      // user 4: click only
      (4L, ts(5), "click"),
      // noise types are ignored
      (1L, ts(0), "error"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("click", "view", "purchase"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, "click", 3L), (1L, "view", 2L), (2L, "purchase", 1L)))
  }

  test("same-timestamp progression counts (>= not >)") {
    val events = Seq(
      (1L, ts(0), "click"), (1L, ts(0), "view"), (1L, ts(0), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("click", "view", "purchase"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.map(_._3).toSeq == Seq(1L, 1L, 1L))
  }
}
