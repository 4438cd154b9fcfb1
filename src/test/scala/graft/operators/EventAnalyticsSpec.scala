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

  test("buildScd2 collapses unchanged runs and builds intervals") {
    val log = Seq(
      (1L, ts(0), "bronze"), (1L, ts(1), "bronze"),  // redelivered same value
      (1L, ts(2), "silver"), (1L, ts(5), "gold"),
      (2L, ts(3), "bronze"))
      .toDF("user_id", "ts", "tier")
    val got = Scd.buildScd2(log, "user_id", "ts", Seq("tier"))
      .select("user_id", "version_seq", "tier", "valid_from", "valid_to",
        "is_current")
      .as[(Long, Long, String, java.sql.Timestamp,
        Option[java.sql.Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.map(r => (r._1, r._2, r._3, r._6)).toSeq == Seq(
      (1L, 1L, "bronze", false), (1L, 2L, "silver", false),
      (1L, 3L, "gold", true), (2L, 1L, "bronze", true)))
    // the redelivered identical snapshot did NOT open a version: bronze
    // runs from ts(0) until the silver change at ts(2)
    assert(got(0)._4 == ts(0) && got(0)._5.contains(ts(2)))
    // intervals chain without gaps
    assert(got(1)._5.contains(ts(5)) && got(2)._5.isEmpty)
  }

  test("transitionCounts pairs consecutive events per user") {
    val events = Seq(
      (1L, ts(0), "a", 10L), (1L, ts(1), "b", 11L), (1L, ts(2), "a", 12L),
      (2L, ts(0), "a", 20L), (2L, ts(1), "b", 21L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = EventAnalytics.transitionCounts(events, "user_id", "ts",
        "event_type", "event_id")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("a", "b") -> 2L, ("b", "a") -> 1L))
  }

  test("rollingByTime weights by event time, not row position") {
    val events = Seq(
      (1L, ts(0, 0), 1.0), (1L, ts(0, 30), 2.0),   // inside 60 s of next
      (1L, ts(0, 70), 4.0),                        // 30 s event still in
      (1L, ts(10), 8.0))                           // a day later: alone
      .toDF("user_id", "ts", "value")
    val got = EventAnalytics.rollingByTime(events, "user_id", "ts",
        "value", 60L)
      .select("value", "roll_n", "roll_sum")
      .as[(Double, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1.0, 1L, 1.0), (2.0, 2L, 3.0), (4.0, 2L, 6.0), (8.0, 1L, 8.0)))
  }

  test("zScoreOutliers flags far-from-group-mean rows only") {
    val df = (Seq.fill(50)(10.0) ++ Seq(1000.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "v")
    val got = Outliers.zScoreOutliers(df, "grp", "v", 3.0)
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(50L))  // only the 1000.0 row
    // zero-variance group flags nothing
    val flat = Seq((1L, "g", 5.0), (2L, "g", 5.0)).toDF("id", "grp", "v")
    assert(Outliers.zScoreOutliers(flat, "grp", "v", 3.0).isEmpty)
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
