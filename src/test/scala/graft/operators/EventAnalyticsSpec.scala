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

  test("madOutliers flags on the median/MAD scale, robust to the tail") {
    // 1..9 plus two extremes: the extremes cannot inflate the
    // median/MAD scale (they would under stddev)
    val vals = (1 to 9).map(_.toDouble) ++ Seq(500.0, -500.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "v")
    val got = Outliers.madOutliers(df, "grp", "v", 3.0)
      .select("id", "robust_z").as[(Long, Double)].collect().sortBy(_._1)
    // median 5, MAD 3 (devs 0,1,1,2,2,3,3,4,4,495,505 → middle 3)
    // 0.6745·495/3 = 111.29 and 0.6745·505/3 = 113.54
    assert(got.toSeq == Seq((9L, 111.29), (10L, 113.54)))
  }

  test("madOutliers: zero MAD (constant majority) flags nothing") {
    val df = (Seq.fill(10)(5.0) ++ Seq(100.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "grp", "v")
    // median 5, MAD 0 → guarded, no rows (not a divide-by-zero flood)
    assert(Outliers.madOutliers(df, "grp", "v", 3.0).isEmpty)
  }

  test("madOutliers uses interpolated medians on even counts") {
    val df = Seq((0L, "g", 1.0), (1L, "g", 2.0), (2L, "g", 3.0),
      (3L, "g", 100.0)).toDF("id", "grp", "v")
    // median (2+3)/2=2.5; |dev| = 1.5,0.5,0.5,97.5 → MAD (0.5+1.5)/2=1.0
    val got = Outliers.madOutliers(df, "grp", "v", 3.0)
      .select("id", "robust_z").as[(Long, Double)].collect()
    assert(got.toSeq == Seq((3L, round2(0.6745 * 97.5))))
  }

  private def round2(d: Double): Double = math.round(d * 100) / 100.0

  test("rrfFusion combines ranks with the 1/(k+r) formula") {
    val a = Seq((1L, 10.0), (2L, 5.0), (3L, 1.0)).toDF("id", "score")
    val b = Seq((2L, 9.0), (1L, 2.0)).toDF("id", "score")
    val got = TextSearch.rrfFusion(Seq("a" -> a, "b" -> b), "id", "score",
        k = 60)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    def rrf(rs: Int*) = math.round(rs.map(r => 1.0 / (60 + r)).sum * 1e6) / 1e6
    assert(got(1L) == ((rrf(1, 2), 2L)))
    assert(got(2L) == ((rrf(2, 1), 2L)))
    assert(got(3L) == ((rrf(3), 1L)))
  }

  test("rrfFusion breaks score ties by id (deterministic ranks)") {
    val a = Seq((7L, 1.0), (3L, 1.0), (5L, 1.0)).toDF("id", "score")
    val got = TextSearch.rrfFusion(Seq("a" -> a), "id", "score", k = 60)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    def rrf(r: Int) = math.round(1.0 / (60 + r) * 1e6) / 1e6
    assert(got == Map(3L -> rrf(1), 5L -> rrf(2), 7L -> rrf(3)))
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
