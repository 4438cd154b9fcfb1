package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SessionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("sessions split exactly when the gap exceeds maxGap") {
    val ev = Seq(
      (1L, ts(0), 1.0), (1L, ts(100), 2.0),    // session 1 (gap 100 <= 100)
      (1L, ts(201), 4.0),                      // session 2 (gap 101 > 100)
      (2L, ts(50), 8.0))                       // other key: own session
      .toDF("user_id", "ts", "value")
    val got = Sessions.sessionize(ev, "user_id", "ts", "value",
        maxGapSeconds = 100L)
      .select("user_id", "session_seq", "n_events", "total_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 1L, 2L, 3.0),
      (1L, 2L, 1L, 4.0),
      (2L, 1L, 1L, 8.0)))
  }

  test("session bounds are the first and last event times") {
    val ev = Seq((1L, ts(10), 1.0), (1L, ts(20), 1.0), (1L, ts(15), 1.0))
      .toDF("user_id", "ts", "value")
    val got = Sessions.sessionize(ev, "user_id", "ts", "value", 60L)
      .select("session_start", "session_end", "n_events")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
    assert(got.length == 1)
    assert(got.head == ((ts(10), ts(20), 3L)))
  }

  test("assignSessions is 1-based and monotone per key") {
    val ev = Seq((1L, ts(0), 0.0), (1L, ts(1000), 0.0), (1L, ts(2000), 0.0))
      .toDF("user_id", "ts", "value")
    val seqs = Sessions.assignSessions(ev, "user_id", "ts", 10L)
      .orderBy("ts").select("session_seq").as[Long].collect().toSeq
    assert(seqs == Seq(1L, 2L, 3L))
  }
}
