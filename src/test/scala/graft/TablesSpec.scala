package graft

import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** `events.ts` has shipped as TIMESTAMP(NANOS) in some testdata generations
  * and TIMESTAMP_NTZ(µs) in others; both must surface as session-zone
  * TimestampType with identical wall-clock values (round-6 regression:
  * the nanos-only conversion threw on the NTZ generation and silently
  * dropped all 17 event-table queries from the correctness gate).
  */
class TablesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("load('events') yields TimestampType ts on the shipped testdata") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(5).count() > 0)
  }

  test("normalizeTs converts long nanos to the same instant as a µs timestamp") {
    import org.apache.spark.sql.functions._
    // 2024-03-01T12:34:56.789Z in nanos
    val nanos = 1709296496789000000L
    val asLong = Seq(nanos).toDF("ts")
    val converted = Tables.normalizeTs(asLong)
    assert(converted.schema("ts").dataType == TimestampType)
    val got = converted.select(unix_micros(col("ts"))).as[Long].head()
    assert(got == nanos / 1000)
  }

  test("normalizeTs leaves TimestampType untouched and casts NTZ wall-clock-preserving") {
    import org.apache.spark.sql.functions._
    val ltz = Seq("2024-03-01 12:34:56.789").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    assert(Tables.normalizeTs(ltz).schema("ts").dataType == TimestampType)
    val ntz = Seq("2024-03-01 12:34:56.789").toDF("s")
      .select(to_timestamp_ntz(col("s")).as("ts"))
    val out = Tables.normalizeTs(ntz)
    assert(out.schema("ts").dataType == TimestampType)
    // session zone is UTC, so the NTZ wall-clock equals the LTZ instant
    val a = out.select(unix_micros(col("ts"))).as[Long].head()
    val b = ltz.select(unix_micros(col("ts"))).as[Long].head()
    assert(a == b)
  }
}
