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
}
