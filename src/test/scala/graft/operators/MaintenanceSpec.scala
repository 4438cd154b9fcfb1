package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("compaction bins stay near target; oversized files isolate") {
    val files = Seq(
      ("p1", "a", 300L), ("p1", "b", 300L), ("p1", "c", 300L),
      ("p1", "d", 5000L), // oversized: own bin
      ("p1", "e", 100L),
      ("p2", "a", 10L)) // partitions bin independently
      .toDF("pt", "path", "bytes")
    val plan = Maintenance.compactionPlan(files, "pt", "path", "bytes",
        targetBytes = 1000L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
      .toSet
    // cumsum-before: a=0,b=300,c=600 -> bin 0; d=900 -> bin 0 (enters at
    // 900 < 1000); e=5900 -> bin 5
    assert(plan == Set(("p1", "a", 0L), ("p1", "b", 0L), ("p1", "c", 0L),
      ("p1", "d", 0L), ("p1", "e", 5L), ("p2", "a", 0L)))
    // every bin's pre-file start offset is below target (the cumsum bound)
    val bins = Maintenance.compactionPlan(files, "pt", "path", "bytes", 1000L)
      .groupBy("partition", "bin")
      .agg(org.apache.spark.sql.functions.sum("size_bytes").as("s"))
      .collect()
    assert(bins.length == 3)
  }

  test("plan is deterministic under repartitioning and duplicate listings") {
    val files = (1 to 500).map(i => ("p", f"f$i%03d", (i % 37 + 1) * 10L))
      .toDF("pt", "path", "bytes")
    val a = Maintenance.compactionPlan(files, "pt", "path", "bytes", 700L)
      .collect().map(r => (r.getString(1), r.getLong(3))).sorted.toSeq
    val b = Maintenance.compactionPlan(files.repartition(7), "pt", "path",
        "bytes", 700L)
      .collect().map(r => (r.getString(1), r.getLong(3))).sorted.toSeq
    assert(a == b)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val cur = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("id", "text")
    val got = Maintenance.snapshotDiff(prev, cur, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }
}
