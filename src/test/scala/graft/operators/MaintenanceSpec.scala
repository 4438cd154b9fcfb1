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

  test("mergeApply: update, delete, insert, no-op delete, untouched") {
    val tgt = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val src = Seq(
      (2L, false, "B", 99.0),  // update
      (3L, true, "x", 0.0),    // delete
      (4L, false, "d", 40.0),  // insert
      (5L, true, "x", 0.0))    // delete of a missing row: no-op
      .toDF("id", "del", "name", "v")
    val got = Maintenance.mergeApply(tgt, src, "id", "del")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B", 99.0), (4L, "d", 40.0)))
  }

  test("incrementalAggMerge equals a full recompute; zero-count keys drop") {
    val base = Seq(("k1", 1.0), ("k1", 2.0), ("k2", 5.0), ("k3", 7.0))
      .toDF("key", "v")
    val state = base.groupBy("key")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.sum("v").as("sum"))
    // delete both k1 rows and the k2 row; insert k2 again and new k4
    val delta = Seq(("k1", 1.0, -1L), ("k1", 2.0, -1L), ("k2", 5.0, -1L),
      ("k2", 6.0, 1L), ("k4", 9.0, 1L)).toDF("key", "v", "op")
    val got = Maintenance
      .incrementalAggMerge(state, delta, "key", "v", "op")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("k2", 1L, 6.0), ("k3", 1L, 7.0), ("k4", 1L, 9.0)))
  }

  test("compactTable executes plan -> rewrite -> atomic swap on a real " +
    "multi-small-file table: fewer files, identical rows, markers kept") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_")
      .resolve("tbl").toString
    // 12 tiny files via 12 single-row writes — the many-small-per-load
    // shape the reference's optimise step exists for
    val rows = (1L to 12L).map(i => (i, s"doc $i payload ${"x" * 50}"))
    rows.foreach { case (id, txt) =>
      Seq((id, txt)).toDF("id", "text").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    def parquetFiles() = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = parquetFiles().length
    assert(before >= 12)
    val hadSuccess = new java.io.File(dir, "_SUCCESS").exists()
    val summary = Maintenance
      .compactTable(spark, dir, targetBytes = 1L << 40) // one bin
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(summary.map(_._3).sum == before, "plan must cover every file")
    val after = parquetFiles()
    assert(after.length == 1, s"expected one compacted file, got " +
      after.map(_.getName).mkString(","))
    assert(after.head.getName.startsWith("compacted-"))
    // no staging or old-snapshot residue
    assert(!new java.io.File(dir + ".compact-tmp").exists())
    assert(!new java.io.File(dir + ".compact-old").exists())
    // rows survive byte-for-byte as a multiset
    val got = spark.read.parquet(dir).as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == rows)
    if (hadSuccess) assert(new java.io.File(dir, "_SUCCESS").exists())
  }

  test("compactTable compacts hive-partitioned subdirs independently " +
    "and singleton bins copy byte-identically") {
    val root = java.nio.file.Files.createTempDirectory("graft_compact2_")
      .resolve("tbl")
    java.nio.file.Files.createDirectories(root)
    val dir = root.toString
    // partition a: 3 small files; partition b: 1 file (singleton copy)
    (1L to 3L).foreach { i =>
      Seq((i, "a")).toDF("id", "part").drop("part").coalesce(1)
        .write.mode("append").parquet(s"$dir/part=a")
    }
    Seq((99L)).toDF("id").coalesce(1)
      .write.mode("append").parquet(s"$dir/part=b")
    val bBytes = new java.io.File(s"$dir/part=b").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val summary = Maintenance.compactTable(spark, dir, 1L << 40)
      .as[(String, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(summary == Map("part=a" -> 3L, "part=b" -> 1L))
    def files(p: String) = new java.io.File(s"$dir/part=$p").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files("a").length == 1 && files("b").length == 1)
    // the singleton was copied, not re-encoded: byte length unchanged
    assert(files("b").head.length() == bBytes)
    val ids = spark.read.parquet(dir).select("id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 99L))
  }
}
