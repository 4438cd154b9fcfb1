package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DuplicationSpec extends AnyFunSuite {
  import DuplicationDetection._

  private def cand(rowKey: String, lat: String, lon: String,
      collector: String = "Smith, J.", rn: String = null, cn: String = null,
      druid: String = "dr1", taxon: String = "t1") =
    DupCandidate(rowKey, taxon, "2000", "01", "02", lat, lon, collector, rn, cn, druid)

  test("same coords + same collector cluster; higher precision is representative") {
    val rs = Iterator(
      cand("a", "-35.26", "149.26"),
      cand("b", "-35.2613", "149.2612"),
      cand("c", "-10.0", "120.0"))
    val out = clusterBlock(rs).toSeq
    assert(out.map(_.rowKey).toSet == Set("a", "b"))
    val rep = out.find(_.status == "R").get
    assert(rep.rowKey == "b") // 4 decimal places beats 2
    assert(out.find(_.rowKey == "a").get.status == "D1") // same druid
  }

  test("different collectors beyond levenshtein 3 do not cluster") {
    val rs = Iterator(
      cand("a", "-35.26", "149.26", collector = "Smith, J."),
      cand("b", "-35.26", "149.26", collector = "Completely Different Person"))
    assert(clusterBlock(rs).isEmpty)
  }

  test("fuzzy collector within distance 3 clusters with type 7") {
    val rs = Iterator(
      cand("a", "-35.26", "149.26", collector = "J Smith"),
      cand("b", "-35.26", "149.26", collector = "J Smyth"))
    val out = clusterBlock(rs).toSeq
    assert(out.size == 2)
    assert(out.exists(_.dupTypes.contains(7)))
  }

  test("missing collector counts as match (type 8)") {
    val rs = Iterator(
      cand("a", "-35.26", "149.26", collector = null),
      cand("b", "-35.26", "149.26", collector = "Anyone"))
    val out = clusterBlock(rs).toSeq
    assert(out.size == 2)
    assert(out.exists(_.dupTypes.contains(8)))
  }

  test("catalogue number match clusters records with unlike collectors") {
    val rs = Iterator(
      cand("a", "-35.26", "149.26", collector = "Person One", cn = "CAT99"),
      cand("b", "-35.26", "149.26", collector = "Someone Else Entirely", cn = "cat99"))
    val out = clusterBlock(rs).toSeq
    assert(out.size == 2)
    assert(out.exists(_.dupTypes.contains(10)))
  }

  test("different coordinates at top precision never cluster") {
    val rs = Iterator(
      cand("a", "-35.0", "149.0"),
      cand("b", "-36.0", "150.0"))
    assert(clusterBlock(rs).isEmpty)
  }

  test("salted path merges clusters linked by a flat record across 1-dp cells") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // a and d sit in different 1-dp cells; c is flat (integer precision) and
    // spatially matches both. With maxBlockSize=2 the block splits by 1-dp
    // cell, c is replicated, and the two clusters must merge around c.
    val df = Seq(
      ("a", "t1", "2000", "01", "02", "-35.2", "149.2", null, null, null, "dr1"),
      ("c", "t1", "2000", "01", "02", "-35", "149", null, null, null, "dr1"),
      ("d", "t1", "2000", "01", "02", "-35.3", "149.3", null, null, null, "dr2"))
      .toDF("rowKey", "taxonGuid", "year", "month", "day", "lat", "lon",
        "collector", "recordNumber", "catalogueNumber", "druid")
    val out = DuplicationDetection.findDuplicates(spark, df, maxBlockSize = 2)
      .collect()
    assert(out.map(_.rowKey).toSet == Set("a", "c", "d"))
    assert(out.map(_.clusterId).toSet.size == 1)
    val rep = out.find(_.status == "R").get
    assert(rep.rowKey == "a") // max precision 1dp, min rowKey tie-break vs d
    assert(out.find(_.rowKey == "c").get.status == "D1")
    assert(out.find(_.rowKey == "d").get.status == "D2")
    // exact path on the same data: c links to a only (greedy seed a),
    // d stays unclustered — documents the (intended) drift in big blocks
    val exact = DuplicationDetection.findDuplicates(spark, df).collect()
    assert(exact.map(_.rowKey).toSet == Set("a", "c"))
  }

  test("100k-row skewed block (one taxon, unknown date) finishes bounded") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // one mega-block by (taxon, UNKNOWN, UNKNOWN, UNKNOWN, cell0): 100k rows
    // spread over the 1-dp grid of a single integer cell. The unsalted
    // kernel would run ~1e10 pair comparisons in ONE task; the salted path
    // splits it into ~100 sub-blocks.
    val n = 100000
    val df = spark.range(n).select(
      format_string("r%07d", col("id")).as("rowKey"),
      lit("taxonX").as("taxonGuid"),
      lit(null).cast("string").as("year"),
      lit(null).cast("string").as("month"),
      lit(null).cast("string").as("day"),
      concat(lit("-35."), (col("id") % 10).cast("string")).as("lat"),
      concat(lit("149."), ((col("id") / 10) % 10).cast("string")).as("lon"),
      format_string("Collector %d", col("id")).as("collector"),
      lit(null).cast("string").as("recordNumber"),
      lit(null).cast("string").as("catalogueNumber"),
      lit("dr1").as("druid"))
    val t0 = System.nanoTime()
    val out = DuplicationDetection.findDuplicates(spark, df, maxBlockSize = 20000)
    // distinct collectors (levenshtein > 3 apart for differing ids) means few
    // clusters; the point is wall-clock, not the cluster content
    val cnt = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 300.0, s"salted mega-block took ${secs}s")
    assert(cnt >= 0)
  }

  test("spark end-to-end: blocks isolate taxa") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq(
      ("a", "t1", "2000", "01", "02", "-35.26", "149.26", "J Smith", null, null, "dr1"),
      ("b", "t1", "2000", "01", "02", "-35.2612", "149.2613", "J Smith", null, null, "dr2"),
      ("c", "t2", "2000", "01", "02", "-35.26", "149.26", "J Smith", null, null, "dr1"))
      .toDF("rowKey", "taxonGuid", "year", "month", "day", "lat", "lon",
        "collector", "recordNumber", "catalogueNumber", "druid")
    val out = DuplicationDetection.findDuplicates(spark, df).collect()
    assert(out.map(_.rowKey).toSet == Set("a", "b")) // t2 record alone -> no cluster
    assert(out.find(_.status == "R").get.rowKey == "b")
    assert(out.find(_.rowKey == "a").get.status == "D2") // different druid
  }

  test("incremental detection ≡ full recompute under edits, moves, adds, deletes") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    def mk(rows: Seq[(String, String, String, String)]) =
      rows.map { case (rk, taxon, lat, lon) =>
        (rk, taxon, "2000", "01", "02", lat, lon,
          null: String, null: String, null: String, "dr1")
      }.toDF("rowKey", "taxonGuid", "year", "month", "day", "lat", "lon",
        "collector", "recordNumber", "catalogueNumber", "druid")
    // v0: taxa t1..t20, 5 records each, clusters inside several taxa
    val v0rows = (1 to 20).flatMap { t =>
      (1 to 5).map { i =>
        val dup = i <= 2 // two records share coordinates -> cluster
        (s"r$t-$i", s"t$t",
          if (dup) s"-35.$t" else s"-3$i.$t",
          if (dup) s"149.$t" else s"14$i.$t")
      }
    }
    val v0 = mk(v0rows)
    val prev = DuplicationDetection.findDuplicates(spark, v0)
    // v1: edit coords in t3 (breaks its cluster), move r5-1 from t5 to t6
    // (old AND new taxon affected), add a new duplicate into t7, delete
    // r9-2 (was in t9's cluster)
    val v1rows = v0rows.flatMap {
      case ("r3-2", t, _, _) => Seq(("r3-2", t, "-10.0", "10.0"))
      case ("r5-1", _, la, lo) => Seq(("r5-1", "t6", la, lo))
      case ("r9-2", _, _, _) => Seq.empty
      case r => Seq(r)
    } :+ (("r7-9", "t7", "-35.7", "149.7"))
    val v1 = mk(v1rows)
    val changed = Seq("r3-2", "r5-1", "r7-9", "r9-2").toDF("rowKey")
    val inc = DuplicationDetection
      .findDuplicatesIncremental(spark, v1, changed, prev).collect()
    val full = DuplicationDetection.findDuplicates(spark, v1).collect()
    assert(inc.map(r => (r.rowKey, r.clusterId, r.status)).sortBy(_._1).toSeq ==
      full.map(r => (r.rowKey, r.clusterId, r.status)).sortBy(_._1).toSeq)
    // and the splice really did keep untouched taxa from prev: the fresh
    // recompute only covered touched taxa
    val touchedTaxa = Set("t3", "t5", "t6", "t7", "t9")
    val keptPart = inc.filterNot(r => touchedTaxa(r.taxonGuid))
      .map(r => (r.rowKey, r.clusterId)).toSet
    val prevPart = prev.collect().filterNot(r => touchedTaxa(r.taxonGuid))
      .map(r => (r.rowKey, r.clusterId)).toSet
    assert(keptPart == prevPart)
  }
}
