package graft.operators

import graft.SparkTestSession
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
}
