package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val goodText =
    "the quick brown fox jumps over the lazy dog and then runs far away " +
      "to find more food for the winter season ahead of the storm"

  test("curateCorpus composes gate, dedup, decontamination, and split") {
    val docs = Seq(
      (1L, goodText),                      // survives
      (2L, goodText),                      // exact dup of 1 → dropped
      (3L, "too short"),                   // fails word-count gate
      (4L, goodText + " unique extra trailing words here now"), // survives
      (5L, "zz zz zz zz")                  // fails gate
    ).toDF("doc_id", "text")
    val bench = Seq((100L, goodText)).toDF("doc_id", "text")

    val out = CorpusPipeline.curateCorpus(docs, bench, "doc_id", "text",
      CorpusPipeline.Config(minWords = 10))
    val rows = out.select("doc_id", "contaminated")
      .as[(Long, Boolean)].collect().toMap
    // 2 dropped as dup (min id 1 survives), 3/5 gated out
    assert(rows.keySet == Set(1L, 4L))
    // both share 8-grams with the benchmark text
    assert(rows(1L) && rows(4L))
    assert(out.columns.contains("split"))
  }

  test("contaminated docs are flagged, not dropped") {
    val docs = Seq((1L, goodText)).toDF("doc_id", "text")
    val bench = Seq((9L, "completely different benchmark content"))
      .toDF("doc_id", "text")
    val out = CorpusPipeline.curateCorpus(docs, bench, "doc_id", "text",
      CorpusPipeline.Config(minWords = 10))
    val r = out.select("doc_id", "contaminated")
      .as[(Long, Boolean)].collect().toSeq
    assert(r == Seq((1L, false)))
  }
}
