package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("repeated passage is cut from later docs, first occurrence survives") {
    val passage = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"intro words $passage closing remarks"),
      (2L, s"other opening $passage and a tail here"),
      (3L, "totally unrelated body of fresh text")).toDF("id", "text")
    val out = Curation.dedupExactSubstrings(docs, "id", "text", 8)
      .orderBy("id").as[(Long, String, Long, Long)].collect()
    assert(out(0)._2 == s"intro words $passage closing remarks")
    assert(out(0)._4 == out(0)._3) // nothing removed from the first doc
    assert(out(1)._2 == "other opening and a tail here")
    assert(out(1)._3 == 14L && out(1)._4 == 6L)
    assert(out(2)._2 == "totally unrelated body of fresh text")
  }

  test("overlapping duplicate windows merge into one span") {
    // doc 2 repeats a 9-token passage → two overlapping flagged windows
    // (positions 0..7 and 1..8) must union to cutting tokens 0..8
    val p9 = "a b c d e f g h i"
    val docs = Seq((1L, s"$p9 unique1"), (2L, s"$p9 unique2"))
      .toDF("id", "text")
    val out = Curation.dedupExactSubstrings(docs, "id", "text", 8)
      .orderBy("id").as[(Long, String, Long, Long)].collect()
    assert(out(0)._2 == s"$p9 unique1")
    assert(out(1)._2 == "unique2")
    assert(out(1)._4 == 1L)
  }

  test("corpus with no repeated windows is unchanged") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      .toDF("id", "text")
    val out = Curation.dedupExactSubstrings(docs, "id", "text", 8)
    assert(out.filter(col("n_tokens_in") =!= col("n_tokens_kept")).isEmpty)
  }
}
