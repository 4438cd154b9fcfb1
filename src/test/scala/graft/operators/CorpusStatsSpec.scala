package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("klDrift is ~zero for identically-distributed slices") {
    val docs = Seq(
      ("a", "x y z x"), ("a", "x y z x"),
      ("b", "x y z x"), ("b", "x y z x")).toDF("src", "text")
    val kl = CorpusStats.klDrift(docs, "text", "src")
      .as[(String, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(kl.values.forall(v => math.abs(v) < 1e-6), kl.toString)
  }

  test("klDrift is positive and ranks the divergent slice higher") {
    val docs = Seq(
      ("same1", "x y z x y z"), ("same2", "x y z x y z"),
      ("diff", "q q q q q q")).toDF("src", "text")
    val kl = CorpusStats.klDrift(docs, "text", "src")
      .as[(String, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(kl("diff") > kl("same1"))
    assert(kl("diff") > 0.5)
  }

  test("klDrift token counts come back per slice") {
    val docs = Seq(("a", "one two"), ("b", "three")).toDF("src", "text")
    val n = CorpusStats.klDrift(docs, "text", "src")
      .as[(String, Double, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(n == Map("a" -> 2L, "b" -> 1L))
  }

  test("vocabCoverage computes exact OOV fractions") {
    // vocab k=1 → {"x"} (freq 3 beats 2); slice a: 3 of 4 covered
    val docs = Seq(("a", "x x y x"), ("b", "y")).toDF("src", "text")
    val got = CorpusStats.vocabCoverage(docs, "text", "src", 1)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((4L, 3L, 0.75)))
    assert(got("b") == ((1L, 0L, 0.0)))
  }

  test("vocabCoverage ties in the vocab cutoff break lexically") {
    // k=1 with equal counts: "a" and "b" both freq 2 → "a" enters
    val docs = Seq(("s", "a b a b")).toDF("src", "text")
    val got = CorpusStats.vocabCoverage(docs, "text", "src", 1)
      .as[(String, Long, Long, Double)].collect().head
    assert(got == (("s", 4L, 2L, 0.5)))
  }

  test("invertedIndex df cutoff and sorted postings") {
    val docs = Seq(
      (3L, "common rare3"), (1L, "common alpha"), (2L, "common alpha"))
      .toDF("doc_id", "text")
    val idx = TextSearch.invertedIndex(docs, "doc_id", "text", 2L)
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!idx.contains("common")) // df=3 > maxDf=2
    assert(idx("alpha") == ((2L, Seq(1L, 2L))))
    assert(idx("rare3") == ((1L, Seq(3L))))
  }

  test("invertedIndex counts each doc once per term") {
    val docs = Seq((7L, "dup dup dup")).toDF("doc_id", "text")
    val idx = TextSearch.invertedIndex(docs, "doc_id", "text", 10L)
      .as[(String, Long, Seq[Long])].collect()
    assert(idx.toSeq == Seq(("dup", 1L, Seq(7L))))
  }
}
