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

  test("zipfFit recovers an exact power law") {
    // counts c(r) = 1000 / r for ranks 1..8 → slope −1, R² = 1 exactly
    val docs = (1 to 8).flatMap { r =>
      Seq.fill(1000 / r)(s"w$r")
    }.map(w => Tuple1(w)).toDF("text") // one word per row = one token each
    val got = CorpusStats.zipfFit(docs, "text", topN = 8)
      .as[(Long, Double, Double, Double)].head()
    val (n, slope, intercept, r2) = got
    assert(n == 8L)
    // counts are floor(1000/r) so the fit is near −1, not exact
    assert(math.abs(slope + 1.0) < 0.01, s"slope $slope")
    assert(math.abs(intercept - math.log(1000.0)) < 0.02)
    assert(r2 > 0.9999)
  }

  test("zipfFit rank ties break lexically (deterministic)") {
    val docs = Seq("b b a a c").map(Tuple1(_)).toDF("text")
    // a and b tie at 2; ranks must be a=1, b=2, c=3 on any engine
    val got = CorpusStats.zipfFit(docs, "text", topN = 3)
      .as[(Long, Double, Double, Double)].head()
    assert(got._1 == 3L)
    // slope of ln(2,2,1) vs ln(1,2,3) — just assert it computed finitely
    assert(!got._2.isNaN && got._2 < 0)
  }
}
