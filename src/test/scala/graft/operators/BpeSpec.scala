package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the classic corpus from Sennrich et al. 2016 §3.2
  private def toyCounts = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
  ).toDF("word", "cnt")

  test("train reproduces the published toy-example merge sequence") {
    val merges = Bpe.train(toyCounts, 5)
    // pair counts: (e,s)=9 from newest+widest, then (es,t)=9, (est,</w>)=9,
    // then (l,o)=7, (lo,w)=7 — ties broken (count desc, left, right)
    val got = merges.map(m => (m.left, m.right))
    assert(got == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3, 4))
  }

  test("local and distributed training paths agree exactly") {
    val local = Bpe.train(toyCounts, 8) // under threshold → driver loop
    val dist = Bpe.train(toyCounts, 8, localThreshold = 0L)
    assert(local == dist)
  }

  test("train stops early when no pair remains") {
    val merges = Bpe.train(Seq(("ab", 3L)).toDF("word", "cnt"), 10)
    // a+b, ab+</w> — then the word is one symbol and training must stop
    assert(merges.size == 2)
  }

  test("encodeWord applies merges in rank order") {
    val ranks = Bpe.train(toyCounts, 5)
      .map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.encodeWord("newest", ranks) ==
      Seq("n", "e", "w", "est</w>"))
    assert(Bpe.encodeWord("low", ranks) == Seq("low", "</w>"))
    // unseen word degrades to characters + whatever merges apply
    assert(Bpe.encodeWord("west", ranks) == Seq("w", "est</w>"))
  }

  test("encoding always reconstructs the word") {
    val ranks = Bpe.train(toyCounts, 5)
      .map(m => (m.left, m.right) -> m.rank).toMap
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "news")) {
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString.stripSuffix(Bpe.EndOfWord) == w)
    }
  }

  test("encodeVocab tokenises the corpus vocabulary distributively") {
    val merges = Bpe.train(toyCounts, 5)
    val enc = Bpe.encodeVocab(toyCounts, merges)
      .as[(String, Long, Seq[String])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(enc("newest") == Seq("n", "e", "w", "est</w>"))
    assert(enc("low") == Seq("low", "</w>"))
  }

  test("wordCounts lowercases, trims, and drops empty tokens") {
    val wc = Bpe.wordCounts(
        Seq("  The the  THE ", "a b").toDF("text"), "text")
      .as[(String, Long)].collect().toMap
    assert(wc == Map("the" -> 3L, "a" -> 1L, "b" -> 1L))
  }
}
