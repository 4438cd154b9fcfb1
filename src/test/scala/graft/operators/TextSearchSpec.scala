package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TextSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark engine"),     // tf(spark)=3, short
    (2L, "spark is one word among very many other words in a long doc " +
      "that keeps going and going and going for quite a while longer"),
    (3L, "nothing relevant here at all"),
    (4L, "rareword appears once")
  ).toDF("doc_id", "text")

  test("only docs containing a query term are returned") {
    val got = TextSearch.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("higher tf and shorter docs score higher; rarer terms carry more idf") {
    val spark_ = TextSearch.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .as[(Long, Double)].collect().toMap
    // doc 1: tf=3 in 4 words beats doc 2: tf=1 in a long doc
    assert(spark_(1L) > spark_(2L))
    // rareword (df=1) outscores spark (df=2) at tf=1
    val rare = TextSearch.bm25Scores(docs, "doc_id", "text", Seq("rareword"))
      .as[(Long, Double)].collect().toMap
    assert(rare(4L) > spark_(2L))
  }

  test("multi-term scores are the sum of per-term scores") {
    val multi = TextSearch.bm25Scores(docs, "doc_id", "text",
      Seq("spark", "engine")).as[(Long, Double)].collect().toMap
    val s1 = TextSearch.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .as[(Long, Double)].collect().toMap
    val s2 = TextSearch.bm25Scores(docs, "doc_id", "text", Seq("engine"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(multi(1L) - (s1(1L) + s2(1L))) < 1e-3)
  }

  test("tfIdfTopTerms ranks rare terms above common ones, k-bounded") {
    val got = TextSearch.tfIdfTopTerms(docs, "doc_id", "text", topK = 2)
      .select("doc", "term", "rk")
      .as[(Long, String, Int)].collect()
    assert(got.count(_._1 == 1L) == 2)
    // doc 1: "spark" tf=3 dominates even though df=2; "engine" (df=1) next
    val d1 = got.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq
    assert(d1 == Seq("spark", "engine"))
    // every doc has at most topK rows, ranks are 1..k
    assert(got.groupBy(_._1).values.forall(rows =>
      rows.length <= 2 && rows.map(_._3).sorted.sameElements(1 to rows.length)))
  }

  test("tfIdfTopTerms matches a hand-computed score") {
    val two = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextSearch.tfIdfTopTerms(two, "doc_id", "text", topK = 3)
      .select("doc", "term", "tfidf")
      .as[(Long, String, Double)].collect()
      .map { case (d, t, v) => (d, t) -> v }.toMap
    def idf(df: Double) = math.log((1.0 + 2.0) / (1.0 + df)) + 1.0
    assert(math.abs(got((1L, "a")) - 2.0 * idf(1)) < 1e-4)
    assert(math.abs(got((1L, "b")) - 1.0 * idf(2)) < 1e-4)
    assert(math.abs(got((2L, "c")) - 1.0 * idf(1)) < 1e-4)
  }
}
