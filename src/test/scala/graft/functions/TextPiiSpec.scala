package graft.functions

import graft.SparkTestSession
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII detection/redaction and bigram extraction — the positive-match cases
  * the synthetic corpus (which contains no PII) cannot exercise. */
class TextPiiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  private def redacted(text: String): String =
    one(text).select(TF.redactPii(col("text"))).as[String].head()

  private def counts(text: String): (Int, Int, Int) =
    one(text).select(
      TF.emailCount(col("text")), TF.ipv4Count(col("text")),
      TF.phoneCount(col("text"))).as[(Int, Int, Int)].head()

  test("emails are counted and redacted") {
    assert(counts("mail alice.b+spam@example.co.uk now") == ((1, 0, 0)))
    assert(redacted("mail alice.b+spam@example.co.uk now") ==
      "mail <EMAIL> now")
  }

  test("ipv4 literals are counted and redacted") {
    assert(counts("from 10.0.0.1 to 192.168.255.254") == ((0, 2, 0)))
    assert(redacted("from 10.0.0.1 to 192.168.255.254") ==
      "from <IP> to <IP>")
  }

  test("international phone numbers are counted and redacted") {
    assert(counts("call +61 400 123 456 or +1-800-555-0199") == ((0, 0, 2)))
    assert(redacted("call +61 400 123 456 or +1-800-555-0199") ==
      "call <PHONE> or <PHONE>")
  }

  test("mixed PII in one text; plain text untouched") {
    val t = "a@b.io at 8.8.8.8, +44 7700 900123"
    assert(counts(t) == ((1, 1, 1)))
    assert(redacted(t) == "<EMAIL> at <IP>, <PHONE>")
    assert(redacted("no pii here, just words") ==
      "no pii here, just words")
  }

  test("non-matches stay non-matches") {
    // version strings are not IPs (word boundary needs all four octets),
    // bare local numbers without '+' are not phones
    assert(counts("v1.2.3 release, ring 0400123456") == ((0, 0, 0)))
  }

  test("wordBigrams yields adjacent lowercased pairs, empty below 2 tokens") {
    def bigrams(text: String): Seq[String] =
      one(text).select(split(lower(trim(col("text"))), "\\s+").as("ws"))
        .select(TF.wordBigrams(col("ws"))).as[Seq[String]].head()
    assert(bigrams("The quick Quick fox") ==
      Seq("the quick", "quick quick", "quick fox"))
    assert(bigrams("word").isEmpty)
    assert(bigrams("").isEmpty)
  }

  test("perplexityFilter keeps ~quantile fraction and all below threshold") {
    val docs = (0L until 200L).map { i =>
      // common words for most docs; rare-word docs get high NLL
      val text = if (i % 10 == 0) s"rare$i unique$i odd$i"
      else "the common words repeat here always"
      (i, text)
    }.toDF("doc_id", "text")
    val kept = graft.operators.Curation
      .perplexityFilter(docs, "doc_id", "text", 0.75)
    val rows = kept.select("doc_id", "nll", "nll_thr")
      .as[(Long, Double, Double)].collect()
    assert(rows.forall { case (_, nll, thr) => nll <= thr })
    // the 180 common docs share one low NLL — all kept; rare docs cut
    assert(rows.length == 180)
    assert(rows.forall(_._1 % 10 != 0))
  }
}
