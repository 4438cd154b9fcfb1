package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SentenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def statsOf(text: String): (Long, Double, Long) =
    Seq(Tuple1(text)).toDF("text")
      .select(TextFunctions.sentences(col("text")).as("ss"))
      .select(TextFunctions.sentenceStatsOfSentences(col("ss")).as("st"))
      .select("st.n_sentences", "st.mean_words", "st.max_words")
      .as[(Long, Double, Long)].head()

  test("splits on terminal punctuation runs") {
    val got = Seq(Tuple1("One two. Three four five! Six?? Seven."))
      .toDF("text")
      .select(TextFunctions.sentences(col("text")).as("ss"))
      .as[Seq[String]].head()
    assert(got == Seq("One two", "Three four five", "Six", "Seven"))
  }

  test("stats: count, mean and max words") {
    val (n, mean, max) = statsOf("One two. Three four five! Six?? Seven.")
    assert(n == 4L)
    assert(math.abs(mean - (2 + 3 + 1 + 1) / 4.0) < 1e-9)
    assert(max == 3L)
  }

  test("unpunctuated text is one sentence; empty text is zero") {
    assert(statsOf("no terminal punctuation here") == ((1L, 4.0, 4L)))
    assert(statsOf("") == ((0L, 0.0, 0L)))
    assert(statsOf("   ") == ((0L, 0.0, 0L)))
  }

  test("punctuation mid-token does not split (no whitespace after)") {
    val (n, _, _) = statsOf("version 1.2.3 shipped. done.")
    assert(n == 2L)
  }
}
