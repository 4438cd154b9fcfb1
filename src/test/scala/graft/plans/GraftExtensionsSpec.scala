package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cosine_sim native expression matches kernel, usable from SQL") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT round(cosine_sim(a, b), 6) AS c FROM vecs")
      .as[Double].collect()
    assert(out(0) == 1.0 && out(1) == 0.0 && out(2) == 1.0)
    // Column API form
    val viaCol = df.select(GraftFunctions.cosine_sim($"a", $"b")).as[Double].collect()
    assert(math.abs(viaCol(2) - 1.0) < 1e-9)
  }

  test("hamming64 native expression") {
    GraftFunctions.register(spark)
    val out = spark.sql("SELECT hamming64(CAST(7 AS BIGINT), CAST(0 AS BIGINT))")
      .as[Int].head()
    assert(out == 3)
  }

  test("nfc_normalize composes combining sequences; codegen survives") {
    GraftFunctions.register(spark)
    // "é" as e + COMBINING ACUTE vs precomposed U+00E9
    val decomposed = "cafe\u0301"
    val composed = "caf\u00e9"
    val df = Seq((1L, decomposed), (2L, composed)).toDF("id", "s")
    val out = df.select($"id", GraftFunctions.nfc_normalize($"s").as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == composed && out(2L) == composed)
    // the dedup motivation: distinct codepoints, identical fingerprint
    val fps = df.select(xxhash64(GraftFunctions.nfc_normalize($"s")))
      .as[Long].collect()
    assert(fps(0) == fps(1))
    assert(decomposed != composed) // raw strings differ
  }

  test("strip_accents folds diacritics, from SQL too") {
    GraftFunctions.register(spark)
    Seq(("Łódź crème brûlée ÀÉÎÕÜ ñ"))
      .toDF("s").createOrReplaceTempView("acc")
    val out = spark.sql("SELECT strip_accents(s) FROM acc").as[String].head()
    // Ł has no combining mark decomposition (it survives); the rest fold
    assert(out == "Łodz creme brulee AEIOU n")
  }

  test("type mismatch is an analysis error") {
    GraftFunctions.register(spark)
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("ints")
    intercept[Exception] {
      spark.sql("SELECT cosine_sim(a, b) FROM ints").collect()
    }
  }
}
