package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String =
    new java.io.File(sys.props("java.io.tmpdir"), name).getAbsolutePath

  test("jsonl roundtrip preserves newlines, quotes, unicode, and nulls") {
    val rows = Seq(
      (1L, "line one\nline two", "en"),
      (2L, "quote \" and backslash \\ and tab\t", "en"),
      (3L, "unicode é中𝄞", "zh"),
      (4L, null.asInstanceOf[String], "es"))
    val src = rows.toDF("id", "text", "lang")
    val path = tmp("graft_corpusio_jsonl")
    CorpusIO.writeJsonl(src, path)
    val back = CorpusIO.readJsonl(spark, path, src.schema)
    assert(back.count() == 4)
    // JSON escapes the embedded newline, so each row stays one physical line
    val got = back.orderBy("id").as[(Long, String, String)].collect()
    val want = rows.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("jsonl gzip compression writes .gz shards that read back whole") {
    val src = (1L to 50L).map(i => (i, s"doc $i")).toDF("id", "text")
    val path = tmp("graft_corpusio_jsonl_gz")
    CorpusIO.writeJsonl(src, path, compression = "gzip")
    val shards = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(shards.nonEmpty)
    assert(CorpusIO.readJsonl(spark, path, src.schema).count() == 50)
  }

  test("orc roundtrip is value-exact and column-prunable") {
    val src = Seq((1L, "A", 1.5), (2L, "B", 2.25), (3L, "A", -0.75))
      .toDF("k", "flag", "v")
    val path = tmp("graft_corpusio_orc")
    CorpusIO.writeOrc(src, path)
    val back = CorpusIO.readOrc(spark, path)
    assert(back.orderBy("k").collect().toSeq ==
      src.orderBy("k").collect().toSeq)
    // projection reaches the ORC scan (column pruning)
    val pruned = back.select("flag")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<flag:string>"),
      s"expected pruned ReadSchema in:\n$scan")
  }
}
