package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dedupParagraphs keeps first occurrence and reassembles in order") {
    val docs = Seq(
      (1L, "alpha\n\nBOILER\n\nbeta"),
      (2L, "BOILER\n\ngamma"),
      (3L, "alpha\n\nBOILER"),
      (4L, "delta")).toDF("id", "text")
    val out = Curation.dedupParagraphs(docs, "id", "text")
      .orderBy("id").as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "alpha\n\nBOILER\n\nbeta", 3L, 3L)))
    assert(out(1) == ((2L, "gamma", 2L, 1L)))
    assert(out(2) == ((3L, "", 2L, 0L)))
    assert(out(3) == ((4L, "delta", 1L, 1L)))
  }

  test("dedupParagraphs leaves a duplicate-free corpus untouched") {
    val docs = Seq((1L, "a\n\nb"), (2L, "c"), (3L, "d\n\ne\n\nf"))
      .toDF("id", "text")
    val out = Curation.dedupParagraphs(docs, "id", "text")
    assert(out.filter(col("n_paras_in") =!= col("n_paras_kept")).isEmpty)
    val texts = out.orderBy("id").select("text").as[String].collect()
    assert(texts.sameElements(Array("a\n\nb", "c", "d\n\ne\n\nf")))
  }

  test("temperatureSample: alpha=1 keeps everything, alpha<1 lifts the tail") {
    val docs = (0L until 2000L)
      .map(i => (i, if (i % 10 == 0) "rare" else "common"))
      .toDF("id", "cls")
    // alpha = 1 → shares are the natural proportions → rates all 1
    assert(Curation.temperatureSample(docs, "id", "cls", "s", 1.0)
      .count() == 2000L)
    val sampled = Curation.temperatureSample(docs, "id", "cls", "s", 0.5)
      .groupBy("cls").count().as[(String, Long)].collect().toMap
    // rare keeps everything (it is the binding class); common is cut to
    // sqrt-proportional share: common/rare = sqrt(1800/200) = 3 → 600 ± md5 noise
    assert(sampled("rare") == 200L)
    assert(sampled("common") > 480L && sampled("common") < 720L,
      s"common=${sampled("common")}")
    // deterministic: re-run identical
    val again = Curation.temperatureSample(docs, "id", "cls", "s", 0.5)
      .groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(again == sampled)
  }

  test("decontaminateBloom is row-identical to exact decontaminate") {
    val corpus = (0L until 300L).map { i =>
      (i, if (i % 17 == 0) s"the quick brown fox jumps over lazy dog $i"
          else s"corpus document body number $i with filler words here")
    }.toDF("id", "text")
    val bench = Seq((9000L, "quick brown fox jumps over lazy"),
      (9001L, "totally unrelated benchmark prompt text")).toDF("id", "text")
    val exact = Curation.decontaminate(corpus, bench, "id", "text", n = 5)
      .select("id", "contaminated")
    val bloom = Curation.decontaminateBloom(corpus, bench, "id", "text",
      n = 5).select("id", "contaminated")
    assert(exact.except(bloom).isEmpty && bloom.except(exact).isEmpty)
    // and it actually flags the planted rows
    assert(bloom.filter(col("contaminated")).count() ==
      (0L until 300L).count(_ % 17 == 0))
  }
}
