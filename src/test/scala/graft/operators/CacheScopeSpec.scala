package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Storage discipline: a scoped pipeline run must leave the session's
  * persistent-RDD map exactly as it found it — the round-9 answer to the
  * "48 persists vs 7 unpersists" leak a long-lived serving JVM would
  * otherwise accumulate. */
class CacheScopeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("curateCorpusScoped releases every persist the run created, " +
    "nested operators' included") {
    val docs = (1L to 30L).map { i =>
      val body =
        if (i % 3 == 0)
          "the quick brown fox jumps over the lazy dog again and again"
        else
          s"document number $i carries its own distinct content payload " +
            s"with words ${i * 7} and ${i * 13} inside the body"
      (i, body, 100L - i)
    }.toDF("doc_id", "text", "quality")
    val bench = Seq((999L, "benchmark only content that matches nothing"))
      .toDF("doc_id", "text")
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    val before = sc.getPersistentRDDs.keySet
    var during: Set[Int] = Set.empty
    val n = Curation.curateCorpusScoped(docs, bench, "doc_id", "text",
      "quality", minQuality = 0L) { out =>
      val cnt = out.count()
      during = sc.getPersistentRDDs.keySet.toSet -- before
      cnt
    }
    assert(n > 0)
    // the pipeline genuinely persists (exact table, kept set, LSH shingle
    // cache, components checkpoints) — the scope must see them alive...
    assert(during.nonEmpty, "pipeline created no persists — spec is stale")
    // ...and release every one of them on exit
    val leaked = during.intersect(sc.getPersistentRDDs.keySet.toSet)
    assert(leaked.isEmpty, s"scope leaked persistent RDDs: $leaked")
  }

  test("scoped releases persists even when `use` throws") {
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    val before = sc.getPersistentRDDs.keySet
    val ex = intercept[RuntimeException] {
      CacheScope.scoped(spark) {
        val df = (1 to 10).toDF("x")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count()
        df
      } { _ => throw new RuntimeException("caller failure") }
    }
    assert(ex.getMessage == "caller failure")
    assert((sc.getPersistentRDDs.keySet.toSet -- before).isEmpty)
  }
}
