package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
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

  // every heavy Dedup/Similarity/RecordLinkage entry point's scoped
  // variant must (a) produce rows and (b) leave zero leaked RDDs —
  // the round-10 extension of the curateCorpusScoped discipline
  test("scoped variants of the persist-heavy operators leak nothing") {
    val sc = spark.sparkContext
    val docs = (1L to 40L).map { i =>
      val text =
        if (i % 2 == 0) s"shared near duplicate content block ${i / 2} " * 4
        else s"unique text $i with words ${i * 3} ${i * 5} ${i * 7} " * 3
      (i, text)
    }.toDF("doc_id", "text")
    val emb = (1L to 60L).map { i =>
      (i, Array.tabulate(8)(j =>
        (math.sin(i * 0.37 + j) + (if (i % 5 == 0) 0.0 else i * 0.01))
          .toFloat))
    }.toDF("vec_id", "embedding")
    val names = (1L to 50L).map(i =>
      (i, (i % 4).toInt, s"name${i % 9}x")).toDF("id", "blk", "nm")
    val queries = emb.limit(3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

    def assertScoped[T](label: String)(run: (org.apache.spark.sql.DataFrame => Long) => Long): Unit = {
      spark.catalog.clearCache()
      val before = sc.getPersistentRDDs.keySet
      val n = run(_.count())
      assert(n >= 0, label)
      val leaked = sc.getPersistentRDDs.keySet.toSet -- before
      assert(leaked.isEmpty, s"$label leaked RDDs: $leaked")
    }

    assertScoped("minhashLshPairsScoped")(use =>
      Dedup.minhashLshPairsScoped(docs, "doc_id", "text",
        jaccardThreshold = 0.5)(use))
    assertScoped("dedupClustersScoped")(use =>
      Dedup.dedupClustersScoped(docs, "doc_id", "text", n = 8,
        threshold = 0.5)(use))
    assertScoped("semanticDedupScoped")(use =>
      Dedup.semanticDedupScoped(emb, "vec_id", "embedding", numCells = 2,
        threshold = 0.9)(use))
    assertScoped("batchIvfTopKScoped")(use =>
      Similarity.batchIvfTopKScoped(emb, queries, k = 3, numCells = 2,
        nprobe = 2)(use))
    assertScoped("editDistanceSelfJoinScoped")(use =>
      RecordLinkage.editDistanceSelfJoinScoped(names, "id", "nm", 1,
        Seq("blk"))(use))
    assertScoped("jaroWinklerPairsScoped")(use =>
      RecordLinkage.jaroWinklerPairsScoped(names, "id", "nm", 0.96,
        Seq("blk"), maxNaiveBlock = 1L)(use))
  }

  // round-11: the PLAIN linkage entry points self-release their internal
  // `rows` persist on the first action that drives the result (observe
  // marker + one-shot QueryExecutionListener) — no CacheScope bracket
  // needed, no storage accumulates in a long-lived JVM. The release is
  // listener-bus-async, so the assertion polls.
  test("plain linkage entry points release their persist on first " +
    "materialization") {
    val sc = spark.sparkContext

    def awaitRelease(label: String,
        before: scala.collection.Set[Int]): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      var leaked = sc.getPersistentRDDs.keySet.toSet -- before
      while (leaked.nonEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
        leaked = sc.getPersistentRDDs.keySet.toSet -- before
      }
      assert(leaked.isEmpty, s"$label leaked persistent RDDs: $leaked")
    }

    // 9-char uniform names: editDistance always takes the candidate
    // skeleton; JW at 0.99 hits the delta=0 sorted-equality branch of
    // the same skeleton — both paths create the internal persist
    val names = (1L to 60L).map(i =>
      (i, (i % 4).toInt, s"nm${i % 9}xyzpad")).toDF("id", "blk", "nm")

    spark.catalog.clearCache()
    val before1 = sc.getPersistentRDDs.keySet
    val ed = RecordLinkage.editDistanceSelfJoin(
      names, "id", "nm", 1, Seq("blk"))
    assert(ed.count() >= 0)
    awaitRelease("editDistanceSelfJoin", before1)

    val before2 = sc.getPersistentRDDs.keySet
    val jw = RecordLinkage.jaroWinklerPairs(
      names, "id", "nm", 0.99, Seq("blk"))
    assert(jw.count() >= 0)
    awaitRelease("jaroWinklerPairs", before2)
  }

  // round-12: the remaining footgun of the self-releasing form — a
  // SECOND materialization recomputes the released internals cold —
  // is loud now: exactly one WARN through the (spec-swappable) sink,
  // then the listener detaches so a third run stays silent.
  test("recompute after self-release warns exactly once") {
    val warns = new java.util.concurrent.atomic.AtomicInteger(0)
    val oldSink = CacheScope.recomputeWarnSink
    CacheScope.recomputeWarnSink = _ => warns.incrementAndGet()
    try {
      import spark.implicits._
      val cached = (1 to 100).toDF("x")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val result = CacheScope.releaseOnFirstMaterialization(
        cached.filter(col("x") % 2 === 0), Seq(cached))
      // listener bus is async: after each action, poll for the state
      // transition it must cause before driving the next one
      def await(label: String)(done: => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 15000
        while (!done && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        assert(done, s"timed out waiting for $label")
      }
      result.count() // 1st: releases the cache, no warn
      await("release")(
        cached.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      assert(warns.get() == 0, "first materialization must not warn")
      result.count() // 2nd: recompute — exactly one warn
      await("recompute warn")(warns.get() >= 1)
      assert(warns.get() == 1,
        s"second materialization must warn once, saw ${warns.get()}")
      result.count() // 3rd: listener detached — still exactly one
      Thread.sleep(500) // nothing to poll for: absence of a 2nd warn
      assert(warns.get() == 1,
        s"warn must be one-shot, saw ${warns.get()}")
    } finally CacheScope.recomputeWarnSink = oldSink
  }
}
