package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-9 hardening: iterative union-find under adversarial chains at the
  * driver-tail bounds, SCC loud non-convergence, and label propagation
  * over non-numeric node ids. */
class Round9Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ufFind survives a 1M-element adversarial parent chain (the " +
    "maxLocalEdges bound) and fully compresses the path") {
    val n = 1000000
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    // worst case a recursive find could meet at the driver-tail bound:
    // one chain 0 -> 1 -> ... -> n, find(0) must not blow the stack
    var i = 0L
    while (i < n) { parent(i) = i + 1; i += 1 }
    parent(n.toLong) = n.toLong
    assert(Graphs.ufFind(parent, 0L) == n.toLong)
    // two-pass compression: every chain member now points at the root
    assert(parent(0L) == n.toLong && parent(n / 2L) == n.toLong)
    // and a later find is O(1)
    assert(Graphs.ufFind(parent, 1L) == n.toLong)
  }

  test("boruvkaMsf: driver Kruskal tail on a long path (deep union-find " +
    "chains) equals the distributed answer") {
    val m = 3000
    val edges = (0L until m).map(i => (i, i + 1, 1.0 + (i % 7))).toDF("src", "dst", "w")
    // path graph: the MSF is the whole path, one component
    val local = Graphs.boruvkaMsf(edges, maxLocalEdges = 10000000L)
    val dist = Graphs.boruvkaMsf(edges, maxLocalEdges = 0L, maxLocalMerge = 0L)
    assert(local.count() == m && dist.count() == m)
    assert(local.select("component").distinct().as[Long].collect().toSeq == Seq(0L))
    val lw = local.agg(sum("w")).head().getDouble(0)
    val dw = dist.agg(sum("w")).head().getDouble(0)
    assert(math.abs(lw - dw) < 1e-9)
  }

  test("scc: round budget is adaptive — a graph deeper than " +
    "maxPropRounds converges within the 16x hard cap; only a diameter " +
    "beyond the cap fails loudly") {
    // string ids force the distributed Orzan path; a 6-cycle needs ~6
    // forward rounds for the min id to wrap around — more than the
    // caller's budget of 2, within its 16x headroom (round 10: one extra
    // hop costs one extra barrier, not a caller retry)
    val cyc = (0 until 6).map(i => (s"n$i", s"n${(i + 1) % 6}")).toDF("src", "dst")
    val ok = Graphs.stronglyConnectedComponents(cyc, maxPropRounds = 2)
      .as[(String, String)].collect().toMap
    assert(ok.size == 6 && ok.values.toSet == Set("n0"))
    // a diameter beyond the hard cap still fails loudly rather than
    // silently splitting the SCC: 40-cycle vs cap 16x1
    val deep = (0 until 40).map(i => (s"n$i", s"n${(i + 1) % 40}"))
      .toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graphs.stronglyConnectedComponents(deep, maxPropRounds = 1).count()
    }
    assert(ex.getMessage.contains("fixpoint"))
  }

  test("scc: a >40-diameter cycle converges with DEFAULT parameters — " +
    "no caller tuning (round-10 adaptive budget)") {
    val n = 41 // one past the old maxPropRounds=40 hard wall
    val cyc = (0 until n).map(i => (s"v${"%02d".format(i)}",
      s"v${"%02d".format((i + 1) % n)}")).toDF("src", "dst")
    val got = Graphs.stronglyConnectedComponents(cyc)
      .as[(String, String)].collect().toMap
    assert(got.size == n && got.values.toSet == Set("v00"))
  }

  test("labelPropagation: string node ids settle per-clique on the " +
    "lexicographically smallest label (no arithmetic-negation cast)") {
    val k1 = Seq("apple", "berry", "cherry")
    val k2 = Seq("xray", "yam", "zeta")
    def clique(vs: Seq[String]) =
      for (a <- vs; b <- vs if a < b) yield (a, b)
    val e = (clique(k1) ++ clique(k2)).toDF("src", "dst")
    val got = Graphs.labelPropagation(e, rounds = 4)
      .as[(String, String)].collect().toMap
    assert(got.filter(_._1.head <= 'c').values.toSet == Set("apple"))
    assert(got.filter(_._1.head >= 'x').values.toSet == Set("xray"))
  }

  test("editDistanceSelfJoin ≡ naive within-block scan on random strings " +
    "(substitutions, insertions, deletions, cross-block separation)") {
    // deterministic corpus: base words plus planted 1-2-edit variants,
    // including INDELS (the case naive segment blocking misses)
    val base = Seq("kangaroo", "wallabye", "platypus", "echidnaz",
      "wombatty", "dingodog")
    val rows = base.zipWithIndex.flatMap { case (w, i) =>
      val blk = i % 2
      Seq(
        (i * 10L + 0, blk, w),
        (i * 10L + 1, blk, w.updated(2, 'x')),                    // 1 sub
        (i * 10L + 2, blk, w.substring(1)),                       // 1 del
        (i * 10L + 3, blk, "q" + w),                              // 1 ins
        (i * 10L + 4, blk, w.updated(1, 'y').updated(5, 'z')),    // 2 subs
        (i * 10L + 5, (blk + 1) % 2, w))                          // other block
    }
    val df = rows.toDF("id", "blk", "name")
    val fast = RecordLinkage
      .editDistanceSelfJoin(df, "id", "name", tau = 2, Seq("blk"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val naive = (for {
      (ia, ba, na) <- rows; (ib, bb, nb) <- rows
      if ia < ib && ba == bb &&
        graft.functions.HashKernels.levenshteinWithin(na, nb, 2)
    } yield (ia, ib)).toSet
    assert(fast == naive, s"missing=${naive -- fast} extra=${fast -- naive}")
    assert(naive.nonEmpty)
    // the cost-chooser's two paths are row-identical on the same input
    val naivePath = RecordLinkage.blockedEditDistancePairs(df, "id",
      "name", 2, Seq("blk"), maxNaiveBlock = 1000000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val deletePath = RecordLinkage.blockedEditDistancePairs(df, "id",
      "name", 2, Seq("blk"), maxNaiveBlock = 0L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(naivePath == naive && deletePath == naive)
  }

  test("jaroWinklerPairs: lossless sorted-variant candidates ≡ the " +
    "within-block scan (substitutions, transpositions, near-threshold)") {
    graft.plans.GraftFunctions.register(spark)
    // uniform length 10, planted high-JW variants: transposition (equal
    // multisets), single substitution (m = 9 — right at the bound), and
    // unrelated strings below the threshold
    val base = Seq("kookaburra", "bandicoota", "cassowarie", "perenties",
      "quokkaquol").map(_.take(10).padTo(10, 'x'))
    val rows = base.zipWithIndex.flatMap { case (w, i) =>
      val blk = i % 2
      val tr = (w.substring(0, 3) + w(4) + w(3) + w.substring(5)).take(10)
      Seq(
        (i * 10L + 0, blk, w),
        (i * 10L + 1, blk, tr),                   // adjacent transposition
        (i * 10L + 2, blk, w.updated(7, 'z')),    // tail substitution
        (i * 10L + 3, blk, w.reverse),            // same multiset, low JW
        (i * 10L + 4, (blk + 1) % 2, w))          // other block
    }
    val df = rows.toDF("id", "blk", "name")
    def run(naiveMax: Long) = RecordLinkage.jaroWinklerPairs(
        df, "id", "name", threshold = 0.96, Seq("blk"),
        maxNaiveBlock = naiveMax)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val naive = run(1000000L)
    val fast = run(0L)
    assert(fast == naive, s"missing=${naive -- fast} extra=${fast -- naive}")
    assert(naive.nonEmpty)
    // sanity: the scan agrees with a driver-side JW filter
    import org.apache.spark.sql.functions.{col, round => rnd}
    val ref = (for {
      (ia, ba, na) <- rows; (ib, bb, nb) <- rows
      if ia < ib && ba == bb
    } yield ((ia, ib), (na, nb))).toMap
    val refPairs = df.sparkSession.createDataFrame(
        ref.toSeq.map { case ((ia, ib), (na, nb)) => (ia, ib, na, nb) })
      .toDF("ia", "ib", "na", "nb")
      .filter(rnd(graft.plans.GraftFunctions.jaro_winkler(
        col("na"), col("nb")), 6) >= 0.96)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(naive == refPairs)
  }

  test("labelPropagation: numeric ids keep the old max-count/min-label " +
    "semantics (q222 oracle unchanged)") {
    // two bridged triangles, same fixture family as the hand trace
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)).toDF("src", "dst")
    val got = Graphs.labelPropagation(e, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // every node ends with a label drawn from the graph; deterministic
    val again = Graphs.labelPropagation(e, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == again && got.size == 6)
    assert(got.values.toSet.subsetOf(Set(1L, 2L, 3L, 4L, 5L, 6L)))
  }
}
