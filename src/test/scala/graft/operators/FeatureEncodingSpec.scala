package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 feature encoders + link prediction: dictionary encode,
  * leave-one-out target encoding, Adamic–Adar — each against hand-traced
  * answers including the contractual edge cases (ties, OOV, singleton
  * categories, hub caps, known-edge exclusion).
  */
class FeatureEncodingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fitDictionary: frequency order, lexicographic ties, nulls excluded") {
    val df = Seq("b", "b", "a", "a", "c", null)
      .toDF("term0").select(col("term0").as("t"))
    val got = FeatureEncoding.fitDictionary(df, "t")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    // a and b tie at 2 -> a first; c last; null dropped
    assert(got.toSeq == Seq(("a", 0L, 2L), ("b", 1L, 2L), ("c", 2L, 1L)))
  }

  test("encodeWithDictionary: unseen terms take the default index") {
    val dict = FeatureEncoding.fitDictionary(
      Seq("x", "x", "y").toDF("t"), "t")
    val got = FeatureEncoding.encodeWithDictionary(
        Seq("x", "y", "zzz").toDF("t"), "t", dict, defaultIdx = 2L)
      .select("t", "idx").as[(String, Long)].collect().toSet
    assert(got == Set(("x", 0L), ("y", 1L), ("zzz", 2L)))
  }

  test("targetEncodeLoo: hand-computed smoothing; singleton with m=0 is null") {
    // cat A: targets 10, 20, 30 (sum 60); cat B: single 100
    // prior = 160/4 = 40; m = 2
    // A row y=10: ((60-10) + 2*40) / (3-1+2) = 130/4 = 32.5
    val df = Seq(("A", 10.0, 1), ("A", 20.0, 2), ("A", 30.0, 3),
      ("B", 100.0, 4)).toDF("cat", "y", "id")
    val got = FeatureEncoding.targetEncodeLoo(df, "cat", "y", m = 2.0)
      .select("id", "enc").as[(Int, Double)].collect().toMap
    assert(got(1) == 32.5 && got(2) == 30.0 && got(3) == 27.5)
    // B's single row: ((100-100) + 2*40) / (1-1+2) = 40 (the prior)
    assert(got(4) == 40.0)
    // m = 0: the singleton's denominator is 0 -> null, never fabricated
    val loo0 = FeatureEncoding.targetEncodeLoo(df, "cat", "y", m = 0.0)
      .filter(col("id") === 4).select("enc").collect()(0)
    assert(loo0.isNullAt(0))
  }

  test("adamicAdar: path graph hand trace, known edges excluded") {
    // path 1-2-3-4: candidate pairs are the 2-hop ones only: (1,3) via 2,
    // (2,4) via 3; both shared neighbours have degree 2 -> score 1/ln 2
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graphs.adamicAdar(e)
      .as[(Long, Long, Long, Double)].collect().toSet
    val s = BigDecimal(1.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Set((1L, 3L, 1L, s), (2L, 4L, 1L, s)))
  }

  private def kruskal(edges: Seq[(Long, Long, Double)])
      : Set[(Long, Long, Double)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val mst = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    for (e <- edges.sortBy(t => (t._3, t._1, t._2))) {
      val (ra, rb) = (find(e._1), find(e._2))
      if (ra != rb) { parent(ra) = rb; mst += e }
    }
    mst.toSet
  }

  test("boruvkaMsf equals Kruskal on random graphs with unique weights") {
    val rnd = new scala.util.Random(88)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      // random connected-ish graph + guaranteed unique weights
      val raw = (for (_ <- 1 to n * 3) yield {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }).distinct.filter(e => e._1 != e._2)
      val edges = raw.zipWithIndex.map { case ((a, b), i) =>
        (a, b, 1.0 + ((i * 7919) % 10007).toDouble / 13.0)
      }
      val want = kruskal(edges)
      // all paths: driver Kruskal tail, driver union-find merge only,
      // and the fully-distributed loop
      for ((mergeBound, tailBound) <- Seq(
        (2000000L, 1000000L), (2000000L, 0L), (0L, 0L))) {
        val got = Graphs.boruvkaMsf(edges.toDF("src", "dst", "w"),
            maxLocalMerge = mergeBound, maxLocalEdges = tailBound)
          .select("src", "dst", "w").as[(Long, Long, Double)]
          .collect().toSet
        assert(got == want,
          s"trial $trial bounds ($mergeBound,$tailBound): " +
            s"got ${got.size} want ${want.size}")
      }
    }
  }

  test("boruvkaMsf: tie-heavy graph stays a forest (n_edges = n - components)") {
    // complete-ish graph where EVERY weight is equal: the (w,src,dst)
    // total order must still produce an acyclic spanning structure
    val n = 12
    val edges = (for (a <- 0L until n; b <- (a + 1) until n)
      yield (a, b, 5.0)).toDF("src", "dst", "w")
    // force the DISTRIBUTED rounds — the equal-weight acyclicity of the
    // per-component argmin is exactly what this test pins
    val forest = Graphs.boruvkaMsf(edges, maxLocalEdges = 0L)
      .select("src", "dst").as[(Long, Long)].collect()
    assert(forest.length == n - 1, s"got ${forest.length} edges")
    // acyclic: union-find over the forest edges never joins joined roots
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- forest) {
      assert(find(a) != find(b), s"cycle through ($a,$b)")
      parent(find(a)) = find(b)
    }
    // two disjoint cliques -> exactly two trees
    val twoComp = ((for (a <- 0L until 4; b <- (a + 1) until 4)
      yield (a, b, 1.0)) ++
      (for (a <- 10L until 14; b <- (a + 1) until 14)
        yield (a, b, 1.0))).toDF("src", "dst", "w")
    val f2 = Graphs.boruvkaMsf(twoComp)
    assert(f2.count() == 6)
    assert(f2.select("component").distinct().count() == 2)
  }

  /** Iterative Tarjan (explicit stack — no recursion depth limit). */
  private def tarjanScc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.ArrayBuffer.empty[Long]
    val comp = scala.collection.mutable.Map.empty[Long, Long]
    var counter = 0
    for (start <- nodes if !index.contains(start)) {
      // frames: (node, iterator over successors)
      val frames = scala.collection.mutable.ArrayBuffer(
        (start, adj.getOrElse(start, Seq.empty).iterator))
      index(start) = counter; low(start) = counter; counter += 1
      stack += start; onStack += start
      while (frames.nonEmpty) {
        val (v, it) = frames.last
        if (it.hasNext) {
          val w = it.next()
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack += w; onStack += w
            frames += ((w, adj.getOrElse(w, Seq.empty).iterator))
          } else if (onStack(w)) low(v) = math.min(low(v), index(w))
        } else {
          frames.remove(frames.length - 1)
          if (frames.nonEmpty) {
            val p = frames.last._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val members = scala.collection.mutable.ArrayBuffer.empty[Long]
            var w = -1L
            do {
              w = stack.remove(stack.length - 1); onStack -= w
              members += w
            } while (w != v)
            val m = members.min
            members.foreach(comp(_) = m)
          }
        }
      }
    }
    comp.toMap
  }

  test("scc: hand-traced two cycles bridged one-way plus a tail") {
    // cycle A {1,2,3} -> one-way bridge -> cycle B {10,11}; 20 is a tail
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 10L),
      (10L, 11L), (11L, 10L), (11L, 20L))
    for (localBound <- Seq(2000000L, 0L)) {
      val got = Graphs.stronglyConnectedComponents(e.toDF("src", "dst"),
          maxLocalEdges = localBound)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 20L -> 20L), s"bound=$localBound")
    }
  }

  test("scc equals Tarjan on random directed graphs (both merge paths)") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val n = 40 + 20 * trial
      val e = (for (_ <- 1 to n * 2) yield
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).distinct
      val want = tarjanScc(e)
      // driver Kosaraju path AND the fully-distributed Orzan path — three
      // independently written algorithms must agree
      for (localBound <- Seq(2000000L, 0L)) {
        val got = Graphs.stronglyConnectedComponents(e.toDF("src", "dst"),
            maxPeels = 16, maxLocalEdges = localBound)
          .as[(Long, Long)].collect().toMap
        assert(got == want,
          s"trial $trial bound $localBound: ${got.size} vs ${want.size}")
      }
    }
  }

  test("dpNoisyCounts: replayable by salt, fresh by salt, calibrated scale") {
    val df = (1 to 1000).map(i => ("g" + (i % 4), i)).toDF("g", "v")
    val a = Profiling.dpNoisyCounts(df, "g", epsilon = 1.0, salt = "s1")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val b = Profiling.dpNoisyCounts(df, "g", epsilon = 1.0, salt = "s1")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "same salt must replay bit-identically")
    val c = Profiling.dpNoisyCounts(df, "g", epsilon = 1.0, salt = "s2")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(a.map(_._3).toSeq != c.map(_._3).toSeq,
      "a fresh salt must be a fresh draw")
    // Laplace(1/eps=1): |noise| < 14 with overwhelming probability
    assert(a.forall(r => math.abs(r._3 - r._2) < 14.0))
    assert(a.map(_._2).toSeq == Seq(250L, 250L, 250L, 250L))
  }

  test("incrementalJoinDelta: view + delta equals the full recompute") {
    val rnd = new scala.util.Random(5)
    val a = (1 to 200).map(i => (rnd.nextInt(30).toLong, i))
    val b = (1 to 80).map(i => (rnd.nextInt(30).toLong, i * 1000))
    val (baseA, deltaA) = a.partition(_._2 % 3 != 0)
    val (baseB, deltaB) = b.partition(_._2 % 4 != 0)
    def df(s: Seq[(Long, Int)], v: String) = s.toDF("k", v)
    val view = df(baseA, "va").join(df(baseB, "vb"), Seq("k"))
      .unionByName(Maintenance.incrementalJoinDelta(
        df(baseA, "va"), df(deltaA, "va"),
        df(baseB, "vb"), df(deltaB, "vb"), "k"))
      .as[(Long, Int, Int)].collect().sorted.toSeq
    val full = df(a, "va").join(df(b, "vb"), Seq("k"))
      .as[(Long, Int, Int)].collect().sorted.toSeq
    assert(view == full, s"view ${view.size} vs full ${full.size}")
  }

  test("groupAuc: perfect separation 1.0, anti-separation 0.0, ties 0.5") {
    val rows =
      (1 to 5).map(i => ("sep", i + 10.0, 1)) ++
        (1 to 5).map(i => ("sep", i.toDouble, 0)) ++     // pos all higher
        (1 to 5).map(i => ("anti", i.toDouble, 1)) ++
        (1 to 5).map(i => ("anti", i + 10.0, 0)) ++      // pos all lower
        (1 to 4).map(_ => ("tie", 7.0, 1)) ++
        (1 to 4).map(_ => ("tie", 7.0, 0))               // all tied
    val got = Profiling.groupAuc(rows.toDF("slice", "s", "y"),
        "slice", "s", "y")
      .select("slice", "auc").as[(String, Double)].collect().toMap
    assert(got == Map("sep" -> 1.0, "anti" -> 0.0, "tie" -> 0.5))
    // single-class slice yields null, not a fabricated number
    val one = Profiling.groupAuc(
      Seq(("x", 1.0, 1), ("x", 2.0, 1)).toDF("slice", "s", "y"),
      "slice", "s", "y").select("auc").collect()(0)
    assert(one.isNullAt(0))
  }

  test("dpNoisySums: clipping bounds the release; replay is exact") {
    val df = Seq(("a", 10.0), ("a", 1000.0), ("b", -5.0), ("b", 20.0))
      .toDF("g", "v")
    val got = Profiling.dpNoisySums(df, "g", "v", clip = 50.0,
        epsilon = 1.0, salt = "z")
      .as[(String, Double, Double)].collect().sortBy(_._1)
    // a: 10 + min(1000,50) = 60; b: max(-5,0) + 20 = 20
    assert(got.map(r => (r._1, r._2)).toSeq == Seq(("a", 60.0), ("b", 20.0)))
    // Laplace(50/1): noise magnitude bounded in practice
    assert(got.forall(r => math.abs(r._3 - r._2) < 50 * 14))
    val again = Profiling.dpNoisySums(df, "g", "v", 50.0, 1.0, "z")
      .as[(String, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == again.toSeq)
  }

  test("patternNovelty: day one is all-new; a repeated day adds nothing new") {
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def at(d: Int, m: Int) =
      new java.sql.Timestamp(ts0.getTime + d * 86400000L + m * 60000L)
    // user 1 repeats the same a>b>c day 1 and day 2; user 2 brings a new
    // pattern x>y>z on day 2 only
    val rows =
      Seq((1L, 1L, at(0, 0), "a"), (1L, 2L, at(0, 1), "b"),
        (1L, 3L, at(0, 2), "c"),
        (1L, 4L, at(1, 0), "a"), (1L, 5L, at(1, 1), "b"),
        (1L, 6L, at(1, 2), "c"),
        (2L, 7L, at(1, 0), "x"), (2L, 8L, at(1, 1), "y"),
        (2L, 9L, at(1, 2), "z"))
    val df = rows.toDF("user_id", "event_id", "ts", "event_type")
    val got = CorpusStats.patternNovelty(df, "user_id", "ts", "event_type",
        "event_id")
      .as[(java.sql.Date, Long, Long, Double)].collect().sortBy(_._1.getTime)
    // NOTE: user 1's cross-day windows (b,c -> a of day 2 etc.) create
    // extra patterns dated day 1 (window day = first event's day)
    assert(got.length == 2)
    val day1 = got(0); val day2 = got(1)
    assert(day1._2 == day1._3, "every first-day pattern is new")
    assert(day2._3 == 1L && day2._2 == 2L,
      s"day 2: only x>y>z is new, a>b>c repeats: $day2")
    assert(day2._4 == 0.5)
  }

  test("adamicAdar: hub above maxDeg contributes no wedges") {
    // star: hub 0 connected to 1..5 (deg 5). With maxDeg=4 the hub is
    // dropped as a shared neighbour -> no predictions at all; with the
    // default cap all C(5,2) leaf pairs appear with score 1/ln 5.
    val e = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    assert(Graphs.adamicAdar(e, maxDeg = 4).count() == 0)
    val full = Graphs.adamicAdar(e).as[(Long, Long, Long, Double)].collect()
    assert(full.length == 10 &&
      full.forall(r => r._3 == 1L &&
        math.abs(r._4 - 1.0 / math.log(5.0)) < 1e-6))
  }
}
