package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 additions: distributed skyline, pooled autocorrelation,
  * Theil–Sen robust slope, and reciprocal best match. Each verified
  * against a naive in-memory reference (or a hand-traced answer), plus
  * the operator's scale contract where it has one.
  */
class SkylineStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naiveSkyline(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (bx, by) =>
        bx <= x && by >= y && (bx < x || by > y)
      }
    }.toSet
  }

  test("skyline2D hand-traced: dominated ties, duplicate points, equal-x columns") {
    // (1,5) kills (1,4) (equal x, lower y) and (2,5) (worse x, tied y);
    // (2,7) and (4,9) survive; (4,9) duplicated twice -> n_rows=2
    val pts = Seq((1.0, 5.0), (1.0, 4.0), (2.0, 5.0), (2.0, 7.0),
      (4.0, 9.0), (4.0, 9.0), (3.0, 6.0))
    val got = Skyline.skyline2D(pts.toDF("x", "y"), "x", "y", buckets = 2)
      .as[(Double, Double, Long)].collect().toSet
    assert(got == Set((1.0, 5.0, 1L), (2.0, 7.0, 1L), (4.0, 9.0, 2L)))
  }

  test("skyline2D property: equals naive dominance filter across bucket counts") {
    val rnd = new scala.util.Random(8)
    val pts = Seq.fill(400)((rnd.nextInt(40).toDouble,
      rnd.nextInt(40).toDouble))
    val want = naiveSkyline(pts)
    for (b <- Seq(1, 3, 64)) {
      val got = Skyline.skyline2D(pts.toDF("x", "y"), "x", "y", buckets = b)
        .select("x", "y").as[(Double, Double)].collect().toSet
      assert(got == want, s"buckets=$b: got=${got.size} want=${want.size}")
    }
  }

  test("skyline2D: all-identical points and empty input") {
    val same = Seq.fill(5)((2.0, 3.0)).toDF("x", "y")
    assert(Skyline.skyline2D(same, "x", "y")
      .as[(Double, Double, Long)].collect().toSeq == Seq((2.0, 3.0, 5L)))
    val empty = Seq.empty[(Double, Double)].toDF("x", "y")
    assert(Skyline.skyline2D(empty, "x", "y").count() == 0)
  }

  test("pooledAutocorrelation: AR-free alternating series vs exact Pearson") {
    // series u1: strictly alternating +1/-1 -> acf1 = -1, acf2 = +1;
    // two users, pairs never cross the user boundary
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val rows = (0 until 8).map(i =>
      (1L, i.toLong, at(i), "a", if (i % 2 == 0) 1.0 else -1.0)) ++
      (0 until 8).map(i =>
        (2L, (100 + i).toLong, at(i), "a", if (i % 2 == 0) 1.0 else -1.0))
    val df = rows.toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = EventAnalytics.pooledAutocorrelation(
      df, "user_id", "event_type", "ts", "event_id", "value")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.length == 1)
    val (g, n, a1, a2, a3) = got(0)
    assert(g == "a" && n == 16)
    assert(a1 == -1.0 && a2 == 1.0 && a3 == -1.0)
  }

  test("theilSenSlope: exact line recovers slope; outlier point barely moves it") {
    // y = 2x + 1 for 9 points plus one wild outlier: the pairwise-slope
    // median stays 2.0 (the mean-based OLS fit would not)
    val clean = (0 until 9).map(i => ("g1", i.toDouble, 2.0 * i + 1, i.toLong))
    val df = (clean :+ ("g1", 9.0, 500.0, 9L)).toDF("g", "x", "y", "id")
    val got = EventAnalytics.theilSenSlope(df, "g", "x", "y", "id")
      .as[(String, Long, Long, Double)].collect()
    assert(got.length == 1)
    val (_, nPts, nPairs, slope) = got(0)
    assert(nPts == 10 && nPairs == 45)
    assert(slope == 2.0, s"sen_slope=$slope")
  }

  test("theilSenSlope: oversized group fails loudly per the scale contract") {
    val big = (0 until 50).map(i => ("g", i.toDouble, i.toDouble, i.toLong))
      .toDF("g", "x", "y", "id")
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.theilSenSlope(big, "g", "x", "y", "id", maxGroupSize = 10)
    }
    assert(e.getMessage.contains("maxGroupSize"))
  }

  test("spearmanCorr: monotone-nonlinear is exactly 1; ties use mid-ranks") {
    // y = x^3 is monotone (spearman 1.0) but not linear (pearson < 1)
    val mono = (1 to 20).map(i => ("g", i.toDouble, math.pow(i, 3)))
      .toDF("g", "x", "y")
    val got = Profiling.spearmanCorr(mono, "g", "x", "y")
      .as[(String, Long, Double)].collect()(0)
    assert(got == (("g", 20L, 1.0)))
    // tie case hand-computed: x = (1,2,2,3), y = (1,3,2,4)
    // rx = (1, 2.5, 2.5, 4); ry = (1, 3, 2, 4)
    // cov = 4.5, var rx = 4.5, var ry = 5 -> 4.5/sqrt(22.5) = 0.948683...
    val ties = Seq(("t", 1.0, 1.0), ("t", 2.0, 3.0), ("t", 2.0, 2.0),
      ("t", 3.0, 4.0)).toDF("g", "x", "y")
    val sp = Profiling.spearmanCorr(ties, "g", "x", "y")
      .as[(String, Long, Double)].collect()(0)._3
    assert(math.abs(sp - 4.5 / math.sqrt(22.5)) < 1e-6, s"spearman=$sp")
  }

  test("isotonicCalibrate: PAV pools adjacent violators, output monotone") {
    // 4 clean bins with rates .0, .5, .25, 1.0 -> PAV pools bins 2,3
    // (weighted: (2+1)/(4+4) = .375), leaving .0, .375, .375, 1.0
    val rows =
      Seq.fill(4)((5.0, 0)) ++                         // bin 0: rate 0
      (Seq.fill(2)((15.0, 1)) ++ Seq.fill(2)((15.0, 0))) ++ // bin 1: .5
      (Seq.fill(1)((25.0, 1)) ++ Seq.fill(3)((25.0, 0))) ++ // bin 2: .25
      Seq.fill(4)((35.0, 1))                           // bin 3: rate 1
    val df = rows.toDF("score", "y")
    val got = Profiling.isotonicCalibrate(df, "score", "y", bins = 4)
      .select("bin", "n", "n_pos", "raw_rate", "calibrated")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._5).toSeq == Seq(0.0, 0.375, 0.375, 1.0))
    assert(got.map(_._4).toSeq == Seq(0.0, 0.5, 0.25, 1.0))
    // monotone non-decreasing by construction
    assert(got.map(_._5).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("procrustes recovers a planted rotation to machine precision") {
    val d = 4
    // planted rotation: product of two Givens rotations (orthogonal)
    def givens(p: Int, q: Int, th: Double): Array[Array[Double]] = {
      val g = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
      g(p)(p) = math.cos(th); g(q)(q) = math.cos(th)
      g(p)(q) = -math.sin(th); g(q)(p) = math.sin(th)
      g
    }
    def matmul(a: Array[Array[Double]], b: Array[Array[Double]]) =
      Array.tabulate(d, d)((i, j) =>
        (0 until d).map(k => a(i)(k) * b(k)(j)).sum)
    val rTrue = matmul(givens(0, 2, 0.7), givens(1, 3, -1.1))
    val rnd = new scala.util.Random(21)
    val xs = (1 to 300).map(i =>
      (i.toLong, Seq.fill(d)(rnd.nextDouble() * 2 - 1)))
    val ys = xs.map { case (id, x) =>
      (id, (0 until d).map(j =>
        (0 until d).map(i => x(i) * rTrue(i)(j)).sum).toSeq)
    }
    val a = xs.toDF("vec_id", "embedding")
    val b = ys.toDF("vec_id", "embedding")
    val r = Similarity.procrustesRotation(a, b, "vec_id", "embedding")
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(r(i)(j) - rTrue(i)(j)) < 1e-8,
        s"R($i)($j)=${r(i)(j)} want ${rTrue(i)(j)}")
    // applyRotation(x, R) reproduces y
    val applied = Similarity.applyRotation(a, "embedding", r, "out")
      .select("vec_id", "out").as[(Long, Seq[Double])].collect().toMap
    val yMap = ys.toMap
    assert(applied.forall { case (id, v) =>
      v.zip(yMap(id)).forall { case (u, w) => math.abs(u - w) < 1e-8 }
    })
  }

  test("kaplanMeier: textbook product-limit with censoring and a zero step") {
    // durations: (1,event) (2,censored) (3,event) (3,event) (4,censored)
    // t=1: n=5 d=1 -> 0.8; t=3: n=3 d=2 -> 0.8*(1/3); censor times emit
    // no row but DO shrink the risk set
    val subj = Seq(("g", 1.0, 1), ("g", 2.0, 0), ("g", 3.0, 1),
      ("g", 3.0, 1), ("g", 4.0, 0)).toDF("grp", "dur", "ev")
    val got = EventAnalytics.kaplanMeier(subj, "grp", "dur", "ev")
      .select("t", "n_risk", "n_events", "survival")
      .as[(Double, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1.0, 5L, 1L, 0.8), (3.0, 3L, 2L, 0.266667)))
    // everyone dies at the last event time -> survival exactly 0
    val dead = Seq(("g", 1.0, 1), ("g", 1.0, 1)).toDF("grp", "dur", "ev")
    val z = EventAnalytics.kaplanMeier(dead, "grp", "dur", "ev")
      .select("survival").as[Double].collect()
    assert(z.toSeq == Seq(0.0))
  }

  test("rollingOlsSlope: exact line gives the planted slope in every window") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 15).map(i => (1L,
      new java.sql.Timestamp(ts0.getTime + i * 3600000L), i.toLong,
      i.toDouble, 2.0 * i + 3.0))
    val df = rows.toDF("user_id", "ts", "event_id", "x", "value")
    val got = EventAnalytics.rollingOlsSlope(df, "user_id", "ts",
        "event_id", "x", "value", win = 10)
      .select("slope").as[Double].collect()
    assert(got.length == 6 && got.forall(_ == 2.0), got.toSeq.toString)
  }

  test("hacAverageLinkage: hand-traced 1-D dendrogram") {
    // points 0,1,10,11,40: merges (0,1) d=1, (10,11) d=1 — tie broken to
    // smaller min id — then {0,1}+{10,11} d=avg(|0-10|,|0-11|,|1-10|,
    // |1-11|)=10, then +{40} d=avg(40,39,30,29)=34.5
    val pts = Array(0.0, 1.0, 10.0, 11.0, 40.0).map(Array(_))
    val got = Similarity.hacAverageLinkage(pts)
    assert(got == Seq(
      (1, 0, 1, 1.0, 2), (2, 2, 3, 1.0, 2),
      (3, 0, 2, 10.0, 4), (4, 0, 4, 34.5, 5)), got.toString)
  }

  test("pcaFit: planted 2-factor data — top-2 components carry everything") {
    val rnd = new scala.util.Random(11)
    val u = Array(0.6, 0.0, 0.8, 0.0, 0.0) // orthonormal pair
    val v = Array(0.0, 1.0, 0.0, 0.0, 0.0)
    val rows = (1 to 400).map { i =>
      val a = rnd.nextGaussian() * 3; val b = rnd.nextGaussian()
      (i.toLong, (0 until 5).map(j => a * u(j) + b * v(j)).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (means, evals, comps) = Similarity.pcaFit(df, "embedding", 5)
    assert(evals(0) > evals(1) && evals(1) > 1e-6,
      s"expected two real components: ${evals.toSeq}")
    assert(evals.drop(2).forall(math.abs(_) < 1e-9),
      s"rank-2 data must have zero tail eigenvalues: ${evals.toSeq}")
    // score variance per component equals the eigenvalue
    val meansLit = array(means.map(lit(_)): _*)
    val centered = df.withColumn("_c",
      zip_with(col("embedding").cast("array<double>"), meansLit,
        (x, m) => x - m))
    val sv = Similarity.applyRotation(centered, "_c", comps, "pc")
      .select(posexplode(col("pc")).as(Seq("k", "s")))
      .groupBy("k").agg(variance(col("s")).as("v"))
      .as[(Int, Double)].collect().toMap
    for (k <- 0 until 2)
      assert(math.abs(sv(k) - evals(k)) < 1e-8, s"k=$k ${sv(k)} vs ${evals(k)}")
    // components are unit-norm and orthogonal
    def dot(a: Int, b: Int) = (0 until 5).map(i => comps(i)(a) * comps(i)(b)).sum
    assert(math.abs(dot(0, 0) - 1) < 1e-9 && math.abs(dot(1, 1) - 1) < 1e-9)
    assert(math.abs(dot(0, 1)) < 1e-9)
  }

  test("jsDivergenceMatrix: identical slices give 0, disjoint vocab gives 1") {
    val docs = Seq(
      ("a", "x y z"), ("a", "x y"),
      ("b", "x y z"), ("b", "x y"),   // b identical to a -> jsd 0
      ("c", "p q r p")                // c disjoint from both -> jsd 1
    ).toDF("source", "text")
    val got = CorpusStats.jsDivergenceMatrix(docs, "text", "source")
      .as[(String, String, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(got(("a", "b")) == 0.0)
    assert(got(("a", "c")) == 1.0 && got(("b", "c")) == 1.0)
  }

  test("dimensionStats: hand-computed per-dimension moments") {
    val emb = Seq(
      (1L, Array(1.0f, 10.0f)),
      (2L, Array(3.0f, 10.0f)),
      (3L, Array(5.0f, 10.0f))).toDF("vec_id", "embedding")
    val got = Similarity.dimensionStats(emb, "embedding")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
      .sortBy(_._1)
    // dim 0: mean 3, sample std 2, min 1, max 5; dim 1: constant 10
    assert(got(0) == ((0L, 3L, 3.0, 2.0, 1.0, 5.0)))
    assert(got(1) == ((1L, 3L, 10.0, 0.0, 10.0, 10.0)))
  }

  test("mutualBestMatch: hub survives one direction but not mutuality") {
    // b10 is the nearest of BOTH a1 and a2 (a hub); but b10's own best is
    // a1 only -> (a1,b10) mutual, a2 unmatched. a3/b11 pair up cleanly.
    val a = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val b = Seq(
      (10L, Array(1.0f, 0.02f, 0.0f)),
      (11L, Array(0.0f, 0.1f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.mutualBestMatch(a, b)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (3L, 11L)))
  }
}
