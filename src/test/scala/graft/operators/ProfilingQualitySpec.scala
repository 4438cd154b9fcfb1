package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions.{count, lit}
import org.scalatest.funsuite.AnyFunSuite

class ProfilingQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fdCheck: a held dependency reports zero violations") {
    val df = Seq((1, "x"), (1, "x"), (2, "y"), (3, "y"))
      .toDF("a", "b")
    val got = Profiling.fdCheck(df, "a", "b")
      .as[(Long, Long, Long, Boolean)].head()
    assert(got == ((3L, 0L, 0L, true)))
  }

  test("fdCheck: violations count the minimal rows to repair") {
    // group 1: b in {x, x, y} → modal x (2), 1 violation row
    // group 2: b in {p, q} → modal 1, 1 violation row
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "p"), (2, "q"))
      .toDF("a", "b")
    val got = Profiling.fdCheck(df, "a", "b")
      .as[(Long, Long, Long, Boolean)].head()
    assert(got == ((2L, 2L, 2L, false)))
  }

  test("benfordProfile: digit extraction and expected fractions") {
    // values covering scientific and sub-1 representations
    val df = Seq(123.0, 0.00045, 9.1e8, 1.0, 250.0, -5.0, 0.0)
      .map(Tuple1(_)).toDF("v")
    val got = Profiling.benfordProfile(df, "v")
      .select("digit", "n").as[(Int, Long)].collect().toMap
    // -5 and 0 excluded; digits: 1(123), 4(0.00045), 9(9.1e8), 1(1), 2(250)
    assert(got == Map(1 -> 2L, 2 -> 1L, 4 -> 1L, 9 -> 1L))
    val exp = Profiling.benfordProfile(df, "v")
      .select("digit", "expected").as[(Int, Double)].collect().toMap
    assert(math.abs(exp(1) - math.log10(2.0)) < 1e-6)
  }

  test("benfordProfile: observed fractions sum to one") {
    val df = (1 to 100).map(i => Tuple1(i.toDouble * 7)).toDF("v")
    val fracs = Profiling.benfordProfile(df, "v")
      .select("observed").as[Double].collect()
    assert(math.abs(fracs.sum - 1.0) < 1e-4)
  }

  test("correlationMatrix: perfect linear and independent pairs") {
    val df = (1 to 50).map { i =>
      (i.toDouble, 2.0 * i + 3.0, if (i % 2 == 0) 1.0 else -1.0)
    }.toDF("x", "y", "z")
    val got = Profiling.correlationMatrix(df, Seq("x", "y", "z"))
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(got(("x", "y")) - 1.0) < 1e-6)     // exact linear
    assert(math.abs(got(("x", "z"))) < 0.05)           // near-independent
    assert(got.size == 3)
  }

  test("correlationMatrix drops rows with any null (listwise)") {
    val df = Seq(
      (Some(1.0), Some(2.0), Some(1.0)),
      (Some(2.0), Some(4.0), None),       // dropped for all pairs
      (Some(3.0), Some(6.0), Some(3.0)),
      (Some(4.0), Some(8.0), Some(4.0))
    ).toDF("x", "y", "z")
    val got = Profiling.correlationMatrix(df, Seq("x", "y", "z"))
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(got(("x", "y")) - 1.0) < 1e-6)
    assert(math.abs(got(("x", "z")) - 1.0) < 1e-6)
  }

  test("ksTest: identical slices give D = 0, disjoint ranges give D = 1") {
    val same = (1 to 40).flatMap(i =>
      Seq(("a", (i % 10).toDouble), ("b", (i % 10).toDouble)))
      .toDF("slice", "v")
    val d0 = Profiling.ksTest(same, "v", "slice", "a", "b")
      .select("d_stat").as[Double].head()
    assert(d0 == 0.0)
    val disjoint = ((1 to 20).map(i => ("a", i.toDouble)) ++
      (1 to 20).map(i => ("b", 100.0 + i))).toDF("slice", "v")
    val d1 = Profiling.ksTest(disjoint, "v", "slice", "a", "b")
      .select("d_stat").as[Double].head()
    assert(d1 == 1.0)
  }

  test("ksTest: hand-computed D on a small example") {
    // a: {1,2,3,4}; b: {3,4,5,6} → max CDF gap at x=2: |2/4 − 0/4| = 0.5
    val df = (Seq(1, 2, 3, 4).map(v => ("a", v.toDouble)) ++
      Seq(3, 4, 5, 6).map(v => ("b", v.toDouble))).toDF("slice", "v")
    val got = Profiling.ksTest(df, "v", "slice", "a", "b")
      .as[(Long, Long, Double)].head()
    assert(got == ((4L, 4L, 0.5)))
  }

  test("chiSquareIndependence: exact product table has chi2 = 0") {
    // counts o(a,b) = f(a)·g(b) → perfectly independent
    val rows = for {
      (a, fa) <- Seq(("x", 2), ("y", 3))
      (b, gb) <- Seq(("p", 1), ("q", 4))
      _ <- 1 to fa * gb
    } yield (a, b)
    val got = Profiling.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Double, Double)].head()
    assert(got._1 == 25L && got._2 == 1L)
    assert(math.abs(got._3) < 1e-6 && math.abs(got._4) < 1e-6)
  }

  test("chiSquareIndependence: perfect association has Cramér's V = 1") {
    val df = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"),
      ("z", "r")).toDF("a", "b")
    val got = Profiling.chiSquareIndependence(df, "a", "b")
      .as[(Long, Long, Double, Double)].head()
    // r = c = 3, n = 5, a determines b exactly → chi2 = n·min(r−1,c−1)
    assert(got == ((5L, 4L, 10.0, 1.0)))
  }

  test("welchTTest: hand-computed t and Welch df") {
    val df = (Seq(1, 2, 3, 4, 5).map(v => ("a", v.toDouble)) ++
      Seq(2, 4, 6, 8, 10, 12).map(v => ("b", v.toDouble)))
      .toDF("slice", "v")
    val r = Profiling.welchTTest(df, "v", "slice", "a", "b").head()
    assert(r.getAs[Long]("n_a") == 5L && r.getAs[Long]("n_b") == 6L)
    assert(r.getAs[Double]("mean_a") == 3.0)
    assert(r.getAs[Double]("mean_b") == 7.0)
    // va = 2.5, vb = 14: t = −4/√(0.5 + 7/3), df by Welch–Satterthwaite
    assert(math.abs(r.getAs[Double]("t_stat") - (-2.376354)) < 1e-6)
    assert(math.abs(r.getAs[Double]("welch_df") - 6.9723) < 1e-4)
  }

  test("groupOls: exact linear fit per group; zero-variance x dropped") {
    val df = ((1 to 10).map(i => ("g1", i.toDouble, 2.0 * i + 3.0)) ++
      (1 to 10).map(i => ("g2", i.toDouble, -1.0 * i + 7.0)) ++
      Seq(("flat", 5.0, 1.0), ("flat", 5.0, 2.0))) // no x variance
      .toDF("g", "x", "y")
    val got = Profiling.groupOls(df, "g", "x", "y")
      .select("grp", "slope", "intercept", "r2")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("g1") == ((2.0, 3.0, 1.0)))
    assert(got("g2") == ((-1.0, 7.0, 1.0)))
    assert(!got.contains("flat"))
  }

  test("groupOls: xCenter shifts the intercept, not the slope") {
    val df = (1 to 10).map(i => ("g", i.toDouble, 2.0 * i + 3.0))
      .toDF("g", "x", "y")
    val r = Profiling.groupOls(df, "g", "x", "y", xCenter = 4.0)
      .select("slope", "intercept").as[(Double, Double)].head()
    assert(r == ((2.0, 11.0))) // y at x = 4
  }

  test("mannWhitneyU: hand-computed tie-corrected z") {
    // A = {1,2,3}, B = {2,3,4}: avg ranks 1, 2.5, 4.5, 6 → R_A = 8,
    // U_A = 2, ties Σ(t³−t) = 12, σ² = 0.75·(7 − 12/30) = 4.95
    val df = (Seq(1, 2, 3).map(v => ("a", v)) ++
      Seq(2, 3, 4).map(v => ("b", v))).toDF("slice", "v")
    val r = Profiling.mannWhitneyU(df, "v", "slice", "a", "b").head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("u_a") == 2.0)
    assert(math.abs(r.getAs[Double]("z") - (-1.123666)) < 1e-6)
  }

  test("mannWhitneyU: symmetric slices give z = 0") {
    val df = (Seq(1, 2, 3, 4).map(v => ("a", v)) ++
      Seq(1, 2, 3, 4).map(v => ("b", v))).toDF("slice", "v")
    val r = Profiling.mannWhitneyU(df, "v", "slice", "a", "b").head()
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("sliceDriftFdr: shifted slice flagged, null slices not") {
    // five identical slices + one shifted by 1.5; the shift is diluted
    // 1:5 in each null slice's "rest", so only f should reject
    val df = (Seq("a", "b", "c", "d", "e").flatMap(g =>
      (1 to 50).map(i => (g, 10.0 + (i % 5)))) ++
      (1 to 50).map(i => ("f", 11.5 + (i % 5)))).toDF("src", "v")
    val rows = Profiling.sliceDriftFdr(df, "v", "src", alpha = 0.05)
      .select("slice", "significant").as[(String, Boolean)]
      .collect().toMap
    assert(rows("f"))
    assert(Seq("a", "b", "c", "d", "e").forall(g => !rows(g)))
  }

  test("cusumChangepoint: step series peaks at the step") {
    // x = 0,0,0,10,10 → S = −4,−8,−12,−6,0; max|S| = 12 at ord 3;
    // sd = √30, stat = 12/(√30·√5)
    val df = Seq(("k", 1L, 0.0), ("k", 2L, 0.0), ("k", 3L, 0.0),
      ("k", 4L, 10.0), ("k", 5L, 10.0)).toDF("g", "o", "x")
    val r = Profiling.cusumChangepoint(df, "g", "o", "x").head()
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("changepoint_at") == 3L)
    assert(r.getAs[Double]("max_abs_cusum") == 12.0)
    assert(math.abs(r.getAs[Double]("cusum_stat") - 0.979796) < 1e-6)
  }

  test("cusumChangepoint: tie on |S| reports the earliest point") {
    // x = 1,-1,1,-1 (mean 0): S = 1,0,1,0 → |S| ties at ords 1 and 3
    val df = Seq(("k", 1L, 1.0), ("k", 2L, -1.0), ("k", 3L, 1.0),
      ("k", 4L, -1.0)).toDF("g", "o", "x")
    val r = Profiling.cusumChangepoint(df, "g", "o", "x").head()
    assert(r.getAs[Long]("changepoint_at") == 1L)
    assert(r.getAs[Double]("max_abs_cusum") == 1.0)
  }

  test("giniReport: equal masses give gini 0; (1,3) gives 0.25") {
    val eq = Seq(("a", 5), ("b", 5), ("c", 5), ("d", 5))
      .flatMap { case (g, n) => (1 to n).map(_ => g) }.toDF("g")
    val g0 = Profiling.giniReport(eq, "g", count(lit(1)))
      .select("gini").as[Double].head()
    assert(g0 == 0.0)
    val skew = (Seq.fill(1)("a") ++ Seq.fill(3)("b")).toDF("g")
    val rows = Profiling.giniReport(skew, "g", count(lit(1)))
      .orderBy("mass")
      .select("grp", "mass", "cum_mass_share", "gini")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.toSeq == Seq(("a", 1L, 0.25, 0.25), ("b", 3L, 1.0, 0.25)))
  }

  test("cuped: hand-traced moments, θ, adjusted effect, ρ²") {
    // n=4, Σx=10, Σy=22, Σxy=67, Σx²=30, Σy²=150
    // cov=4·67−220=48, varX=4·30−100=20 → θ=2.4
    // effect_raw = 8−3 = 5; E[X|b]−E[X|a] = 2 → effect_cuped = 0.2
    // ρ² = 48²/(20·116) = 0.993103448…
    val units = Seq(("a", 1.0, 2.0), ("a", 2.0, 4.0),
        ("b", 3.0, 7.0), ("b", 4.0, 9.0))
      .toDF("arm", "x", "y")
    val got = Profiling.cuped(units, "arm", "b", "x", "y")
      .select("n_a", "n_b", "theta", "effect_raw", "effect_cuped", "rho_sq")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(got == ((2L, 2L, 2.4, 5.0, 0.2, 0.993103)))
  }

  test("cuped: a perfectly predictive covariate removes the whole effect") {
    // y = 2x with no treatment signal → ρ² = 1, adjusted effect 0
    val units = Seq(("a", 1.0, 2.0), ("a", 2.0, 4.0),
        ("b", 3.0, 6.0), ("b", 4.0, 8.0))
      .toDF("arm", "x", "y")
    val got = Profiling.cuped(units, "arm", "b", "x", "y")
      .select("theta", "effect_raw", "effect_cuped", "rho_sq")
      .as[(Double, Double, Double, Double)].head()
    assert(got == ((2.0, 4.0, 0.0, 1.0)))
  }

  test("didHealth: hand-traced SRM χ² and DiD") {
    // balanced split → χ² = 0; Δa = 3−1.5 = 1.5, Δb = 8−3.5 = 4.5 → did 3
    val units = Seq(("a", 1.0, 2.0), ("a", 2.0, 4.0),
        ("b", 3.0, 7.0), ("b", 4.0, 9.0))
      .toDF("arm", "x", "y")
    val got = Profiling.didHealth(units, "arm", "b", "x", "y")
      .select("n_a", "n_b", "srm_chi2", "srm_ok", "delta_a", "delta_b",
        "did")
      .as[(Long, Long, Double, Boolean, Double, Double, Double)].head()
    assert(got == ((2L, 2L, 0.0, true, 1.5, 4.5, 3.0)))
  }

  test("didHealth: a 9:1 split trips the SRM flag (χ² = 6.4 > 3.841)") {
    val units = ((1 to 9).map(i => ("b", i.toDouble, i.toDouble)) :+
        (("a", 1.0, 1.0))).toDF("arm", "x", "y")
    val got = Profiling.didHealth(units, "arm", "b", "x", "y")
      .select("srm_chi2", "srm_ok").as[(Double, Boolean)].head()
    assert(got == ((6.4, false)))
  }

  test("cuped: empty input and single-arm input degrade to NULLs") {
    val empty = Seq.empty[(String, Double, Double)].toDF("arm", "x", "y")
    val r0 = Profiling.cuped(empty, "arm", "b", "x", "y").head()
    assert(r0.getLong(0) == 0L && r0.getLong(1) == 0L && r0.isNullAt(4))
    val oneArm = Seq(("a", 1.0, 2.0), ("a", 2.0, 5.0)).toDF("arm", "x", "y")
    val r1 = Profiling.cuped(oneArm, "arm", "b", "x", "y").head()
    assert(r1.getLong(0) == 2L && r1.getLong(1) == 0L && r1.isNullAt(4))
  }

  // round-11 guard refinement: each output NULLs only on what IT needs
  test("cuped: constant metric (var Y = 0) still reports means, " +
    "effect and theta — only rho_sq is undefined") {
    val units = Seq(("a", 1.0, 5.0), ("a", 2.0, 5.0),
        ("b", 3.0, 5.0), ("b", 4.0, 5.0)).toDF("arm", "x", "y")
    val r = Profiling.cuped(units, "arm", "b", "x", "y").head()
    def d(n: String) = r.getDouble(r.fieldIndex(n))
    assert(d("mean_y_a") == 5.0 && d("mean_y_b") == 5.0)
    assert(d("effect_raw") == 0.0 && d("theta") == 0.0 &&
      d("effect_cuped") == 0.0)
    assert(r.isNullAt(r.fieldIndex("rho_sq")))
  }

  test("cuped: constant covariate (var X = 0) still reports means and " +
    "raw effect — theta/effect_cuped/rho_sq are undefined") {
    val units = Seq(("a", 1.0, 2.0), ("a", 1.0, 4.0),
        ("b", 1.0, 7.0), ("b", 1.0, 9.0)).toDF("arm", "x", "y")
    val r = Profiling.cuped(units, "arm", "b", "x", "y").head()
    def d(n: String) = r.getDouble(r.fieldIndex(n))
    assert(d("mean_y_a") == 3.0 && d("mean_y_b") == 8.0 &&
      d("effect_raw") == 5.0)
    Seq("theta", "effect_cuped", "rho_sq").foreach(n =>
      assert(r.isNullAt(r.fieldIndex(n)), s"$n should be NULL"))
  }

  test("didHealth: a fully one-sided split reports chi2 = n and " +
    "srm_ok = false — the exact failure SRM exists to flag") {
    val units = (1 to 8).map(i => ("b", i.toDouble, i.toDouble))
      .toDF("arm", "x", "y")
    val r = Profiling.didHealth(units, "arm", "b", "x", "y").head()
    assert(r.getDouble(r.fieldIndex("srm_chi2")) == 8.0)
    assert(!r.getBoolean(r.fieldIndex("srm_ok")))
    // per-arm deltas still need both arms
    Seq("delta_a", "delta_b", "did").foreach(n =>
      assert(r.isNullAt(r.fieldIndex(n)), s"$n should be NULL"))
  }
}
