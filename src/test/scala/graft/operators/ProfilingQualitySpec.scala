package graft.operators

import graft.SparkTestSession
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
}
