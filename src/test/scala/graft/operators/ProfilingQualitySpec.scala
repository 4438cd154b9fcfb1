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
}
