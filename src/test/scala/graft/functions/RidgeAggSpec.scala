package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RidgeAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fitOf(rows: Seq[(String, Seq[Double], Double)], k: Int,
      lambda: Double): Map[String, RidgeAgg.Fit] = {
    val ridge = udaf(new RidgeAgg(k, lambda))
    rows.toDF("g", "xs", "y")
      .groupBy("g")
      .agg(ridge(col("xs"), col("y")).as("fit"))
      .select(col("g"), col("fit"))
      .collect()
      .map { r =>
        val f = r.getStruct(1)
        r.getString(0) -> RidgeAgg.Fit(
          if (f.isNullAt(0)) null else f.getSeq[Double](0),
          if (f.isNullAt(1)) None else Some(f.getDouble(1)),
          if (f.isNullAt(2)) None else Some(f.getDouble(2)),
          f.getLong(3))
      }.toMap
  }

  test("OLS recovers a planted noiseless model exactly (r2 = 1)") {
    // y = 3*x1 - 2*x2 + 7 on a deterministic non-degenerate grid
    val rows = for (i <- 0 until 40) yield {
      val x1 = (i % 7).toDouble; val x2 = ((i * 3) % 5).toDouble
      ("g", Seq(x1, x2), 3.0 * x1 - 2.0 * x2 + 7.0)
    }
    val f = fitOf(rows, k = 2, lambda = 0.0)("g")
    assert(math.abs(f.coeffs(0) - 3.0) < 1e-9 &&
      math.abs(f.coeffs(1) + 2.0) < 1e-9 &&
      math.abs(f.intercept.get - 7.0) < 1e-9, f.toString)
    assert(f.r2.exists(r => math.abs(r - 1.0) < 1e-9) && f.n == 40)
  }

  test("partition-count independence: 1 vs 8 partitions agree") {
    val rnd = new scala.util.Random(3)
    val rows = for (i <- 0 until 500) yield
      ("g", Seq(rnd.nextDouble() * 10, rnd.nextDouble() * 5),
        rnd.nextDouble() * 100)
    val ridge = udaf(new RidgeAgg(2, 0.5))
    def run(parts: Int) = rows.toDF("g", "xs", "y").repartition(parts)
      .groupBy("g")
      .agg(ridge(col("xs"), col("y")).as("fit"))
      .select(col("fit.coeffs")(0), col("fit.coeffs")(1),
        col("fit.intercept"))
      .as[(Double, Double, Double)].collect()(0)
    val (a1, b1, c1) = run(1); val (a8, b8, c8) = run(8)
    assert(math.abs(a1 - a8) < 1e-9 && math.abs(b1 - b8) < 1e-9 &&
      math.abs(c1 - c8) < 1e-9)
  }

  test("ridge shrinks coefficients toward zero; intercept unpenalized") {
    val rows = for (i <- 0 until 60) yield {
      val x1 = (i % 6).toDouble
      ("g", Seq(x1), 2.0 * x1 + 1.0)
    }
    val ols = fitOf(rows, 1, 0.0)("g")
    val rid = fitOf(rows, 1, 50.0)("g")
    assert(math.abs(rid.coeffs(0)) < math.abs(ols.coeffs(0)),
      s"ols=${ols.coeffs(0)} ridge=${rid.coeffs(0)}")
  }

  test("collinear features with lambda=0 report singular (null coeffs)") {
    val rows = for (i <- 0 until 20) yield {
      val x = i.toDouble
      ("g", Seq(x, 2.0 * x), x) // x2 = 2*x1 exactly
    }
    val f = fitOf(rows, 2, 0.0)("g")
    assert(f.coeffs == null && f.n == 20)
    // the ridge term rescues the same system
    val fr = fitOf(rows, 2, 1.0)("g")
    assert(fr.coeffs != null)
  }
}
