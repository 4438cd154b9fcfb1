package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ApproxDistinctRuleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Flag = "spark.graft.approxDistinct.enabled"

  private def withRule[T](body: => T): T = {
    val rule = ApproxDistinctRule(spark)
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ rule
    try body
    finally {
      spark.experimental.extraOptimizations = before
      spark.conf.unset(Flag)
    }
  }

  private lazy val df = (0 until 10000).map(i => (i % 5, i % 700))
    .toDF("g", "v")

  test("flag off: exact distinct plan and exact results") {
    withRule {
      val q = df.groupBy("g").agg(count_distinct(col("v")).as("d"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("approx_count_distinct"))
      assert(q.as[(Int, Long)].collect().forall(_._2 == 140L))
    }
  }

  test("flag on: plan rewrites to HLL++ and estimate is close") {
    withRule {
      spark.conf.set(Flag, "true")
      val q = df.groupBy("g").agg(count_distinct(col("v")).as("d"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"))
      q.as[(Int, Long)].collect().foreach { case (_, d) =>
        assert(math.abs(d - 140L) < 10, s"estimate $d too far from 140")
      }
    }
  }

  test("multi-arg distinct counts are left exact (scope guard)") {
    withRule {
      spark.conf.set(Flag, "true")
      val q = df.groupBy("g")
        .agg(countDistinct(col("v"), col("g")).as("d"))
      assert(!q.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      assert(q.as[(Int, Long)].collect().forall(_._2 == 140L))
    }
  }
}
