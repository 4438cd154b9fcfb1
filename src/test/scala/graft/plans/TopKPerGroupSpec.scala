package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .drop("rn")
  }

  private def sample = (1 to 200).map { i =>
    (i.toLong, s"g${i % 7}", (i * 37 % 101).toDouble)
  }.toDF("id", "g", "v").repartition(5)

  test("operator result equals the window row_number implementation") {
    val df = sample
    val got = TopKOps.topKPerGroup(df, Seq(col("g")),
        Seq(col("v").desc, col("id").asc), 3)
      .as[(Long, String, Double)].collect().toSet
    val want = windowTopK(df, 3).as[(Long, String, Double)].collect().toSet
    assert(got == want)
    assert(got.size == 21) // 7 groups × 3
  }

  test("k larger than every group returns everything") {
    val df = sample
    val got = TopKOps.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id").asc), 1000).count()
    assert(got == 200)
  }

  test("plan: partial prune below the group-key exchange, final above") {
    val df = TopKOps.topKPerGroup(sample, Seq(col("g")),
      Seq(col("v").desc, col("id").asc), 3)
    df.collect()
    // AQE wraps stages, so inspect the final-plan text (nodeName prints
    // without the Exec suffix; the trailing flag is `partial`)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val finalIdx = plan.indexOf("TopKPerGroup [")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("TopKPerGroup [", finalIdx + 1)
    assert(finalIdx >= 0 && exchangeIdx > finalIdx && partialIdx > exchangeIdx,
      s"expected final → exchange → partial in:\n$plan")
    assert(plan.substring(finalIdx, exchangeIdx).contains(", false"),
      "top node must be the final (partial=false) exec")
    assert(plan.substring(partialIdx).contains(", true"),
      "node below the exchange must be the partial (map-side) exec")
  }

  test("duplicate order values: ties broken by the unique id column") {
    val df = Seq((1L, "g", 5.0), (2L, "g", 5.0), (3L, "g", 5.0),
      (4L, "g", 1.0)).toDF("id", "g", "v").repartition(3)
    val got = TopKOps.topKPerGroup(df, Seq(col("g")),
        Seq(col("v").desc, col("id").asc), 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("multiple group columns work") {
    val df = Seq((1L, "a", 1, 9.0), (2L, "a", 1, 8.0), (3L, "a", 2, 7.0),
      (4L, "b", 1, 6.0), (5L, "b", 1, 5.0)).toDF("id", "g1", "g2", "v")
    val got = TopKOps.topKPerGroup(df, Seq(col("g1"), col("g2")),
        Seq(col("v").desc, col("id").asc), 1)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L))
  }
}
