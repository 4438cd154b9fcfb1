package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one sanctioned crossing between the public DataFrame API and
  * catalyst `LogicalPlan`s, for mounting custom logical operators (e.g.
  * `graft.plans.TopKPerGroup`) into a user-facing `DataFrame`.
  *
  * Lives under `org.apache.spark.sql` because `Dataset.ofRows` is
  * `private[sql]` — the standard extension-library technique (the
  * supported `SparkSessionExtensions` hooks inject rules and strategies,
  * but offer no public constructor from a logical plan to a DataFrame).
  * Nothing else reaches into Spark internals from here.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  def planOf(df: DataFrame): LogicalPlan = df.queryExecution.logical

  /** Catalyst expression behind a public `Column` (Spark 4 hides `.expr`
    * behind the agnostic ColumnNode API). Converted EAGERLY — the lazy
    * `ColumnNodeExpression` wrapper from `ExpressionUtils.expression` is
    * not serializable and must never reach a task closure. */
  def exprOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
