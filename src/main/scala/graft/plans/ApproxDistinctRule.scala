package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `COUNT(DISTINCT x)` to
  * HyperLogLog++ when the session has set
  * `spark.graft.approxDistinct.enabled = true`.
  *
  * Tier (c) of the extension ladder — a real `Rule[LogicalPlan]`. Exact
  * distinct counts need either an Expand (one shuffle duplication per
  * distinct agg) or a two-phase shuffle on the distinct key; at 100 TB
  * cardinality dashboards rarely need exactness, and the sketch turns the
  * plan back into a single ordinary aggregate. The rewrite is visible in
  * `explain()` (no Expand, `approx_count_distinct` in the aggregate), and
  * the flag defaults to off so correctness-gated queries are untouched.
  *
  * Scope guard: only plain single-child `Count` with one distinct group
  * per aggregate is rewritten; multi-arg distinct counts keep exact
  * semantics.
  */
case class ApproxDistinctRule(spark: SparkSession) extends Rule[LogicalPlan] {
  private val Flag = "spark.graft.approxDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.getOption(Flag).contains("true")) plan
    else plan.transformAllExpressions {
      // Seq(child), not `child :: Nil`: Count.children is an ArraySeq,
      // which the List cons pattern silently never matches
      case AggregateExpression(Count(Seq(child)), _, true, filter, _) =>
        AggregateExpression(
          HyperLogLogPlusPlus(child), Complete, isDistinct = false, filter)
    }
}
