package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}

/** Whole-operator tier of the extension ladder (SURVEY §2.9): top-k rows
  * per group as a first-class plan node — logical `TopKPerGroup`, a
  * planner `Strategy`, and a partial/final `TopKPerGroupExec` pair.
  *
  * Why an operator instead of the `row_number() OVER (...) <= k` pattern:
  * the window form SORTS EVERY GROUP COMPLETELY after shuffling every row
  * of the fact table. This operator keeps a k-row bounded heap per group
  * on the MAP side, so the shuffle carries at most k rows per (group,
  * input partition) — at 100 TB with k=10 that is the difference between
  * shuffling the table and shuffling ~nothing — and the reduce side heaps
  * again instead of sorting. Semantics: the returned rows are the top-k
  * of each group under `order` (no rank column; ties must be broken by
  * the caller's ordering — include a unique key for determinism).
  */
case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

/** Plans the logical node as partial (map-side prune) → shuffle-by-group →
  * final. `EnsureRequirements` inserts the exchange from the final node's
  * required distribution; the partial node accepts any distribution. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groupExprs, order, k, child) =>
      val mapSide = TopKPerGroupExec(groupExprs, order, k, partial = true,
        planLater(child))
      TopKPerGroupExec(groupExprs, order, k, partial = false, mapSide) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
    order: Seq[SortOrder], k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    // local copies: the closure must not capture `this` (a SparkPlan tree
    // is not serializable)
    val boundOrder = order
    val childOutput = child.output
    val localGroupExprs = groupExprs
    val localK = k
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(localGroupExprs, childOutput)
      val rowOrder = RowOrdering.create(boundOrder, childOutput)
      // per-group bounded binary heap, worst element on top: insert is
      // O(log k) and the heap never exceeds k rows
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      // PriorityQueue head = LEAST by its comparator; we evict the worst
      // row, so compare with the ordering REVERSED (worst first)
      val evictFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          rowOrder.compare(b, a)
      }
      iter.foreach { row =>
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](localK + 1,
            evictFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < localK) {
          heap.add(row.copy())
        } else if (rowOrder.compare(row, heap.peek()) < 0) {
          // row ranks strictly better than the current worst
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** Column-API surface: mount the operator on a DataFrame. The strategy is
  * registered per-call (idempotent), so no session-extension wiring is
  * required of the caller. */
object TopKOps {
  import org.apache.spark.sql.graftbridge.Bridge

  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
      orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    val sortOrders = orderCols.map { c =>
      Bridge.exprOf(c) match {
        case so: SortOrder => so
        case e => SortOrder(e,
          org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    Bridge.ofRows(spark,
      TopKPerGroup(groupCols.map(Bridge.exprOf), sortOrders, k,
        Bridge.planOf(df)))
  }
}
