package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window => LogicalWindow, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Planner strategy for the top-k-per-group idiom
  * (`filter(row_number() over (partition by p order by o) <= k)`,
  * SURVEY.md §2.2 q7).
  *
  * Spark 4's built-in path (`InsertWindowGroupLimit` +
  * `WindowGroupLimitExec`) prunes each group to its first k rows but
  * still SORTS every partition twice (map side and reduce side). This
  * strategy replaces the whole pattern with two sort-free stages of
  * [[TopKPerGroupExec]] — partial (per input partition, before the
  * shuffle, so shuffle volume is ≤ groups×k like the built-in) and
  * final (clustered by the group keys, emits ranks). Bounded binary
  * heaps make each stage O(n log k) instead of O(n log n).
  *
  * Fires only on the exact safe shape: a single row_number window
  * expression, a lone `rn <= lit` / `rn < lit` predicate, non-empty
  * total ordering. Anything else falls through to the default planner.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Filter(cond,
        LogicalWindow(Seq(alias @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(part, order, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          partSpec, orderSpec, child, _))
        if orderSpec.nonEmpty =>
      val k = cond match {
        case LessThanOrEqual(a: AttributeReference, IntegerLiteral(n)) if a.exprId == alias.exprId => Some(n)
        case LessThan(a: AttributeReference, IntegerLiteral(n)) if a.exprId == alias.exprId => Some(n - 1)
        case _ => None
      }
      k match {
        case Some(n) if n > 0 && part == partSpec && order == orderSpec =>
          // the optimizer may already have inserted its sort-based
          // group-limit below the window; bypass it — our stages
          // subsume it without the sorts
          val inner = child match {
            case WindowGroupLimit(_, _, _, _, c) => c
            case c => c
          }
          val partial = TopKPerGroupExec(n, partSpec, orderSpec, alias.toAttribute,
            planLater(inner), partial = true)
          TopKPerGroupExec(n, partSpec, orderSpec, alias.toAttribute,
            partial, partial = false) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => Some(v)
      case _ => None
    }
  }
}

/** Sort-free physical top-k per group: a hash map of bounded binary
  * heaps keyed by group — a row enters its group's heap only while it
  * beats the current k-th. `partial = true` runs before the shuffle
  * and emits the surviving rows unranked (map-side combine);
  * `partial = false` requires clustering on the group keys and emits
  * rows with the rank column appended, in ascending rank order.
  */
case class TopKPerGroupExec(
    k: Int,
    partExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    rankAttr: Attribute,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (partExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val emitRanks = !partial
    val kLocal = k
    val partLocal = partExprs
    val orderLocal = orderExprs
    val outLocal = output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(partLocal, childOutput)
      val ordering = RowOrdering.create(orderLocal, childOutput)
      // PQ head = max in sort order = current worst of the top-k
      implicit val ord: Ordering[InternalRow] = (a, b) => ordering.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kLocal) heap += row.copy()
            else if (ordering.compare(row, heap.head) < 0) { heap.dequeue(); heap += row.copy() }
          case None =>
            val heap = mutable.PriorityQueue.empty[InternalRow]
            heap += row.copy()
            heaps.put(key.copy(), heap)
        }
      }
      if (!emitRanks) {
        heaps.iterator.flatMap(_._2.iterator)
      } else {
        val resultProj = UnsafeProjection.create(outLocal, outLocal)
        heaps.iterator.flatMap { case (_, heap) =>
          val sorted = heap.dequeueAll.reverse // ascending sort order
          sorted.iterator.zipWithIndex.map { case (row, i) =>
            resultProj(new JoinedRow(row, InternalRow(i + 1)))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
