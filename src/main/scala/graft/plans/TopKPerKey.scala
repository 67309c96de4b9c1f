package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator example of the custom-plan machinery (SURVEY §7 preference
  * (c): LogicalPlan + Rule/Strategy + SparkPlan via SparkSessionExtensions):
  * top-k rows per key under a total order, executed as partial per-partition
  * heaps → shuffle on key → final heaps. Unlike the window-function
  * formulation (full sort of every partition), shuffle volume is bounded at
  * k rows per (key, map partition) — the shape that survives 100 TB inputs
  * with heavy keys.
  */
final case class TopKPerKey(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      val partial = TopKPerKeyExec(k, keys, order, planLater(child), partial = true)
      TopKPerKeyExec(k, keys, order, partial, partial = false) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(orderExprs, childOutput)
      // max-heap by ranking order: head = current worst of the kept k
      val heapOrd = ord.asInstanceOf[Ordering[InternalRow]]
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap += row.copy()
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy()
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Dataset-level API for the operator. */
object TopK {
  /** Top `k` rows per distinct value of `keyCols`, ranked by `orderBy`
    * (column name, ascending?) pairs — make the order total (include a
    * tiebreak) for deterministic output.
    */
  def perKey(df: DataFrame, keyCols: Seq[String],
             orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.GraftShims
    val keys = keyCols.map(UnresolvedAttribute(_): Expression)
    val order = orderBy.map { case (c, asc) =>
      SortOrder(UnresolvedAttribute(c), if (asc) Ascending else Descending)
    }
    GraftShims.ofRows(df.sparkSession,
      TopKPerKey(k, keys, order, df.queryExecution.logical))
  }
}
