package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Registry-wide structural scale hygiene: NO query's physical plan may
  * contain an unguarded all-pairs join. A CartesianProduct or
  * BroadcastNestedLoopJoin is the canonical 100 TB plan killer — it is only
  * acceptable when one side is provably ≤1 row (a global aggregate or a
  * literal relation: the scalar-join idiom) or the query is the explicit
  * cross-join gate itself. Per-operator specs assert this for their own
  * plans; this sweep pins the invariant for EVERY registry entry, so a new
  * query can't silently ship an all-pairs plan.
  */
class PlanHygieneSpec extends SparkSpec {

  /** Queries whose plans legitimately contain an all-pairs node on
    * multi-row inputs, each with the reason the shape is intended. */
  private val allowed: Map[String, String] = Map(
    "q35_cross_join" -> "the explicit cartesian gate (25-row dims)",
    "q59_embedding_neardup" -> "row-guarded exact pair scan (<=65536 rows probed first)",
    "q105_semantic_clusters" -> "exact pair scan feeding clusters; bounded embeddings table",
    "q60_ann_bruteforce" -> "broadcast of the single filtered query vector (brute-force baseline)")

  private def subPlans(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: nested.flatMap(subPlans)
  }

  /** Bounded side: after unwrapping pass-through wrappers, the side's TOP
    * operator must itself be a global (groupless) aggregate — the
    * scalar-join build side — or a literal relation of ≤100 rows (a fixed
    * tier/config table: constant-size regardless of data scale, so a band
    * join against it is a map-side operation at 100 TB too). Searching the
    * whole subtree instead would bless a huge side that merely CONTAINS a
    * scalar subquery somewhere below. */
  private def oneRowSide(p: SparkPlan): Boolean = {
    import org.apache.spark.sql.execution._
    def unwrap(x: SparkPlan): SparkPlan = x match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case e: exchange.Exchange => unwrap(e.child)
      case r: exchange.ReusedExchangeExec => r // opaque: sizes unknown, not provably bounded
      case w: WholeStageCodegenExec => unwrap(w.child)
      case i: InputAdapter => unwrap(i.child)
      case c: ColumnarToRowExec => unwrap(c.child)
      case pr: ProjectExec => unwrap(pr.child)
      case f: FilterExec => unwrap(f.child)
      case s: SortExec => unwrap(s.child)
      case other => other
    }
    unwrap(p) match {
      case h: HashAggregateExec => h.groupingExpressions.isEmpty
      case s: SortAggregateExec => s.groupingExpressions.isEmpty
      case o: ObjectHashAggregateExec => o.groupingExpressions.isEmpty
      case l: LocalTableScanExec => l.rows.lengthCompare(100) <= 0
      case r: RDDScanExec => r.name.contains("OneRowRelation")
      case _ => false
    }
  }

  test("no registry query plans an unguarded all-pairs join") {
    val offenders = collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.registry.foreach { q =>
      val plan =
        try q.fn(spark, sf).queryExecution.executedPlan
        catch { case e: Throwable =>
          fail(s"${q.name}: plan construction failed: ${e.getMessage}")
        }
      val bad = subPlans(plan).collect {
        case c: CartesianProductExec
            if !oneRowSide(c.left) && !oneRowSide(c.right) => c
        case b: BroadcastNestedLoopJoinExec
            if !oneRowSide(b.left) && !oneRowSide(b.right) => b
      }
      if (bad.nonEmpty && !allowed.contains(q.name))
        offenders += s"${q.name}: ${bad.map(_.nodeName).mkString(", ")}"
    }
    assert(offenders.isEmpty,
      "unguarded all-pairs joins in:\n" + offenders.mkString("\n"))
  }
}
