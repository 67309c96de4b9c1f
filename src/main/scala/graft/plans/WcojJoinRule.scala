package graft.plans

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** Optimizer rule that routes CYCLIC conjunctive join cores through the
  * worst-case-optimal Leapfrog operator — the planner integration the
  * reference centralizes in its join-implementation selection point
  * (`/root/reference/src/joining/JoinProcessor.java:65-68`, where the LFTJ
  * subsystem sits disabled behind the binary `OldJoin`). Before this rule,
  * `Leapfrog.join` only ran when a caller invoked the API directly; a user
  * writing the SAME triangle query as SQL text got the binary-join plan
  * whose intermediate (every wedge) exceeds the AGM bound the WCOJ never
  * materializes.
  *
  * Fires only when the rewrite is provably exact — the guards are
  * deliberately conservative, because Leapfrog computes SET semantics over
  * the variable columns:
  *
  *   1. the flattened inner-join graph has ≥3 leaves and every multi-leaf
  *      conjunct is deterministic (JoinGraph.extract);
  *   2. every output column of every leaf participates in some plain
  *      `a = b` equi-edge (no payload columns: Leapfrog emits exactly the
  *      join variables, and dropping null variable rows is then correct
  *      because an inner equi-join on those columns drops them too);
  *   3. each leaf is PROVABLY duplicate-free (a distinct-shaped Aggregate,
  *      a Deduplicate, or Filter/permutation-Project above one) — then bag
  *      semantics equal set semantics for the whole join: all leaf columns
  *      appear in the output, so an output binding fixes exactly one row
  *      per leaf;
  *   4. no leaf has two columns in the same equivalence class, classes are
  *      type-consistent across leaves (the joinTyped contract);
  *   5. the variable hypergraph {vars(leaf)} is CYCLIC under GYO reduction
  *      — acyclic graphs keep their left-deep plans (UCT already orders
  *      those well; WCOJ buys nothing there).
  *
  * The rewrite replaces the join subtree with `Leapfrog.joinTyped` over the
  * leaf fragments (grid sized by `Leapfrog.autoShares` from the leaves'
  * Catalyst size estimates, capped at `spark.graft.wcoj.maxCells`), a
  * Project restoring the original output attributes (exprId-preserving
  * aliases from the variable columns), and a residual Filter for any
  * conjunct that is not a consumed equi-edge. Leaves that share a
  * canonicalized plan (self-joins — the common cyclic case) are planned
  * ONCE and lazily localCheckpoint'ed, so the distinct-edge shuffle runs a
  * single time however many join roles consume it.
  *
  * Disable with `spark.graft.wcoj.enabled=false`.
  */
final class WcojJoinRule(spark: SparkSession) extends Rule[LogicalPlan] with Logging {

  import WcojJoinRule._

  private def enabled: Boolean =
    spark.conf.get("spark.graft.wcoj.enabled", "true").toBoolean

  private def maxCells: Int =
    spark.conf.get("spark.graft.wcoj.maxCells", "32").toInt

  private def maxVars: Int =
    spark.conf.get("spark.graft.wcoj.maxVars", "8").toInt

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case j: Join if j.getTagValue(PROCESSED).isEmpty && j.resolved =>
        try route(j).getOrElse { j.setTagValue(PROCESSED, true); j }
        catch {
          case NonFatal(e) =>
            logWarning(s"graft WCOJ route failed, keeping binary plan: $e")
            j.setTagValue(PROCESSED, true); j
        }
    }
  }

  private def route(root: Join): Option[LogicalPlan] = {
    val graph = JoinGraph.extract(root).getOrElse(return None)
    if (graph.leaves.size > 12) return None
    if (!graph.leaves.forall(provablyDistinct)) return None

    // union-find over attribute exprIds connected by plain equi-edges
    val parent = mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = { val ra = find(a); val rb = find(b)
      if (ra != rb) parent(ra) = rb }
    val edgeAttrs = mutable.HashMap.empty[Long, AttributeReference]
    graph.equiEdges.foreach { case (_, a, _, b) =>
      edgeAttrs(a.exprId.id) = a; edgeAttrs(b.exprId.id) = b
      union(a.exprId.id, b.exprId.id)
    }

    // guard 2: no payload columns — every leaf output is an edge attribute
    val leafOutputs: IndexedSeq[Seq[Attribute]] = graph.leaves.map(_.output)
    if (!leafOutputs.forall(_.forall(a => edgeAttrs.contains(a.exprId.id))))
      return None
    val classOfAttr: Map[Long, Long] =
      edgeAttrs.keys.map(id => id -> find(id)).toMap
    val classIds: Seq[Long] = classOfAttr.values.toSeq.distinct.sorted
    if (classIds.size > maxVars) return None

    // guard 4a: distinct classes within each leaf
    val leafClasses: IndexedSeq[Seq[Long]] =
      leafOutputs.map(_.map(a => classOfAttr(a.exprId.id)))
    if (!leafClasses.forall(cs => cs.distinct.size == cs.size)) return None
    // guard 4b: one type per class (joinTyped requires exact agreement)
    val attrsByClass: Map[Long, Seq[AttributeReference]] =
      edgeAttrs.values.toSeq.groupBy(a => classOfAttr(a.exprId.id))
    if (!attrsByClass.values.forall(_.map(_.dataType).distinct.size == 1))
      return None
    // a class could include an attribute of a leaf OUTSIDE this graph (it
    // cannot: equiEdges only relate attributes resolvable to graph leaves)

    // guard 5: cyclic hypergraph
    if (!isCyclic(leafClasses.map(_.toSet))) return None

    // variable order: highest-connectivity classes first (standard static
    // WCOJ heuristic); the per-cell DynamicLFTJ re-rank refines it locally
    val leavesPerClass: Map[Long, Int] =
      classIds.map(c => c -> leafClasses.count(_.contains(c))).toMap
    val orderedClasses: Seq[Long] =
      classIds.sortBy(c => (-leavesPerClass(c), c))
    val varName: Map[Long, String] =
      orderedClasses.zipWithIndex.map { case (c, i) => c -> s"__wcoj_v$i" }.toMap

    // plan each UNIQUE leaf once; self-join roles share the checkpoint
    val uniqueDf = mutable.HashMap.empty[LogicalPlan, DataFrame]
    def leafDf(l: LogicalPlan): DataFrame =
      uniqueDf.getOrElseUpdate(l.canonicalized,
        GraftShims.ofRows(spark, l).localCheckpoint(false))
    val rels: Seq[(DataFrame, Seq[String])] = graph.leaves.indices.map { i =>
      val names = leafClasses(i).map(varName)
      (leafDf(graph.leaves(i)).toDF(names: _*), names)
    }

    // grid sizing from the leaves' Catalyst size estimates — relative
    // magnitudes are all autoShares needs, and no job runs at plan time
    val relSizes: Seq[(Seq[String], Long)] = graph.leaves.indices.map { i =>
      val sz = graph.leaves(i).stats.sizeInBytes
      (leafClasses(i).map(varName),
        if (sz > BigInt(Long.MaxValue)) Long.MaxValue else sz.toLong.max(1L))
    }
    val varOrder = orderedClasses.map(varName)
    val shares = Leapfrog.autoShares(relSizes, varOrder, maxCells)

    val result =
      Leapfrog.joinTyped(spark, rels, varOrder, shares, dynamicOrder = true)
    // hint elimination ran batches ago, so the dictionary joins' broadcast
    // ResolvedHints would otherwise reach the planner un-lowered
    val spliced = org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
      result.queryExecution.analyzed)
    val varAttr: Map[Long, Attribute] =
      orderedClasses.zip(spliced.output).toMap

    // restore the original output attributes (same exprIds, so everything
    // above the join stays resolved)
    val projList: Seq[NamedExpression] = graph.originalOutput.map { a =>
      val cls = classOfAttr(a.exprId.id)
      Alias(varAttr(cls), a.name)(exprId = a.exprId, qualifier = a.qualifier)
    }
    val projected = Project(projList, spliced)
    // every conjunct that is not a consumed equi-edge (theta predicates,
    // null-safe equalities, stragglers) applies on top: all leaf columns
    // are in the projected output, so any of them is expressible here
    val residual = graph.conjuncts.filterNot {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        classOfAttr.get(a.exprId.id).exists(ca =>
          classOfAttr.get(b.exprId.id).contains(ca))
      case _ => false
    }
    val rewritten: LogicalPlan =
      residual.reduceOption(And).map(Filter(_, projected)).getOrElse(projected)

    val stats = RouteStats(graph.leaves.size, orderedClasses.size,
      varOrder, shares, shares.values.product)
    lastRoute = Some(stats)
    logInfo(s"graft WCOJ route: ${graph.leaves.size} leaves, " +
      s"${orderedClasses.size} vars, shares $shares")
    Some(rewritten)
  }

  /** Leaf shapes whose output rows are provably pairwise distinct. */
  private def provablyDistinct(p: LogicalPlan): Boolean = p match {
    case a: Aggregate =>
      // rows are unique per group; unique on the OUTPUT iff every grouping
      // expression survives into the output (covers SELECT DISTINCT, which
      // ReplaceDistinctWithAggregate lowers to grouping == output)
      val outExprs = a.aggregateExpressions.map {
        case Alias(c, _) => c
        case e => e
      }
      a.groupingExpressions.forall(g => outExprs.exists(_.semanticEquals(g)))
    case _: Deduplicate => true // unique on keys ⇒ unique as full rows
    case Filter(_, c) => provablyDistinct(c)
    case Project(pl, c)
        if pl.forall(_.isInstanceOf[Attribute]) &&
          c.outputSet.subsetOf(AttributeSet(pl.map(_.toAttribute))) =>
      provablyDistinct(c) // a permutation keeps distinctness; a drop may not
    case _ => false
  }

  /** GYO reduction: repeatedly delete variables private to one hyperedge
    * and hyperedges contained in another. Acyclic iff everything empties;
    * the stuck remainder is the cyclic core (triangle, k-cycle, clique). */
  private def isCyclic(hyper0: Seq[Set[Long]]): Boolean = {
    var hyper = hyper0.filter(_.nonEmpty)
    var changed = true
    while (changed && hyper.nonEmpty) {
      changed = false
      val counts = hyper.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
      val earless = hyper.map(_.filter(v => counts(v) > 1)).filter(_.nonEmpty)
      if (earless != hyper) { hyper = earless; changed = true }
      val pruned = hyper.zipWithIndex.filterNot { case (e, i) =>
        hyper.zipWithIndex.exists { case (f, j) =>
          e.subsetOf(f) && (if (e == f) j < i else true) && j != i
        }
      }.map(_._1)
      if (pruned != hyper) { hyper = pruned; changed = true }
    }
    hyper.nonEmpty
  }
}

object WcojJoinRule {
  private[plans] val PROCESSED = TreeNodeTag[Boolean]("graft.wcoj.processed")

  /** What the most recent route decided — the gate/spec observability
    * surface (same pattern as UctJoinReorderRule.RuleStats). */
  final case class RouteStats(nrRelations: Int, nrVars: Int,
      varOrder: Seq[String], shares: Map[String, Int], cells: Int)
  @volatile var lastRoute: Option[RouteStats] = None

  def clearStats(): Unit = lastRoute = None
}
