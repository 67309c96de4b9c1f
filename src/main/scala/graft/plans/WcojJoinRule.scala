package graft.plans

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Filter, Generate, Join, LogicalPlan, Project}
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
  *   3. leaves PROVABLY duplicate-free (a distinct-shaped Aggregate, a
  *      Deduplicate, or Filter/permutation-Project above one) join as-is —
  *      set semantics equal bag semantics because an output binding fixes
  *      exactly one row per leaf. Every OTHER leaf gets exact BAG
  *      handling: it is wrapped `GROUP BY *` + count, the count rides the
  *      core join as a share-1 singleton variable (functionally dependent
  *      on the leaf's columns, so the trie never branches on it), and the
  *      binding stream is replicated by the product of its roles' counts
  *      via `ReplicateRows` — the multiplicity mechanics of Spark's own
  *      INTERSECT ALL lowering;
  *   4. no leaf has two columns in the same equivalence class, classes are
  *      type-consistent across leaves (the joinTyped contract);
  *   5. the variable hypergraph {vars(leaf)} is CYCLIC under GYO reduction
  *      — acyclic graphs keep their left-deep plans (UCT already orders
  *      those well; WCOJ buys nothing there).
  *
  * Only the GYO-STUCK residue (the cyclic core) is routed; the ears GYO
  * sheds — dimension legs, chains hanging off the cycle — are folded back
  * on top as ordinary binary joins (connected-first, each conjunct at its
  * earliest valid position), so a triangle census joined out to dimension
  * tables still gets the WCOJ for the cycle and hash joins for the rest.
  * Guards 2–4 apply to the core leaves only.
  *
  * The rewrite replaces the cyclic core with `Leapfrog.joinTyped` over the
  * leaf fragments (grid sized by `Leapfrog.autoShares` from the leaves'
  * Catalyst size estimates, capped at `spark.graft.wcoj.maxCells`), a
  * Project restoring the original output attributes (exprId-preserving
  * aliases from the variable columns), and a residual Filter for any
  * intra-core conjunct that is not a consumed equi-edge. Leaves that share
  * a canonicalized plan (self-joins — the common cyclic case) are planned
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

  /** Cores whose total estimated input is below this stay on their binary
    * plans. Default 0 = route every qualifying core: the fixed overhead on
    * a tiny core is sub-second, and a deterministic rewrite is worth more
    * than a heuristic skip at the gate scales this repo tests. Production
    * sessions running many micro motif queries can set a floor (bytes) so
    * those keep their codegen broadcast-hash plans. */
  private def minCoreBytes: Long =
    spark.conf.get("spark.graft.wcoj.minCoreBytes", "0").toLong

  /** Ceiling on a core leaf's estimated size for the dictionary joins of
    * non-integral variables to carry a broadcast hint. A dictionary is one
    * variable's distinct-value set — bounded by its relations — so beyond
    * this the encode/decode joins fall back to shuffle equi-joins instead
    * of risking an executor-breaking broadcast of a huge domain. */
  private def broadcastDictMaxBytes: Long =
    spark.conf.get("spark.graft.wcoj.broadcastDictMaxBytes",
      (64L << 20).toString).toLong

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

    // classes for EVERY leaf output column: equi-merged for edge
    // attributes, fresh (negative-id) singletons for the rest — the
    // singletons only exist so GYO sees the full hypergraph structure
    val leafOutputs: IndexedSeq[Seq[Attribute]] = graph.leaves.map(_.output)
    val classOfAttr = mutable.HashMap.empty[Long, Long]
    edgeAttrs.keys.foreach(id => classOfAttr(id) = find(id))
    var nextSingleton = -1L
    leafOutputs.flatten.foreach { a =>
      if (!classOfAttr.contains(a.exprId.id)) {
        classOfAttr(a.exprId.id) = nextSingleton; nextSingleton -= 1
      }
    }
    val leafClasses: IndexedSeq[Seq[Long]] =
      leafOutputs.map(_.map(a => classOfAttr(a.exprId.id)))

    // guard 5 first: the GYO-stuck residue IS the cyclic core; everything
    // else (dimension ears, chains) stays binary and is re-attached below
    val core: Set[Int] = gyoCore(leafClasses.map(_.toSet))
    if (core.size < 3) return None

    // guards 2-4, on the CORE leaves only:
    // leaves that are NOT provably distinct get BAG-SEMANTICS handling: a
    // groupBy-all-columns count wraps the leaf, the count rides through the
    // core join as a functionally-dependent singleton variable, and the
    // binding stream is replicated by the product of counts afterwards —
    // the same multiplicity mechanics Spark's own INTERSECT ALL lowering
    // uses (RewriteIntersectAll + ReplicateRows)
    val needCount: Set[Int] = core.filterNot(i => provablyDistinct(graph.leaves(i)))
    // every core column covered by a plain equi-edge (to ANY leaf): some
    // inner equi-join consumes the column, so Leapfrog dropping its null
    // rows early is exact — a TRUE payload column (no edge) bails
    if (!core.forall(i =>
        leafOutputs(i).forall(a => edgeAttrs.contains(a.exprId.id))))
      return None
    // no two columns of one core leaf in the same class
    if (!core.forall(i => leafClasses(i).distinct.size == leafClasses(i).size))
      return None
    // one type per class across the core (the joinTyped contract)
    val coreSeq = core.toSeq.sorted
    val coreAttrs = coreSeq.flatMap(i => leafOutputs(i))
    val typesByClass = coreAttrs.groupBy(a => classOfAttr(a.exprId.id))
    if (!typesByClass.values.forall(_.map(_.dataType).distinct.size == 1))
      return None
    val coreClassIds: Seq[Long] =
      coreAttrs.map(a => classOfAttr(a.exprId.id)).distinct.sorted
    if (coreClassIds.size > maxVars) return None

    // variable order: highest-connectivity classes first (standard static
    // WCOJ heuristic); the per-cell DynamicLFTJ re-rank refines it locally.
    // Classes with one core occurrence (keys joining OUT to a dimension)
    // order last — they constrain nothing inside the core.
    val coreLeavesPerClass: Map[Long, Int] = coreClassIds.map(c =>
      c -> coreSeq.count(i => leafClasses(i).contains(c))).toMap
    val orderedClasses: Seq[Long] =
      coreClassIds.sortBy(c => (-coreLeavesPerClass(c), c))
    val varName: Map[Long, String] =
      orderedClasses.zipWithIndex.map { case (c, i) => c -> s"__wcoj_v$i" }.toMap

    // plan each UNIQUE core leaf once; self-join roles share the checkpoint.
    // Bag leaves are wrapped distinct+count BEFORE planning, so roles of
    // the same leaf share one aggregated checkpoint; the count column's
    // variable name differs per ROLE (each role contributes its own
    // multiplicity factor).
    val uniqueDf = mutable.HashMap.empty[LogicalPlan, DataFrame]
    def leafDf(l: LogicalPlan, counted: Boolean): DataFrame =
      uniqueDf.getOrElseUpdate(l.canonicalized, {
        val plan =
          if (!counted) l
          else Aggregate(l.output, l.output :+ Alias(
            org.apache.spark.sql.catalyst.expressions.aggregate.Count(
              org.apache.spark.sql.catalyst.expressions.Literal(1))
              .toAggregateExpression(), "__wcoj_mult")(), l)
        GraftShims.ofRows(spark, plan).localCheckpoint(false)
      })
    def multVar(role: Int): String = s"__wcoj_m$role"
    val rels: Seq[(DataFrame, Seq[String])] = coreSeq.map { i =>
      val counted = needCount.contains(i)
      val names = leafClasses(i).map(varName) ++
        (if (counted) Seq(multVar(i)) else Nil)
      (leafDf(graph.leaves(i), counted).toDF(names: _*), names)
    }

    // grid sizing from the leaves' Catalyst size estimates — relative
    // magnitudes are all autoShares needs, and no job runs at plan time
    val relSizes: Seq[(Seq[String], Long)] = coreSeq.map { i =>
      val sz = graph.leaves(i).stats.sizeInBytes
      (leafClasses(i).map(varName),
        if (sz > BigInt(Long.MaxValue)) Long.MaxValue else sz.toLong.max(1L))
    }
    if (relSizes.map(_._2).sum < minCoreBytes) return None
    // grid shares only size the class variables; the count variables are
    // share-1 trailers (functionally dependent, so they constrain nothing)
    val classVarOrder = orderedClasses.map(varName)
    val varOrder = classVarOrder ++ coreSeq.filter(needCount).map(multVar)
    val shares = Leapfrog.autoShares(relSizes, classVarOrder, maxCells)

    val result =
      Leapfrog.joinTyped(spark, rels, varOrder, shares, dynamicOrder = true,
        broadcastDicts = relSizes.map(_._2).max <= broadcastDictMaxBytes)
    // hint elimination ran batches ago, so the dictionary joins' broadcast
    // ResolvedHints would otherwise reach the planner un-lowered
    val spliced = org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
      result.queryExecution.analyzed)
    val varAttr: Map[Long, Attribute] =
      orderedClasses.zip(spliced.output).toMap
    val multAttr: Map[Int, Attribute] =
      coreSeq.filter(needCount).zip(spliced.output.drop(orderedClasses.size)).toMap

    var plan: LogicalPlan =
      if (needCount.isEmpty) {
        // pure set semantics: restore the core columns under their original
        // exprIds, so every conjunct and operator above stays resolved
        val coreProj: Seq[NamedExpression] = coreAttrs.map { a =>
          Alias(varAttr(classOfAttr(a.exprId.id)), a.name)(
            exprId = a.exprId, qualifier = a.qualifier)
        }
        Project(coreProj, spliced)
      } else {
        // bag semantics: each distinct binding is replicated by the product
        // of its roles' multiplicities (exact — counts are per-leaf-row and
        // functionally dependent on the binding)
        import org.apache.spark.sql.catalyst.expressions.{Multiply, ReplicateRows}
        val dataCols: Seq[Alias] = coreAttrs.map { a =>
          Alias(varAttr(classOfAttr(a.exprId.id)), a.name)()
        }
        val total = Alias(coreSeq.filter(needCount).map(multAttr)
          .map(_.asInstanceOf[Expression]).reduce(Multiply(_, _)), "__wcoj_total")()
        val genChild = Project(dataCols :+ total, spliced)
        val generator = ReplicateRows(
          (total.toAttribute +: dataCols.map(_.toAttribute)).map(_.asInstanceOf[Expression]))
        Generate(generator,
          unrequiredChildIndex = genChild.output.indices,
          outer = false, qualifier = None,
          generatorOutput = coreAttrs.map(_.toAttribute),
          genChild)
      }

    // conjunct disposition: equi-edges BETWEEN core columns of one class
    // are consumed by the join itself; other intra-core conjuncts (theta,
    // null-safe) filter the core result; everything touching a non-core
    // leaf attaches while folding the remainder back in
    val coreAttrIds = coreAttrs.map(_.exprId.id).toSet
    var remaining = graph.conjuncts.filterNot {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        coreAttrIds.contains(a.exprId.id) && coreAttrIds.contains(b.exprId.id) &&
          classOfAttr(a.exprId.id) == classOfAttr(b.exprId.id)
      case _ => false
    }
    val (coreResidual, rest0) =
      remaining.partition(c => graph.referencedLeaves(c).subsetOf(core))
    if (coreResidual.nonEmpty) plan = Filter(coreResidual.reduce(And), plan)
    remaining = rest0

    // fold the acyclic remainder back as ordinary binary joins, connected
    // leaves first (UCT is skipped on these rebuilt joins — the core leaf
    // is an RDD scan whose sampling would EXECUTE the Leapfrog at plan
    // time — but the AQE runtime switch still reorders them from observed
    // stats if the authored fold order turns out wrong)
    var bound = core
    while (bound.size < graph.leaves.size) {
      val cands = graph.leaves.indices.filterNot(bound)
      val conn = cands.filter(i => graph.connected(bound, i))
      val next = (if (conn.nonEmpty) conn else cands).min
      bound += next
      val (applicable, rest) =
        remaining.partition(c => graph.referencedLeaves(c).subsetOf(bound))
      val j = Join(plan, graph.leaves(next), org.apache.spark.sql.catalyst.plans.Inner,
        applicable.reduceOption(And),
        org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE)
      j.setTagValue(PROCESSED, true)
      j.setTagValue(UctJoinReorderRule.PROCESSED, true)
      plan = j
      remaining = rest
    }
    if (remaining.nonEmpty) plan = Filter(remaining.reduce(And), plan)
    val rewritten: LogicalPlan = Project(graph.originalOutput, plan)

    val stats = RouteStats(core.size, orderedClasses.size,
      varOrder, shares, shares.values.product, graph.leaves.size)
    lastRoute = Some(stats)
    logInfo(s"graft WCOJ route: core ${core.size} of ${graph.leaves.size} " +
      s"leaves, ${orderedClasses.size} vars, shares $shares")
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

  /** GYO reduction over (leaf index → variable classes): repeatedly delete
    * variables private to one hyperedge and hyperedges contained in
    * another. Acyclic iff everything empties; the STUCK residue's leaf
    * indices are the cyclic core (triangle, k-cycle, clique) — the ears it
    * shed are the acyclic remainder that stays in binary joins. */
  private def gyoCore(hyper0: IndexedSeq[Set[Long]]): Set[Int] = {
    val hyper = mutable.LinkedHashMap.empty[Int, Set[Long]]
    hyper0.zipWithIndex.foreach { case (e, i) => if (e.nonEmpty) hyper(i) = e }
    var changed = true
    while (changed && hyper.nonEmpty) {
      changed = false
      val counts = mutable.HashMap.empty[Long, Int]
      hyper.values.foreach(_.foreach(v =>
        counts(v) = counts.getOrElse(v, 0) + 1))
      hyper.keys.toSeq.foreach { i =>
        val e = hyper(i)
        val e2 = e.filter(v => counts(v) > 1)
        if (e2 != e) {
          changed = true
          if (e2.isEmpty) hyper.remove(i) else hyper(i) = e2
        }
      }
      val keys = hyper.keys.toSeq
      keys.foreach { i =>
        if (hyper.contains(i)) {
          val e = hyper(i)
          val absorbed = keys.exists(j => j != i && hyper.contains(j) &&
            e.subsetOf(hyper(j)) && (hyper(j) != e || j < i))
          if (absorbed) { hyper.remove(i); changed = true }
        }
      }
    }
    hyper.keySet.toSet
  }
}

object WcojJoinRule {
  private[plans] val PROCESSED = TreeNodeTag[Boolean]("graft.wcoj.processed")

  /** What the most recent route decided — the gate/spec observability
    * surface (same pattern as UctJoinReorderRule.RuleStats). nrRelations
    * counts the CORE leaves routed through Leapfrog; nrGraphLeaves the
    * whole flattened join (equal when the entire graph is the core). */
  final case class RouteStats(nrRelations: Int, nrVars: Int,
      varOrder: Seq[String], shares: Map[String, Int], cells: Int,
      nrGraphLeaves: Int = 0)
  @volatile var lastRoute: Option[RouteStats] = None

  def clearStats(): Unit = lastRoute = None
}
