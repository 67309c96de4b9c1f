package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bulk-iterative graph analytics as declarative join chains.
  *
  * The reference engine has no graph surface (its join subsystem —
  * /root/reference/src/joining — stops at relational results); this is
  * beyond-parity capability for corpus/link analysis at pretraining scale.
  *
  * Design notes for 100 TB:
  *  - Each PageRank iteration is ONE shuffle join of the edge list with the
  *    current rank vector plus a sum aggregation on dst — the standard
  *    message-passing formulation (Pregel's PageRank expressed relationally).
  *    Spark co-partitions the per-iteration joins on the same key, and AQE
  *    handles skewed hub nodes.
  *  - All arithmetic is EXACT integer math on a fixed-point scale: ranks are
  *    BIGINT "micro-rank" units, contributions use integer division, and
  *    BIGINT sums are associative/commutative — so the result is
  *    bit-identical regardless of partition count or merge order (double
  *    PageRank is not), and a SQL oracle can replay it term for term.
  *  - The iteration count is fixed and small (power iteration for ranking
  *    stabilizes the ORDER of nodes long before the values converge), so the
  *    plan is a finite declarative chain — no driver-side convergence loop
  *    reading intermediate results back.
  */
object Graph {

  /** `iters` rounds of damped PageRank over `edges` (cols `src`, `dst`;
    * duplicates removed) in exact fixed-point integer arithmetic.
    *
    * r_0(v) = scale div N;  for each round,
    * r_{k+1}(v) = (15·(scale div N)) div 100
    *              + (85·Σ_{(u,v)∈E} (r_k(u) div outdeg(u))) div 100.
    *
    * Dangling-node mass is dropped (deterministically) rather than
    * redistributed — both engines compute the identical sum. Returns
    * (node, rank). */
  def pageRankFixed(edges: DataFrame, iters: Int,
                    scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 16, "iters must be in [1, 16]")
    // freeze the (deduplicated) edge set once: every iteration re-reads it,
    // and at cluster scale this is the big, reused, co-partitioned input
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)
    val n = nodes.count() // single bounded driver scalar, parameterizes r0
    require(n > 0, "empty graph")
    val r0 = scale / n
    val tele = 15L * r0 / 100L
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.select(col("node"), lit(r0).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = ranks
        .join(outdeg, col("node") === col("src"))
        .select(col("node").as("u"), expr("rank div outdeg").as("c"))
        .join(e, col("src") === col("u"))
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("s"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(tele) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
    }
    ranks
  }

  /** Personalized PageRank in the same exact fixed-point discipline as
    * [[pageRankFixed]], with the teleport mass restricted to a SEED set —
    * the "similar to these" ranker (related-documents, link-based
    * recommendations, trust propagation) where global PageRank measures
    * popularity. Seeds split `scale` evenly (r_0 = scale div |S| on
    * seeds, 0 elsewhere); each round every node keeps 85% of its inbound
    * walk mass and seeds alone receive the 15% restart:
    *
    *   r_{k+1}(v) = [v ∈ S]·(15·(scale div |S|)) div 100
    *                + (85·Σ_{(u,v)∈E} (r_k(u) div outdeg(u))) div 100
    *
    * All-BIGINT, partition-order-independent, SQL-replayable. Same
    * per-round shape as pageRankFixed: one rank⋈outdeg join, one edge
    * join, one dst-sum. Nodes with rank 0 after the last round are
    * dropped (unreached). Input seeds: (node). Output: (node, rank). */
  def personalizedPageRankFixed(edges: DataFrame, seeds: DataFrame,
                                iters: Int,
                                scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 16, "iters must be in [1, 16]")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(false)
    val s0 = seeds.select(col("node").cast("long").as("node")).distinct()
      .localCheckpoint(false)
    val nSeeds = s0.count() // bounded driver scalar, parameterizes r0
    require(nSeeds > 0, "personalized PageRank needs at least one seed")
    val r0 = scale / nSeeds
    val tele = 15L * r0 / 100L
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = s0.select(col("node"), lit(r0).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = ranks
        .join(outdeg, col("node") === col("src"))
        .select(col("node").as("u"), expr("rank div outdeg").as("c"))
        .join(e, col("src") === col("u"))
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("s"))
      ranks = contribs.join(s0.withColumn("__seed", lit(1)), Seq("node"),
          "full_outer")
        .select(col("node"),
          (when(col("__seed").isNotNull, tele).otherwise(0L) +
            expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
        .where(col("rank") > 0)
        .localCheckpoint(false)
    }
    ranks
  }

  /** `rounds` peeling rounds of k-core decomposition over undirected
    * `edges` (cols `src`, `dst`): each round computes every node's degree,
    * drops nodes with degree < k, and restricts the edge set to surviving
    * endpoints — the standard bulk-synchronous peel (Matula/Beck's
    * algorithm truncated to a fixed depth, the same
    * finite-declarative-chain trade PageRank above makes: a fixed small
    * round count unrolls into one plan, no driver-side convergence loop).
    * Most of the non-core mass peels in the first rounds on real graphs;
    * callers needing the exact core raise `rounds` until a spec confirms a
    * fixed point.
    *
    * Returns (node, deg) for nodes still carrying an edge after the last
    * restriction, with degrees measured in that final restricted graph.
    *
    * 100 TB shape: each round is one degree aggregation (shuffle on node)
    * plus two semi-joins of the edge list against the survivor set — all
    * hash-partitioned on node ids, no broadcast assumptions (the survivor
    * set starts as large as the node set). Integer-only: deterministic at
    * any partitioning, and a SQL oracle replays every round verbatim. */
  def kCoreFixed(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 8, "k >= 1, rounds in [1, 8]")
    var e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct().localCheckpoint(false)
    def degrees(g: DataFrame): DataFrame =
      g.select(col("src").as("node")).union(g.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).where(col("deg") >= k).select("node")
      e = e.join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .select("src", "dst")
    }
    degrees(e)
  }

  /** Fixed-round BFS from a source set over an undirected edge list:
    * (node, dist) for every node within `rounds` hops of a source,
    * dist = exact hop distance (min over paths). Each round is ONE
    * neighbor join + min-aggregation over the CURRENT frontier table —
    * the bulk-synchronous BFS; the plan is a finite join chain, so the
    * DuckDB oracle unrolls it round-for-round (the q175/q178 pattern).
    * Integer-only: partition-order-independent by construction. */
  def bfsFixed(edges: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 12, s"rounds in [1,12], got $rounds")
    val e = edges.select(col("src").cast("long").as("a"),
      col("dst").cast("long").as("b"))
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v")))
    var d = sources.select(col("node").cast("long").as("node"))
      .distinct().withColumn("dist", lit(0L))
    for (_ <- 1 to rounds) {
      d = d.unionAll(
          sym.join(d.withColumnRenamed("node", "u"), Seq("u"))
            .select(col("v").as("node"), (col("dist") + 1).as("dist")))
        .groupBy("node").agg(min("dist").as("dist"))
        // bound lineage across rounds (the q175/duplicateClusters discipline)
        .localCheckpoint(false)
    }
    d
  }

  /** Fixed-round k-truss peeling: an edge survives a round iff it closes
    * at least k−2 triangles with OTHER surviving edges (its support);
    * peeling repeats `rounds` times (true k-truss iterates to a fixed
    * point; fixed rounds keep the plan statically analyzable, and real
    * graphs shed the bulk of non-truss edges in the first 2–3 peels).
    * The cohesive-subgraph filter that is robust where [[kCoreFixed]]
    * (degree-based) is fooled by hub spokes.
    *
    * Per round: one wedge enumeration (adjacency self-join on the center
    * node — Σdeg² work, the [[localClusteringCoeff]] shape, hash-keyed,
    * never all-pairs), one semi-join of wedges against the edge set, one
    * (edge → support) count, one filter. Lineage checkpoint-bounded per
    * round. Input (src, dst); output the surviving canonical (a < b)
    * edges with their last-round support. */
  def ktrussFixed(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    require(rounds >= 1 && rounds <= 8, s"rounds in [1,8], got $rounds")
    // freeze the canonicalized edge set once: round 1 references it five
    // times (adj twice, the wedge self-join, the support join)
    var e = edges.select(
        least(col("src").cast("long"), col("dst").cast("long")).as("a"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
      .where(col("a") =!= col("b")).distinct().localCheckpoint(false)
    var last: DataFrame = null
    for (_ <- 1 to rounds) {
      val adj = e.select(col("a").as("v"), col("b").as("w"))
        .unionAll(e.select(col("b").as("v"), col("a").as("w")))
      val wedges = adj.as("x").join(adj.as("y"), Seq("v"))
        .where(col("x.w") < col("y.w"))
        .select(col("x.w").as("a"), col("y.w").as("b"))
      val support = wedges.join(e, Seq("a", "b"))
        .groupBy("a", "b").agg(count(lit(1)).as("support"))
      last = support.where(col("support") >= k - 2).localCheckpoint(false)
      e = last.select("a", "b")
    }
    last
  }

  /** Fixed-round weighted shortest paths (Bellman–Ford relaxation): the
    * weighted companion to [[bfsFixed]]'s hop distances. Each round
    * relaxes every edge once — dist(v) = min(dist(v), dist(u) + w(u,v))
    * over the symmetrized weighted edges — so after `rounds` rounds
    * every shortest path of ≤ `rounds` edges is exact, in pure BIGINT
    * arithmetic (weights are integers; no float accumulation). One
    * frontier⋈edges hash join + one min aggregation per round,
    * checkpoint-bounded lineage — the q175/q222 shape with a weight
    * column. Inputs: edges (src, dst, w ≥ 0), sources (node). Output:
    * (node, dist) for nodes reached within the horizon. */
  def ssspFixed(edges: DataFrame, sources: DataFrame,
                rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 12, s"rounds in [1,12], got $rounds")
    val e = edges.select(col("src").cast("long").as("a"),
      col("dst").cast("long").as("b"), col("w").cast("long").as("w"))
    val sym = e.select(col("a").as("u"), col("b").as("v"), col("w"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v"), col("w")))
      .localCheckpoint(false)
    var d = sources.select(col("node").cast("long").as("node"))
      .distinct().withColumn("dist", lit(0L))
    for (_ <- 1 to rounds) {
      d = d.unionAll(
          sym.join(d.withColumnRenamed("node", "u"), Seq("u"))
            .select(col("v").as("node"), (col("dist") + col("w")).as("dist")))
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(false)
    }
    d
  }

  /** Fixed-round semi-supervised label propagation: seed nodes carry a
    * clamped label; every round, EVERY non-seed node synchronously adopts
    * the majority label among its currently-labeled neighbors (tie →
    * smallest label; nodes with no labeled neighbor stay unlabeled).
    * Deterministic by construction — the argmax runs on the bounded-heap
    * TopKPerKey operator with a total (count desc, label asc) order, so
    * partition order never matters and a SQL oracle replays each unrolled
    * round exactly.
    *
    * Per round: ONE hash join of the symmetrized edges against the
    * (node, label) frontier + one (node, label) count aggregation + one
    * bounded-heap argmax — all shuffle-keyed on node, map-side partial,
    * no global sort. Lineage is checkpoint-bounded per round. Fixed
    * `rounds` (like [[bfsFixed]]/[[pageRankFixed]]) keeps the plan
    * statically analyzable; LPA in practice converges in a handful of
    * rounds. Inputs: edges (src, dst), seeds (node, label). Output:
    * (node, label) for every labeled node after `rounds`. */
  def labelPropagationFixed(edges: DataFrame, seeds: DataFrame,
                            rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 12, s"rounds in [1,12], got $rounds")
    val e = edges.select(col("src").cast("long").as("a"),
      col("dst").cast("long").as("b"))
    // freeze the symmetrized edge list once — every round's vote join
    // re-reads it (the pageRankFixed discipline)
    val sym = e.select(col("a").as("v"), col("b").as("w"))
      .unionAll(e.select(col("b").as("v"), col("a").as("w")))
      .localCheckpoint(false)
    val s0 = seeds.select(col("node").cast("long").as("node"),
      col("label").cast("long").as("label")).distinct()
    var lab = s0
    for (_ <- 1 to rounds) {
      val votes = sym
        .join(lab.withColumnRenamed("node", "w"), Seq("w"))
        .groupBy(col("v"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val picked = graft.plans.TopK.perKey(votes, Seq("v"),
          Seq(("cnt", false), ("label", true)), 1)
        .select(col("v").as("node"), col("label"))
        .join(s0.select(col("node")), Seq("node"), "left_anti")
      lab = s0.unionAll(picked).localCheckpoint(false)
    }
    lab
  }

  /** Newman modularity Q of a node partition over an undirected edge
    * list: Q = Σ_c (e_c/m − (d_c/2m)²) — the one-number quality audit
    * for any community assignment ([[labelPropagationFixed]], LSH
    * clusters, domain grouping). e_c (intra-community edges), d_c
    * (community degree mass) and m are exact BIGINTs from two hash
    * joins + two aggregations; the per-community float terms are summed
    * in an array_sort-then-fold (the PSI/q239 fixed-order discipline) so
    * the result is partition-order-independent and SQL-replayable.
    * Nodes absent from `assign` become singleton communities (community
    * = node id + `singletonOffset`), so Q is over the WHOLE graph, not a
    * labeled subgraph. Output one row: (m, n_comms, modularity). */
  def modularity(edges: DataFrame, assign: DataFrame,
                 singletonOffset: Long = 1L << 40): DataFrame = {
    val e = edges.select(
        least(col("src").cast("long"), col("dst").cast("long")).as("a"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
      .where(col("a") =!= col("b")).distinct().localCheckpoint(false)
    // one community per node, enforced: duplicate assignment rows would
    // silently double-count every touching edge in m/e_c/d_c — collapse
    // deterministically to the smallest community id
    val lab = assign.select(col("node").cast("long").as("node"),
        col("community").cast("long").as("community"))
      .groupBy("node").agg(min("community").as("community"))
    val nodes = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node"))).distinct()
    val full = nodes.join(lab, Seq("node"), "left")
      .select(col("node"), coalesce(col("community"),
        col("node") + singletonOffset).as("c"))
    val withCa = e.join(full.select(col("node").as("a"), col("c").as("ca")),
      Seq("a"))
    val tagged = withCa.join(
      full.select(col("node").as("b"), col("c").as("cb")), Seq("b"))
    // ONE pass over the tagged edges (r15): the former m/e_c/d_c trio read
    // `tagged` four times (count, intra filter, and both union legs), so
    // the two label joins re-executed per consumer. Exploding each edge
    // into its two community endpoints — the intra flag only on the ca
    // side, so an intra edge still counts ONCE — yields d_c (rows per c),
    // e_c (flag sum) and, because every edge contributes exactly 2 to
    // Σd_c, m = Σd_c div 2, all from a single aggregation. Same exact
    // BIGINTs as before, and the per-community float terms still fold in
    // array_sort order with m applied per term — bit-identical Q.
    val perC = tagged.select(explode(array(
        struct(col("ca").as("c"),
          when(col("ca") === col("cb"), 1L).otherwise(0L).as("e")),
        struct(col("cb").as("c"), lit(0L).as("e")))).as("__x"))
      .select(col("__x.c").as("c"), col("__x.e").as("e"))
      .groupBy("c").agg(count(lit(1)).as("d_c"), sum(col("e")).as("e_c"))
    perC.groupBy()
      .agg(expr("sum(d_c) div 2").as("m"), count(lit(1)).as("n_comms"),
        collect_list(struct(col("c"), col("e_c"), col("d_c"))).as("__l"))
      .select(col("m"), col("n_comms"),
        round(aggregate(
          transform(array_sort(col("__l")),
            z => z.getField("e_c").cast("double") / col("m") -
              (z.getField("d_c").cast("double") / (lit(2) * col("m"))) *
              (z.getField("d_c").cast("double") / (lit(2) * col("m")))),
          lit(0.0), (a, t) => a + t), 6).as("modularity"))
  }

  /** Connected components over an undirected edge list: (node, component)
    * for every endpoint, component = smallest reachable node id. Delegates
    * to the guarded-hybrid labelling of
    * [[graft.operators.TextDedup.duplicateClusters]] (driver union-find
    * under the edge guard — a component graph is usually a sliver of the
    * data — pointer-jumping min-label propagation above it: one shuffle
    * join per round, rounds ≈ log diameter). The q221 gate verifies
    * against a DuckDB recursive-CTE closure. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("a_id"),
      col("dst").cast("long").as("b_id"))
    val nodes = e.select(col("a_id").as("node"))
      .unionAll(e.select(col("b_id").as("node"))).distinct()
    graft.operators.TextDedup.duplicateClusters(nodes, "node", e)
      .withColumnRenamed("cluster", "component")
  }

  /** Local clustering coefficient per node over an undirected, distinct,
    * loop-free edge list (src < dst): cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)),
    * tri(v) = closed wedges at v. The triangle-density quality signal for
    * graph-structured training data (and the per-node face of q155's WCOJ
    * triangle count).
    *
    * Wedges enumerate as adj ⋈ adj through the shared endpoint with p < q
    * (each wedge once), closed by an equi-join against the canonical edge
    * list — all hash-keyed, never an all-pairs product; cost Σ_v deg(v)²,
    * hub mitigation = the same degree-threshold split as
    * [[neighborOverlap]]. Counts are exact integers; the single division
    * is the only float. Output: (node, deg, tri, cc) for deg ≥ 2. */
  def localClusteringCoeff(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("a"),
      col("dst").cast("long").as("b"))
    val adj = e.select(col("a").as("v"), col("b").as("w"))
      .unionAll(e.select(col("b").as("v"), col("a").as("w")))
    val deg = adj.groupBy("v").agg(count(lit(1)).as("deg"))
    val wedge = adj.toDF("v", "p").join(adj.toDF("v", "q"), Seq("v"))
      .where(col("p") < col("q"))
    val tri = wedge.join(e, col("p") === col("a") && col("q") === col("b"))
      .groupBy("v").agg(count(lit(1)).as("tri"))
    deg.join(tri, Seq("v"), "left")
      .where(col("deg") >= 2)
      .select(col("v").as("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        round((lit(2L) * coalesce(col("tri"), lit(0L))).cast("double") /
          (col("deg") * (col("deg") - 1)), 6).as("cc"))
  }

  /** Neighborhood-overlap link features: for every undirected edge
    * (src < dst in `edges`, assumed distinct and loop-free), the number of
    * COMMON neighbors and the neighborhood-UNION size — the exact-integer
    * numerator/denominator of Jaccard link prediction (common/uni is the
    * score; the division is left to the caller so cross-engine float
    * formatting can't perturb a comparison).
    *
    * Output: (src, dst, common, uni).
    *
    * 100 TB shape: adjacency is the edge list doubled (map-only); degrees
    * are one hash aggregation; common-neighbor counting is the standard
    * wedge enumeration — adj ⋈ adj through the shared endpoint — whose
    * cost is Σ_(u,v)∈E deg(u)·deg(v) candidate wedges, all hash-keyed
    * shuffles with map-side partial counts, never an all-pairs product.
    * Power-law hubs concentrate that sum; at cluster scale the mitigation
    * is the usual degree-threshold split (exact path for low-degree,
    * hub-broadcast for the head), which composes with this same plan. */
  def neighborOverlap(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val adj = e.select(col("src").as("u"), col("dst").as("w"))
      .unionAll(e.select(col("dst").as("u"), col("src").as("w")))
    val deg = adj.groupBy("u").agg(count(lit(1)).as("d"))
    val com = e
      .join(adj.toDF("au", "aw"), col("au") === col("src"))
      .join(adj.toDF("bu", "bw"), col("bu") === col("dst") &&
        col("bw") === col("aw"))
      .groupBy("src", "dst").agg(count(lit(1)).as("common"))
    e.join(deg.toDF("u1", "d1"), col("u1") === col("src"))
      .join(deg.toDF("u2", "d2"), col("u2") === col("dst"))
      .join(com, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("common"), lit(0L)).as("common"),
        (col("d1") + col("d2") - coalesce(col("common"), lit(0L))).as("uni"))
  }
}
