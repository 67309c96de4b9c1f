package graft

import org.apache.spark.sql.functions.col

class GraphSpec extends SparkSpec {

  test("pageRankFixed matches the hand-computed fixed-point recurrence") {
    val session = spark
    import session.implicits._
    // 1→2, 2→1, 2→3; node 3 dangles (its mass drops, deterministically).
    // scale=3000, N=3: r0=1000, tele = 15·1000/100 = 150.
    // iter1: r(1)=150+85·500/100=575, r(2)=150+85·1000/100=1000, r(3)=575
    // iter2: contribs — 1 sends 575, 2 sends 500 to each of {1,3}:
    //        r(1)=150+425=575, r(2)=150+(85·575) div 100=638, r(3)=575
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val got = operators.Graph.pageRankFixed(edges, iters = 2, scale = 3000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 575L, 2L -> 638L, 3L -> 575L))
  }

  test("pageRankFixed is partition-order-independent (exact integer math)") {
    val session = spark
    import session.implicits._
    val edges = (0L until 400L).map(i => (i % 23, (i * 7 + 3) % 23))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val a = operators.Graph.pageRankFixed(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = operators.Graph.pageRankFixed(edges.repartition(7), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(_ > 0))
  }

  test("q175 gate: every graph node surfaces with a positive rank") {
    val rows = run("q175_pagerank").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("pr") > 0))
    // rank mass stays under the fixed-point scale: dangling mass is
    // dropped, never duplicated
    assert(rows.map(_.getAs[Long]("pr")).sum <= 1000000000000L)
  }

  test("kCoreFixed peels the tail and keeps the clique (hand graph)") {
    val session = spark
    import session.implicits._
    // 4-clique {1,2,3,4} with a tail 4-5-6. k=2:
    // round 1 — degrees 1:3 2:3 3:3 4:4 5:2 6:1 → node 6 peels;
    // round 2 — 5's degree drops to 1 → 5 peels; the clique is the 2-core.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val got = operators.Graph.kCoreFixed(edges, k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"expected the bare 4-clique, got $got")
    // one round earlier the tail node 5 is still present — fixed-round
    // semantics, not fixed-point
    val r1 = operators.Graph.kCoreFixed(edges, k = 2, rounds = 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(r1 == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("kCoreFixed is partition-order-independent and drops self-loops/dups") {
    val session = spark
    import session.implicits._
    // nonlinear generator: a linear map mod p yields only p distinct edges
    // (every node degree ~2, so any 3-core is empty); quadratics spread
    val edges = (0L until 600L).map(i => ((i * i + 3 * i) % 31, (i * i * i + 7) % 31))
      .toDF("src", "dst")
    val a = operators.Graph.kCoreFixed(edges, k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = operators.Graph.kCoreFixed(edges.repartition(9), k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("q178 gate: peeling leaves a non-empty residual graph") {
    val rows = run("q178_kcore").collect()
    assert(rows.nonEmpty, "the mod-997 graph should retain a 3-core at sf0.001+")
  }

  test("neighborOverlap counts common neighbors and union sizes (hand graph)") {
    val session = spark
    import session.implicits._
    // triangle 1-2-3 plus pendant 3-4:
    //   (1,2): N(1)={2,3}, N(2)={1,3} → common {3}=1, uni 2+2-1=3
    //   (1,3): N(3)={1,2,4}          → common {2}=1, uni 2+3-1=4
    //   (2,3):                         common {1}=1, uni 2+3-1=4
    //   (3,4): N(4)={3}              → common 0,      uni 3+1-0=4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    def runIt(e: org.apache.spark.sql.DataFrame) =
      operators.Graph.neighborOverlap(e)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
    val got = runIt(edges)
    assert(got == Map((1L, 2L) -> (1L, 3L), (1L, 3L) -> (1L, 4L),
      (2L, 3L) -> (1L, 4L), (3L, 4L) -> (0L, 4L)))
    assert(runIt(edges.repartition(7)) == got,
      "partitioning must not change the overlap counts")
  }

  test("labelPropagationFixed: clamped seeds, synchronous ties to min label") {
    val session = spark
    import session.implicits._
    // path 1-2-3-4, seeds 1→0 and 4→1.
    // r1: 2 adopts 0 (only labeled nbr 1), 3 adopts 1 (only labeled nbr 4)
    // r2 (from r1 labels, synchronous): 2 sees {1:0, 3:1} tie → min 0;
    //    3 sees {2:0, 4:1} tie → min 0; seeds stay clamped
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq((1L, 0L), (4L, 1L)).toDF("node", "label")
    def run(rounds: Int) = operators.Graph
      .labelPropagationFixed(edges, seeds, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    assert(run(2) == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
    // repartition invariance of the argmax
    val again = operators.Graph
      .labelPropagationFixed(edges.repartition(5), seeds, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == run(2))
  }

  test("personalizedPageRankFixed: hand recurrence on a path, seed-only restart") {
    val session = spark
    import session.implicits._
    // 1→2→3, seed {1}, scale 1e12: r0=1e12, tele=1.5e11
    // round1: r(1)=tele, r(2)=85%·1e12
    // round2: r(1)=tele, r(2)=85%·tele=1.275e11, r(3)=85%·8.5e11=7.225e11
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = operators.Graph.personalizedPageRankFixed(edges, seeds, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 150000000000L, 2L -> 127500000000L,
      3L -> 722500000000L))
    // partition invariance of the exact integer chain
    val again = operators.Graph
      .personalizedPageRankFixed(edges.repartition(5), seeds, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("ktrussFixed: triangle survives k=3, shared-edge graph dies at k=4") {
    val session = spark
    import session.implicits._
    // two triangles sharing edge (2,3), plus pendant 4-5
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("src", "dst")
    val k3 = operators.Graph.ktrussFixed(edges, k = 3, rounds = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // pendant dies; shared edge (2,3) supports BOTH triangles
    assert(k3 == Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 2L,
      (2L, 4L) -> 1L, (3L, 4L) -> 1L))
    // k=4 peel 1 keeps only (2,3) (support 2); peel 2 finds it wedgeless
    val k4 = operators.Graph.ktrussFixed(edges, k = 4, rounds = 2).collect()
    assert(k4.isEmpty)
  }

  test("linearAttribution: exact ppm split, remainder to latest, direct bucket") {
    val session = spark
    import session.implicits._
    def ts(s: String) = java.time.LocalDateTime.parse(s)
    val conv = Seq((1L, ts("2024-01-10T00:00:00"), 100L),
      (2L, ts("2024-01-10T00:00:00"), 101L))
      .toDF("user_id", "ts", "tie")
    val tch = Seq(
      (1L, ts("2024-01-09T00:00:00"), 1L, "click"),
      (1L, ts("2024-01-09T06:00:00"), 2L, "view"),
      (1L, ts("2024-01-09T12:00:00"), 3L, "click"),
      (1L, ts("2024-01-01T00:00:00"), 4L, "view")) // outside 3-day horizon
      .toDF("user_id", "ts", "tie", "channel")
    val out = operators.Temporal
      .linearAttribution(conv, tch, Seq("user_id"), "3 DAY")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // n=3 touches: base 333333, remainder 1 to the latest (tie 3, click)
    assert(out("click") === ((2L, 1L, 333333L + 333334L)))
    assert(out("view") === ((1L, 1L, 333333L)))
    assert(out("direct") === ((0L, 1L, 1000000L)))
    // conservation: every conversion's credit sums to exactly 1e6
    assert(out.values.map(_._3).sum === 2000000L)
  }

  test("ssspFixed: weighted min-plus beats hop count, horizon respected") {
    val session = spark
    import session.implicits._
    // 1-2 (w10), 2-3 (w10), 1-3 (w25), 3-4 (w1): shortest 1→3 is 20 via 2
    // hops (not the direct 25); 4 needs 3 edges from node 1 via 2,3
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 25L),
      (3L, 4L, 1L)).toDF("src", "dst", "w")
    val src = Seq(1L).toDF("node")
    def run(r: Int) = operators.Graph.ssspFixed(edges, src, r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(1) == Map(1L -> 0L, 2L -> 10L, 3L -> 25L))
    assert(run(2) == Map(1L -> 0L, 2L -> 10L, 3L -> 20L, 4L -> 26L))
    assert(run(3) == Map(1L -> 0L, 2L -> 10L, 3L -> 20L, 4L -> 21L))
    val again = operators.Graph.ssspFixed(edges.repartition(5), src, 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(again == run(3))
  }

  test("modularity: two triangles hand value, singletons for unassigned nodes") {
    val session = spark
    import session.implicits._
    val twoTri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L),
      (6L, 1L)).toDF("node", "community")
    val r = operators.Graph.modularity(twoTri, assign).collect().head
    // m=7, e_c=3 each, d_c=7 each: Q = 2*(3/7 - (7/14)^2) = 0.357143
    assert(r.getLong(0) === 7L && r.getLong(1) === 2L &&
      r.getDouble(2) === 0.357143)
    // node 7 dangles unassigned -> singleton community, m=8
    val withDangler = twoTri.unionAll(Seq((6L, 7L)).toDF("src", "dst"))
    val r2 = operators.Graph.modularity(withDangler, assign).collect().head
    // (3/8-(7/16)^2) + (3/8-(8/16)^2) + (0-(1/16)^2) = 0.304688
    assert(r2.getLong(0) === 8L && r2.getLong(1) === 3L &&
      r2.getDouble(2) === 0.304688)
  }

  test("q248 assortativity of a star is exactly -1") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions.count
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val adj = star.select(col("src").as("v"), col("dst").as("w"))
      .unionAll(star.select(col("dst").as("v"), col("src").as("w")))
    val deg = adj.groupBy(col("v").as("node"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("deg"))
    val pairs = adj
      .join(deg.select(col("node").as("v"), col("deg").as("dx")), Seq("v"))
      .join(deg.select(col("node").as("w"), col("deg").as("dy")), Seq("w"))
    val r = operators.Stats.corrMatrix(pairs,
      Seq("dx" -> col("dx"), "dy" -> col("dy"))).collect().head
    assert(r.getLong(2) === 6L && r.getDouble(3) === -1.0)
  }

  test("keySkew: exact collision mass and skew ratio") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "w"))
      .toDF("a", "b")
    val out = operators.Profile.keySkew(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(out("a") === ((4L, 2L, 3L, 10L, 1.5)))
    assert(out("b") === ((4L, 4L, 1L, 4L, 1.0)))
  }
}
