package graft

import graft.operators.{Audit, Incremental, Privacy, Profile, Robust,
  Stats, Temporal}
import org.apache.spark.sql.functions._

/** Hand-computed cases for the round-12 governance/quality operators
  * (q263–q268 run the full oracle gate; these pin semantics on
  * eyeball-size inputs).
  */
class GovernanceSpec extends SparkSpec {
  private val session = SparkSpec.session
  import session.implicits._

  test("kAnonymity: group sizes, re-identifiable mass, l-diversity") {
    // QI group A: 4 rows, 2 distinct sensitive; B: 2 rows, 1 distinct
    val df = Seq(("A", 1), ("A", 1), ("A", 2), ("A", 2), ("B", 7), ("B", 7))
      .toDF("qi", "s")
    val r = Privacy.kAnonymity(df, Seq("qi"), col("s"), k = 3, l = 2)
      .collect().head
    assert(r.getLong(0) === 6L)    // n_rows
    assert(r.getLong(1) === 2L)    // n_groups
    assert(r.getLong(2) === 2L)    // min_group_n
    assert(r.getLong(3) === 1L)    // groups_below_k (B)
    assert(r.getLong(4) === 2L)    // rows_below_k
    assert(r.getDouble(5) === 0.333333)
    assert(r.getLong(6) === 1L)    // groups_below_l (B homogeneous)
    // NULL QI values form ONE group (shared null identity links rows)
    val n = Privacy.kAnonymity(
      Seq((Option.empty[String], 1), (None, 2), (Some("A"), 3))
        .toDF("qi", "s"), Seq("qi"), col("s"), k = 2, l = 1).collect().head
    assert(n.getLong(1) === 2L && n.getLong(4) === 1L) // only A below k
  }

  test("generalizationCurve: mass below k shrinks up the ladder") {
    val df = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 1)).toDF("c1", "c2")
    val out = Privacy.generalizationCurve(df, Seq(
        ("fine", Seq(col("c1"), col("c2"))),
        ("coarse", Seq(col("c1"))),
        ("any", Seq.empty)), k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (0, "fine", 3L, 2L, 0.5),   // (a,1),(a,2) are singletons
      (1, "coarse", 2L, 0L, 0.0),
      (2, "any", 1L, 0L, 0.0)))
  }

  test("fdAudit: exact g3 violations; a key FD holds") {
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "z")).toDF("a", "b")
    val out = Profile.fdAudit(df, Seq(("a", "b"), ("b", "a")))
      .orderBy("lhs").collect()
    // a→b: lhs 1 keeps 2 of 3 rows → g3 = 1; lhs 2 clean
    assert((out(0).getString(0), out(0).getLong(2), out(0).getLong(3),
      out(0).getLong(4), out(0).getBoolean(5)) === ("a", 4L, 2L, 1L, false))
    // b→a: every b value maps to one a → holds
    assert((out(1).getString(0), out(1).getLong(4), out(1).getBoolean(5))
      === ("b", 0L, true))
  }

  test("sequenceFunnel: greedy non-overlapping completions and stage") {
    val ev = Seq(
      // user 1: v c v p c p → one completion (v,c,p), then c/p unmatched
      (1L, 1L, "v"), (1L, 2L, "c"), (1L, 3L, "v"), (1L, 4L, "p"),
      (1L, 5L, "c"), (1L, 6L, "p"),
      // user 2: v v c → stuck at stage 2 (second v does not re-arm)
      (2L, 1L, "v"), (2L, 2L, "v"), (2L, 3L, "c"),
      // user 3: two clean completions interleaved with noise
      (3L, 1L, "v"), (3L, 2L, "x"), (3L, 3L, "c"), (3L, 4L, "p"),
      (3L, 5L, "v"), (3L, 6L, "c"), (3L, 7L, "x"), (3L, 8L, "p")
    ).toDF("u", "t", "e")
    val out = Temporal.sequenceFunnel(ev, Seq("u"), col("t"), col("t"),
        col("e"), Seq("v", "c", "p"))
      .orderBy("u").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 6L, 1L, 0L), (2L, 3L, 0L, 2L),
      (3L, 8L, 2L, 0L)))
    // order comes from (ts, tie), not arrival: reversed feed is identical
    val again = Temporal.sequenceFunnel(ev.orderBy(col("t").desc)
        .repartition(5), Seq("u"), col("t"), col("t"), col("e"),
        Seq("v", "c", "p"))
      .orderBy("u").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === out.toSeq)
  }

  test("winsorizedStats: planted whale is clipped, small group trims zero") {
    // group g: 1..19 then a 1000 whale; 5% of 20 trims exactly 1 per end
    val g = (1L to 19L).map(v => ("g", v, v)) :+ (("g", 1000L, 20L))
    // group h: n=3 → t=0: trimmed == winsorized == plain mean
    val h = Seq(("h", 1L, 1L), ("h", 2L, 2L), ("h", 30L, 3L))
    val out = Robust.winsorizedStats((g ++ h).toDF("grp", "v", "id"),
        Seq("grp"), col("v"), col("id"), pctPermille = 50)
      .orderBy("grp").collect()
    val gr = out(0)
    assert(gr.getLong(1) === 20L && gr.getLong(2) === 2L)  // n, n_trimmed
    assert(gr.getLong(3) === 2L && gr.getLong(4) === 19L)  // lo/hi cuts
    assert(gr.getDouble(5) === 10.5 && gr.getDouble(6) === 10.5)
    val hr = out(1)
    assert(hr.getLong(2) === 0L && hr.getDouble(5) === 11.0 &&
      hr.getDouble(6) === 11.0)
    // NULL values are excluded from the ranked set, not ranked lowest
    val withNull = Robust.winsorizedStats(
      Seq(("z", Some(1L), 1L), ("z", Some(2L), 2L), ("z", Some(30L), 3L),
        ("z", Option.empty[Long], 4L)).toDF("grp", "v", "id"),
      Seq("grp"), col("v"), col("id"), pctPermille = 50).collect().head
    assert(withNull.getLong(1) === 3L && withNull.getDouble(5) === 11.0)
  }

  test("winsorizedAtScale equals the exact rank form on bin-aligned values") {
    // span 100, 10 bins → bin width 10; all values multiples of 10, so
    // every cut lands exactly on a value boundary and the sketch path
    // must reproduce the exact winsorized mean
    val rows = (1L to 40L).map(i => ("g", (i % 10) * 10, i))
    val exact = Robust.winsorizedStats(rows.toDF("grp", "v", "id"),
        Seq("grp"), col("v"), col("id"), pctPermille = 100)
      .collect().head.getDouble(6)
    val sketch = Robust.winsorizedAtScale(rows.toDF("grp", "v", "id"),
        Seq("grp"), col("v"), loCents = 0L, hiCents = 100L, nBins = 10,
        pctPermille = 100)
      .collect().head
    assert(sketch.getDouble(4) === exact)
    // the plan must not sort the data: no rank window over the rows
    // (the only window runs on the <= nBins sketch)
    val plan = Robust.winsorizedAtScale(rows.toDF("grp", "v", "id"),
        Seq("grp"), col("v"), 0L, 100L, 10)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("row_number"))
  }

  test("quantilesAtScale: bin-aligned ranks are exact, one row per (group, q)") {
    val rows = (1L to 40L).map(i => ("g", (i % 10) * 10, i))
    val out = Robust.quantilesAtScale(rows.toDF("grp", "v", "id"),
        Seq("grp"), col("v"), loCents = 0L, hiCents = 100L, nBins = 10,
        qsPermille = Seq(500, 1000))
      .orderBy("q_permille").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // ranks: ceil(40·0.5)=20 → value 40; ceil(40·1.0)=40 → value 90
    assert(out.toSeq === Seq((500, 40L, 40L), (1000, 40L, 90L)))
  }

  test("srmChi2: zero on exact allocation, hand chi2, undeclared split raises") {
    val exact = Stats.srmChi2(
      (Seq.fill(8)("a") ++ Seq.fill(2)("b")).toDF("s"), col("s"),
      Seq(("a", 800), ("b", 200))).collect().head
    assert(exact.getLong(0) === 10L && exact.getLong(1) === 2L &&
      exact.getDouble(2) === 0.0)
    // observed 5/5 against expected 8/2: (5−8)²/8 + (5−2)²/2 = 5.625
    val skew = Stats.srmChi2(
      (Seq.fill(5)("a") ++ Seq.fill(5)("b")).toDF("s"), col("s"),
      Seq(("a", 800), ("b", 200))).collect().head
    assert(skew.getDouble(2) === 5.625)
    val err = intercept[Exception] {
      Stats.srmChi2(Seq("a", "zz").toDF("s"), col("s"),
        Seq(("a", 1000))).collect()
    }
    assert(err.getMessage.contains("undeclared") ||
      Option(err.getCause).exists(_.getMessage.contains("undeclared")))
  }

  test("ewmaBaseline: hand recursion, partition invariance") {
    // 10 → 10; 18 → 10 + 8/8 = 11; 3 → 11 + (3−11)/8 = 10
    val df = Seq(("k", "a", 10L), ("k", "b", 18L), ("k", "c", 3L))
      .toDF("grp", "o", "x")
    val r = Stats.ewmaBaseline(df, Seq("grp"), col("o"), col("x"),
      alphaDen = 8).collect().head
    assert(r.getLong(1) === 3L && r.getDouble(2) === 10.0)
    val again = Stats.ewmaBaseline(df.repartition(5), Seq("grp"),
      col("o"), col("x"), alphaDen = 8).collect().head
    assert(again.getDouble(2) === 10.0)
  }

  test("sequenceGaps: missing ranges, duplicates, widest hole, null offsets") {
    // key a: 1,2,2,5,9 → rows 5, nulls 0, values 4, missing 9-1+1-4 = 5,
    //   dupes 1, max_gap 3 (5→9)
    // key b: 7 → clean singleton
    // key c: 1,2,NULL → the corrupt-offset case: null counted, NOT a
    //   value (folding it in would read missing = 2-1+1-3 = -1)
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", Some(2L)),
      ("a", Some(5L)), ("a", Some(9L)), ("b", Some(7L)),
      ("c", Some(1L)), ("c", Some(2L)), ("c", Option.empty[Long]))
      .toDF("k", "s")
    val out = Audit.sequenceGaps(df, Seq("k"), col("s"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    assert(out.toSeq === Seq(("a", 5L, 0L, 4L, 1L, 9L, 5L, 1L, 3L),
      ("b", 1L, 0L, 1L, 7L, 7L, 0L, 0L, 0L),
      ("c", 3L, 1L, 2L, 1L, 2L, 0L, 0L, 0L)))
  }

  test("rollup merge over split states equals direct aggregation") {
    val raw = Seq(("x", "h1", 5L), ("x", "h1", 7L), ("x", "h2", 1L),
      ("y", "h1", 100L), ("y", "h3", -4L)).toDF("g", "hr", "v")
    val partial = Incremental.aggState(raw, Seq("g", "hr"), col("v"))
    val merged = Incremental.mergeState(partial, Seq("g"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val direct = Incremental.aggState(raw, Seq("g"), col("v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(merged.toSeq === direct.toSeq)
    assert(merged.toSeq === Seq(("x", 3L, 13L, 1L, 7L),
      ("y", 2L, 96L, -4L, 100L)))
  }

  test("doubleEvents: window boundary inclusive, cross-bucket pairs found once") {
    val df = Seq(
      // same key+amount: t=0 vs t=10 (in window), t=0 vs t=11 (out)
      (1L, 10L, 0L, 1L), (1L, 10L, 10L, 2L), (1L, 10L, 21L, 3L),
      // cross-bucket (window 10): t=9 and t=12 are in adjacent buckets
      (2L, 5L, 9L, 4L), (2L, 5L, 12L, 5L),
      // same ts: ordered by tie, exactly one pair
      (3L, 1L, 50L, 6L), (3L, 1L, 50L, 7L),
      // same key, different amount: never paired
      (4L, 2L, 0L, 8L), (4L, 3L, 1L, 9L)
    ).toDF("k", "amt", "t", "id")
    val out = Audit.doubleEvents(df, Seq("k"), col("t"), col("id"),
        col("amt"), windowMicros = 10L)
      .orderBy("k", "a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // k=1: (1,2) gap 10 inclusive; (2,3) gap 11 excluded; (1,3) excluded
    assert(out.toSeq === Seq((1L, 1L, 2L, 10L), (2L, 4L, 5L, 3L),
      (3L, 6L, 7L, 0L)))
  }

  test("targetEncodeLoo: own label excluded, singleton category is null") {
    import graft.operators.Features
    val df = Seq((1L, "A", 1L), (2L, "A", 0L), (3L, "A", 1L),
      (4L, "B", 1L)).toDF("id", "cat", "y")
    val out = Features.targetEncodeLoo(df, "cat", col("y"))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(3)) null else r.getDouble(3))
    // cat A: sy=2, n=3 → y=1 rows (2−1)/2 = 0.5; y=0 row 2/2 = 1.0
    assert(out.toSeq === Seq(0.5, 1.0, 0.5, null))
  }

  test("rankNormalize: [0,1] positions, singleton maps to midpoint") {
    import graft.operators.Features
    val df = Seq(("g", 10L, 1L), ("g", 20L, 2L), ("g", 30L, 3L),
      ("g", 40L, 4L), ("s", 7L, 5L)).toDF("grp", "v", "id")
    val out = Features.rankNormalize(df, Seq("grp"), col("v"), col("id"))
      .orderBy("grp", "id").collect().map(_.getDouble(3))
    assert(out.toSeq === Seq(0.0, 0.333333, 0.666667, 1.0, 0.5))
  }

  test("hashFeatures: identical text gives identical vectors, bounded indices") {
    import graft.operators.Features
    val df = Seq((1L, "alpha beta gamma alpha"), (2L, "alpha beta gamma alpha"),
      (3L, "delta")).toDF("id", "text")
    val out = Features.hashFeatures(df, "id", "text", dim = 256).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (_, idx, _) => idx >= 0 && idx < 256 })
    val v1 = out.filter(_._1 == 1L).map(t => (t._2, t._3)).sorted.toSeq
    val v2 = out.filter(_._1 == 2L).map(t => (t._2, t._3)).sorted.toSeq
    assert(v1 === v2 && v1.nonEmpty)
    // duplicated token contributes |weight| 2 on its cell
    assert(v1.map(_._2).map(math.abs).max === 2L)
    val again = Features.hashFeatures(df.repartition(5), "id", "text", 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 == 1L).map(t => (t._2, t._3)).sorted.toSeq
    assert(again === v1)
  }

  test("aucExact: perfect separation, inversion, ties, one-class null") {
    import graft.operators.Eval
    def auc(rows: Seq[(Double, Long)]): Option[Double] = {
      val r = Eval.aucExact(rows.toDF("s", "y"), col("s"), col("y"))
        .collect().head
      if (r.isNullAt(3)) None else Some(r.getDouble(3))
    }
    assert(auc(Seq((1.0, 0L), (2.0, 0L), (3.0, 1L), (4.0, 1L)))
      === Some(1.0))
    assert(auc(Seq((1.0, 1L), (2.0, 1L), (3.0, 0L), (4.0, 0L)))
      === Some(0.0))
    // full tie: every pair contributes a half
    assert(auc(Seq((5.0, 1L), (5.0, 0L))) === Some(0.5))
    assert(auc(Seq((1.0, 1L), (2.0, 1L))) === None)
    // NULL scores are excluded, not ranked first
    val withNull = Seq((Some(1.0), 0L), (Some(2.0), 1L),
      (Option.empty[Double], 1L)).toDF("s", "y")
    val r = Eval.aucExact(withNull, col("s"), col("y")).collect().head
    assert(r.getLong(0) === 2L && r.getDouble(3) === 1.0)
  }

  test("medianMad keeps an all-NULL group in the report with NULL median") {
    val df = Seq(("a", Some(1L)), ("a", Some(3L)), ("b", Option.empty[Long]),
      ("b", None)).toDF("g", "v")
    val out = Robust.medianMad(df, Seq("g"), col("v"), col("v"))
      .orderBy("g").collect()
    assert(out.length === 2)
    assert(out(0).getDouble(1) === 2.0)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2)) // surfaced, not dropped
  }

  test("thresholdMetrics: hand confusion tables in one scan") {
    import graft.operators.Eval
    // the NULL-score positive must NOT land in tn via the remainder
    val df = Seq((Some(10.0), 0L), (Some(20.0), 0L), (Some(30.0), 1L),
      (Some(40.0), 1L), (Option.empty[Double], 1L)).toDF("s", "y")
    val out = Eval.thresholdMetrics(df, col("s"), col("y"),
        Seq(5.0, 25.0, 35.0))
      .orderBy("threshold").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(out.toSeq === Seq(
      (5.0, 2L, 2L, 0L, 0L, 0.5, 1.0, 0.666667),
      (25.0, 2L, 0L, 0L, 2L, 1.0, 1.0, 1.0),
      (35.0, 1L, 0L, 1L, 2L, 1.0, 0.5, 0.666667)))
  }

  test("calibrationCurve: exact equal-count buckets, rate vs score") {
    import graft.operators.Eval
    val df = (1L to 10L).map(m => (m, if (m > 5) 1L else 0L, m))
      .toDF("m", "y", "id")
    val out = Eval.calibrationCurve(df, col("m"), col("y"), col("id"),
        nBuckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.toSeq === Seq((0L, 5L, 0L, 3.0, 0.0),
      (1L, 5L, 5L, 8.0, 1.0)))
  }

  test("calibrationCurve: boundary-straddling tied scores split by tie order") {
    import graft.operators.Eval
    // 12 rows, 4 buckets of 3: score 5 owns ranks 2..9 (straddles THREE
    // boundaries), labels alternate in tie order so the split is visible
    val rows = Seq((1L, 0L, 1L)) ++
      (2L to 9L).map(id => (5L, id % 2, id)) ++
      Seq((7L, 1L, 10L), (9L, 0L, 11L), (9L, 1L, 12L))
    val df = rows.toDF("m", "y", "id")
    val out = Eval.calibrationCurve(df, col("m"), col("y"), col("id"),
        nBuckets = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    // reference = the definitional per-row ranking, replayed in Scala
    val ranked = rows.sortBy(t => (t._1, t._3)).zipWithIndex
    val expect = ranked.groupBy { case (_, i) => i.toLong * 4 / 12 }
      .toSeq.sortBy(_._1)
      .map { case (b, g) =>
        (b, g.size.toLong, g.map(_._1._2).sum,
          math.round(g.map(_._1._1).sum.toDouble / g.size * 1e6) / 1e6,
          math.round(g.map(_._1._2).sum.toDouble / g.size * 1e6) / 1e6) }
    assert(out.toSeq === expect)
  }

  test("calibrationCurve: differential vs per-row ranking on random ties") {
    import graft.operators.Eval
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 40 + rnd.nextInt(60)
      val b = Seq(2, 3, 7)(trial - 1)
      val rows = (1 to n).map(id =>
        (rnd.nextInt(6).toLong, rnd.nextInt(2).toLong, id.toLong))
      val out = Eval.calibrationCurve(rows.toDF("m", "y", "id"),
          col("m"), col("y"), col("id"), nBuckets = b)
        .orderBy("bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4)))
      val expect = rows.sortBy(t => (t._1, t._3)).zipWithIndex
        .groupBy { case (_, i) => i.toLong * b / n }.toSeq.sortBy(_._1)
        .map { case (bk, g) =>
          (bk, g.size.toLong, g.map(_._1._2).sum,
            math.round(g.map(_._1._1).sum.toDouble / g.size * 1e6) / 1e6,
            math.round(g.map(_._1._2).sum.toDouble / g.size * 1e6) / 1e6) }
      assert(out.toSeq === expect, s"trial $trial n=$n b=$b")
    }
  }

  test("calibrationCurve: no global per-row window in the physical plan") {
    import graft.operators.Eval
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    def subPlans(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: nested.flatMap(subPlans)
    }
    val df = (1L to 100L).map(i => (i % 7, i % 2, i)).toDF("m", "y", "id")
    val out = Eval.calibrationCurve(df, col("m"), col("y"), col("id"),
      nBuckets = 5)
    out.collect() // finalize AQE so the walked plan is the executed one
    val wins = subPlans(out.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    // every UNPARTITIONED window (the r12 scale-killer shape was a global
    // row_number over raw rows) must sit above the distinct-score
    // aggregate — i.e. see only sketch rows, never the holdout itself
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val aggBelow = subPlans(w.child).exists {
        case a: HashAggregateExec => a.groupingExpressions.nonEmpty
        case _ => false
      }
      assert(aggBelow,
        s"unpartitioned window runs over raw rows, not the sketch:\n$w")
    }
  }

  test("targetEncodeLoo: NULL targets excluded from both sides of the mean") {
    import graft.operators.Features
    // cat A: labeled rows y=1,0; one unlabeled row. The unlabeled row must
    // not inflate the denominator, and itself encodes the labeled mean.
    val df = Seq((1L, "A", Some(1L)), (2L, "A", Some(0L)),
      (3L, "A", Option.empty[Long]), (4L, "B", Some(1L)),
      (5L, "B", Option.empty[Long])).toDF("id", "cat", "y")
    val out = Features.targetEncodeLoo(df, "cat", col("y"))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(3)) null else r.getDouble(3))
    // A: y=1 → (1−1)/1 = 0; y=0 → 1/1 = 1; unlabeled → 1/2 = 0.5
    // B: the labeled singleton has no labeled peer → NULL;
    //    B's unlabeled row encodes the labeled mean 1/1 = 1.0
    assert(out.toSeq === Seq(0.0, 1.0, 0.5, null, 1.0))
  }

  test("targetEncodeLoo: no pinned broadcast hint, AQE sizes the join-back") {
    import graft.operators.Features
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = (1L to 50L).map(i => (i, s"cat$i", i % 2)).toDF("id", "cat", "y")
    // no forced broadcast hint anywhere: the optimizer broadcasts a
    // genuinely small stats side from its MEASURED size and a
    // high-cardinality vocabulary degrades to a shuffle join instead of
    // a pinned-hint OOM (the Robust join-back discipline; also kills the
    // eager approx-distinct probe the old guard ran at construction time)
    val enc = Features.targetEncodeLoo(df, "cat", col("y"))
    assert(enc.queryExecution.analyzed
      .collect { case h: ResolvedHint => h }.isEmpty,
      "encode must not pin a broadcast hint")
    // every category is a singleton here → all encodings NULL
    assert(enc.orderBy("id").collect().forall(_.isNullAt(3)))
  }

  test("linearScore: margin arithmetic, empty doc, sparse weights, strict threshold") {
    import graft.operators.Features
    val docs = Seq((1L, "a a b"), (2L, ""), (3L, "c")).toDF("id", "text")
    // weight table keyed to doc1's ACTUAL portable feature indexes only
    // (sparse model) so every expected value is hand-computable
    val feats = Features.hashFeatures(docs, "id", "text", dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val doc1 = feats.filter(_._1 == 1L)
    val wA = 0.25
    val weights = doc1.map { case (_, i, _) => (i, wA) }.toSeq
      .toDF("idx", "w")
    val out = Features.linearScore(docs, "id", "text", dim = 16,
        weights = weights, bias = 0.0)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // doc1 margin = Σ cell·0.25 over its cells, recomputed by hand
    val m1 = doc1.map(_._3 * wA).sum
    assert(out(0) == ((1L, doc1.length.toLong,
      math.rint(m1 * 1e6) / 1e6, if (m1 > 0) 1L else 0L)))
    // empty doc: no features, score = bias (0 here), keep=0 at == threshold
    assert(out(1) == ((2L, 0L, 0.0, 0L)))
    // doc3: its index is in the sparse table only by hash collision with
    // doc1's cells — n_feat says exactly whether it was scored
    val doc1Idx = doc1.map(_._2).toSet
    val c3 = feats.filter(_._1 == 3L)
    val expect3 = c3.count(f => doc1Idx.contains(f._2)).toLong
    assert(out(2)._2 == expect3, "sparse model scores only matched cells")
    if (expect3 == 0) assert(out(2)._3 == 0.0 && out(2)._4 == 0L)
    // strict threshold: margin + bias == threshold must NOT keep
    val eq = Features.linearScore(docs, "id", "text", dim = 16,
        weights = weights, bias = -m1, threshold = 0.0)
      .where(col("id") === 1L).collect().head
    assert(eq.getLong(3) == 0L, "== threshold must not keep")
  }

  test("linearScoreDense: bit-for-bit equal to the table path") {
    import graft.operators.Features
    // includes a NULL text: both paths must score it like an empty doc
    // (n_feat 0, score = bias, keep decided on the bias alone) — the
    // dense path's LinearMargin returns NULL on a NULL array and the
    // wrapper coalesces, mirroring the table path's left join
    val docs = Seq((1L, Some("a a b c")), (2L, Some("")),
      (3L, Some("x y z z y")), (4L, Some("solo")),
      (5L, Option.empty[String])).toDF("id", "text")
    val dim = 64
    // the three weight representations must agree exactly
    val arr = Features.portableWeightsArray(dim)
    val table = Features.portableWeights(SparkSpec.session, dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert((0 until dim).forall(j => table(j.toLong) == arr(j)))
    val dense = Features.linearScoreDense(docs, "id", "text", dim, arr,
        bias = -0.05).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val viaTable = Features.linearScore(docs, "id", "text", dim,
        Features.portableWeights(SparkSpec.session, dim), bias = -0.05)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(dense.toSeq === viaTable.toSeq)
  }

  test("expectations: exact violation counts, NULL predicate is a violation") {
    val df = Seq((Some(5L), "a"), (Some(-1L), "b"), (None, "a"))
      .toDF("v", "tag")
    val out = Audit.expectations(df, Seq(
        ("v_positive", col("v") > 0),      // -1 fails, NULL fails → 2
        ("tag_domain", col("tag").isin("a", "b")),
        ("v_present", col("v").isNotNull)))
      .orderBy("rule_no").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(5)))
    assert(out.toSeq === Seq(("v_positive", 3L, 2L, false),
      ("tag_domain", 3L, 0L, true), ("v_present", 3L, 1L, false)))
    // an EMPTY feed must NOT vacuously pass the contract
    val empty = Audit.expectations(df.where(lit(false)),
      Seq(("v_positive", col("v") > 0))).collect().head
    assert(empty.getLong(2) === 0L && !empty.getBoolean(5) &&
      empty.isNullAt(4))
  }

  test("empty inputs report clean zeros, not null-row traps") {
    val cust = Seq(("A", 1)).toDF("qi", "s").where(lit(false))
    val k = Privacy.kAnonymity(cust, Seq("qi"), col("s"), k = 2, l = 2)
      .collect().head
    assert(k.getLong(0) === 0L && k.getLong(1) === 0L &&
      k.getLong(4) === 0L && k.isNullAt(5))
    val curve = Privacy.generalizationCurve(cust, Seq(
        ("qi", Seq(col("qi"))), ("any", Seq.empty)), k = 2)
      .orderBy("rung").collect()
    assert(curve.forall(r => r.getLong(2) === 0L && r.getLong(4) === 0L &&
      r.isNullAt(5)))
  }

  test("featurization null handling: null category encodes, null value stays null") {
    import graft.operators.Features
    // null categories form their own LOO group instead of vanishing
    val enc = Features.targetEncodeLoo(
      Seq((1L, Some("A"), 1L), (2L, Option.empty[String], 0L),
        (3L, None, 1L)).toDF("id", "cat", "y"), "cat", col("y"))
      .orderBy("id").collect()
    assert(enc.length === 3)
    assert(enc(1).getDouble(3) === 1.0 && enc(2).getDouble(3) === 0.0)
    assert(enc(0).isNullAt(3)) // singleton category
    // null values keep pr NULL and do not shift real ranks
    val pr = Features.rankNormalize(
      Seq(("g", Some(10L), 1L), ("g", None, 2L), ("g", Some(20L), 3L))
        .toDF("grp", "v", "id"), Seq("grp"), col("v"), col("id"))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(3)) null else r.getDouble(3))
    assert(pr.toSeq === Seq(0.0, null, 1.0))
  }
}
