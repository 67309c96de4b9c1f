package graft

import graft.operators.{Corpus, Graph, Regress, Stats, Temporal, TextDedup}
import org.apache.spark.sql.functions._

/** Hand-computed cases for the structure/statistics operators (q215–q219
  * run the full oracle gate; these pin semantics on eyeball-size inputs).
  */
class StatsSpec extends SparkSpec {
  private val session = SparkSpec.session
  import session.implicits._

  test("localClusteringCoeff: triangle + pendant, exact counts") {
    // triangle 1-2-3 plus pendant 3-4
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.localClusteringCoeff(e).orderBy("node").collect()
    // node 4 (deg 1) excluded
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((2L, 1L), (2L, 1L), (3L, 1L)))
    assert(out.map(_.getDouble(3)).toSeq === Seq(1.0, 1.0, 0.333333))
  }

  test("localClusteringCoeff is repartition-invariant") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L))
      .toDF("src", "dst")
    val a = Graph.localClusteringCoeff(e).orderBy("node").collect().toSeq
    val b = Graph.localClusteringCoeff(e.repartition(7))
      .orderBy("node").collect().toSeq
    assert(a === b)
  }

  test("prioritySamplePerKey caps every stratum and favors weight") {
    val docs = (1L to 40L).map { i =>
      (if (i <= 20) "s1" else "s2", i, if (i % 2 == 0) 1000L else 1L)
    }.toDF("source", "doc_id", "w")
    val out = Corpus.prioritySamplePerKey(docs, Seq("source"),
      col("doc_id"), "doc_id", col("w"), n = 4).collect()
    val bySrc = out.groupBy(_.getString(0))
    assert(bySrc.keySet === Set("s1", "s2"))
    assert(bySrc.values.forall(_.length === 4))
    // winners = the top-4 by the SAME integer priority computed test-side
    def h40(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(15), 16) >> 20
    val expected = (1L to 40L).map { i =>
      val src = if (i <= 20) "s1" else "s2"
      val w = if (i % 2 == 0) 1000L else 1L
      (src, i, w * 1048576L / (h40(i) + 1))
    }.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(4)
    }.map(r => (r._1, r._2)).toSet
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSet === expected)
    // deterministic rerun
    val again = Corpus.prioritySamplePerKey(docs.repartition(5), Seq("source"),
      col("doc_id"), "doc_id", col("w"), n = 4).collect()
    assert(out.map(_.getLong(1)).sorted.toSeq ===
      again.map(_.getLong(1)).sorted.toSeq)
  }

  test("q216 runs on the bounded-heap TopKPerKey operator, not a window sort") {
    val plan = run("q216_stratified_priority_sample")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKey in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window sort in:\n$plan")
  }

  test("scd2 plan shuffles ONCE on the key (both windows share the exchange)") {
    val out = graft.operators.Temporal.scd2(changelogForPlan, Seq("user_id"),
      col("ts"), col("event_id"), col("value"))
    // AQE wraps the plan, so count nodes in the rendered tree: ONE exchange
    // and ONE sort — the second window reuses both
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
    assert("\\+- Sort ".r.findAllIn(plan).length === 1, plan)
  }

  private lazy val changelogForPlan = {
    val s = SparkSpec.session
    import s.implicits._
    Seq((1L, "2024-01-01T00:00:00", 1L, 10.0))
      .toDF("user_id", "sx", "event_id", "value")
      .withColumn("ts", col("sx").cast("timestamp_ntz")).drop("sx")
  }

  test("snapshotDiff classifies all four statuses") {
    val a = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val b = Seq((2L, 20.0), (3L, 31.0), (4L, 40.0)).toDF("k", "v")
    val out = Temporal.snapshotDiff(a, b, "k", "v")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added")))
  }

  test("snapshotDiff classifies by key presence, not value NULL-ness") {
    val a = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("k", "v")
    val b = Seq((1L, Some(5.0)), (2L, Option.empty[Double])).toDF("k", "v")
    val out = Temporal.snapshotDiff(a, b, "k", "v")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // key 1 exists on BOTH sides (old value NULL) → changed, never 'added';
    // key 2 is NULL → NULL → unchanged under null-safe compare
    assert(out === Seq((1L, "changed"), (2L, "unchanged")))
  }

  test("psi is NULL, not 0, when the distributions are disjoint") {
    import graft.operators.Histogram
    val counts = Seq(("g", 0L, 10L, 0L), ("g", 1L, 0L, 10L))
      .toDF("grp", "bucket", "na", "nb")
    val out = Histogram.psi(counts, Seq("grp")).collect().head
    assert(out.getLong(1) === 2L && out.isNullAt(2))
  }

  test("containmentPairs tolerates sub-n-token documents") {
    val docs = Seq((1L, "tiny"), (2L, "four words only here"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "x " + "alpha beta gamma delta epsilon zeta" + " y")).toDF("doc_id", "text")
    val out = TextDedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.9, n = 5, maxDf = 50).collect()
    assert(out.length === 1 && out.head.getLong(0) === 3L)
  }

  test("psi: identical distributions score zero; drift is positive; one-sided buckets counted") {
    import graft.operators.Histogram
    // g1: identical sides → psi 0. g2: drifted + a one-sided bucket.
    val counts = Seq(
      ("g1", 0L, 50L, 50L), ("g1", 1L, 50L, 50L),
      ("g2", 0L, 90L, 10L), ("g2", 1L, 10L, 90L), ("g2", 2L, 0L, 5L)
    ).toDF("grp", "bucket", "na", "nb")
    val out = Histogram.psi(counts, Seq("grp")).orderBy("grp").collect()
    assert(out(0).getLong(1) === 0L && out(0).getDouble(2) === 0.0)
    assert(out(1).getLong(1) === 1L) // the (0,5) bucket
    // hand value over the two shared buckets (pa/pb use side totals 100/105):
    val t0 = (0.9 - 10.0 / 105) * math.log(0.9 / (10.0 / 105))
    val t1 = (0.1 - 90.0 / 105) * math.log(0.1 / (90.0 / 105))
    assert(out(1).getDouble(2) === t0 + t1)
  }

  test("connectedComponents labels two islands and a singleton pair") {
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
      .toDF("src", "dst")
    val out = graft.operators.Graph.connectedComponents(e)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (20L, 20L), (21L, 20L)))
  }

  test("bfsFixed: exact hop distances on a path, horizon respected") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val src = Seq(1L).toDF("node")
    val out = graft.operators.Graph.bfsFixed(e, src, rounds = 2)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // nodes 4 and 5 lie beyond the 2-round horizon
    assert(out === Seq((1L, 0L), (2L, 1L), (3L, 2L)))
    // a second source shrinks distances via the min merge
    val out2 = graft.operators.Graph.bfsFixed(e, Seq(1L, 5L).toDF("node"), 2)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out2 === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 1L), (5L, 0L)))
  }

  test("debounce keeps burst leaders only, strictly-greater gap survives") {
    val ev = Seq(
      (1L, "2024-01-01T00:00:00", 1L), // leader
      (1L, "2024-01-01T00:30:00", 2L), // inside 1h of previous → dropped
      (1L, "2024-01-01T01:30:00", 3L), // exactly 1h after the DROPPED row —
                                       // gap measured vs PREVIOUS row, not leader
      (1L, "2024-01-01T03:00:00", 4L), // new burst
      (2L, "2024-01-01T00:10:00", 5L)  // other key untouched
    ).toDF("user_id", "s", "event_id")
      .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
    val kept = graft.operators.Temporal.debounce(ev, Seq("user_id"),
        col("ts"), col("event_id"), gapMicros = 3600000000L)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    // event 3: gap to event 2 is exactly 1h — NOT strictly greater → dropped
    assert(kept === Seq(1L, 4L, 5L))
  }

  test("linkageScores: additive field weights, disagreement counts, block guard") {
    import graft.operators.FuzzyJoin
    val recs = Seq(
      (1L, "acme corp", "X"),  // vs 2: name lev 1 (+5), dept differs (-2) → 3
      (2L, "acme corpX", "Y"),
      (3L, "acme shop", "X"),  // vs 1: lev 4 (-1), dept same (+2) → 1
      (4L, "zzz other", "X")   // different block: never paired
    ).toDF("id", "name", "dept")
    val out = FuzzyJoin.linkageScores(recs, "id",
        split(col("name"), " ").getItem(0)) { (a, b) =>
        when(levenshtein(a("name"), b("name")) <= 2, 5).otherwise(-1) +
        when(a("dept") === b("dept"), 2).otherwise(-2)
      }.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out === Map((1L, 2L) -> 3, (1L, 3L) -> 1, (2L, 3L) -> -3))
    val err = intercept[IllegalArgumentException] {
      FuzzyJoin.linkageScores(recs, "id", lit("all"), maxBlock = 2)((a, b) => lit(0))
    }
    assert(err.getMessage.contains("block"))
    // empty input: max(n) over zero blocks is SQL NULL — must read as
    // "no block" and return an empty pair set, not NPE in the guard
    val none = FuzzyJoin.linkageScores(recs.where(lit(false)), "id",
      lit("all"))((a, b) => lit(0))
    assert(none.count() === 0L)
    assert(FuzzyJoin.blockedNameMatch(recs.where(lit(false)).select(
      col("id"), col("name")), "id", "name", maxDist = 2).count() === 0L)
  }

  test("olsByGroup recovers an exact line; zero-variance group is null") {
    val df = Seq(
      ("g", 0L, 3L), ("g", 1L, 5L), ("g", 2L, 7L), ("g", 3L, 9L), // y = 2x+3
      ("z", 5L, 1L), ("z", 5L, 9L)                                // no x variance
    ).toDF("grp", "x", "y")
    val out = Regress.olsByGroup(df, Seq("grp"), col("x"), col("y"))
      .orderBy("grp").collect()
    assert(out(0).getDouble(2) === 2.0 && out(0).getDouble(3) === 3.0)
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))
  }

  test("corrMatrix: exact ±1 on linear pairs, null on zero variance") {
    val df = Seq((1L, 2L, 3L, 7L), (2L, 4L, 2L, 7L), (3L, 6L, 1L, 7L))
      .toDF("x", "y", "z", "w")
    val out = Stats.corrMatrix(df, Seq("x" -> col("x"), "y" -> col("y"),
        "z" -> col("z"), "w" -> col("w")))
      .orderBy("col_a", "col_b").collect()
    val m = out.map(r => ((r.getString(0), r.getString(1)),
      if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out.forall(_.getLong(2) === 3L) && m.size === 6)
    assert(m(("x", "y")) === 1.0 && m(("x", "z")) === -1.0 &&
      m(("y", "z")) === -1.0)
    // constant column: every pair with w is null
    assert(m(("x", "w")) === null && m(("y", "w")) === null &&
      m(("z", "w")) === null)
    // partition invariance (decimal sums, not doubles)
    val again = Stats.corrMatrix(df.repartition(5),
        Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z"),
          "w" -> col("w")))
      .orderBy("col_a", "col_b").collect().toSeq
    assert(again === out.toSeq)
  }

  test("corrByGroup: per-group sign, singleton group is null") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 1L, 9L), ("b", 2L, 5L), ("b", 3L, 1L), ("c", 4L, 4L))
      .toDF("g", "x", "y")
    val out = Stats.corrByGroup(df, Seq("g"), col("x"), col("y"))
      .orderBy("g").collect()
    assert(out(0).getDouble(2) === 1.0)
    assert(out(1).getDouble(2) === -1.0)
    assert(out(2).isNullAt(2)) // n=1: zero variance
  }

  test("q232 argmax runs on bounded TopKPerKey heaps, not a window sort") {
    val plan = run("q232_chi2_terms").queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKey in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window sort in:\n$plan")
  }

  test("q236 cumsum window shuffles ONCE on the stratum") {
    val out = graft.operators.Corpus.tokenBudgetMix(
      Seq(("s", 1L, 10L)).toDF("src", "id", "tok"),
      Seq("src"), "id", col("tok"), budget = 100L)
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
    assert("\\+- Sort ".r.findAllIn(plan).length === 1, plan)
  }

  test("bitemporalAsOf: late correction visible only after its recorded_ts") {
    import graft.operators.Temporal
    def ts(s: String) = java.time.LocalDateTime.parse(s)
    // key 1: v=10 valid Jan 1 (recorded Jan 1); CORRECTION v=99 for the
    // same valid day recorded Jan 5. Key 2: fact valid Jan 3 recorded Jan 8.
    val log = Seq(
      (1L, ts("2024-01-01T00:00:00"), ts("2024-01-01T00:00:00"), 1L, 10L),
      (1L, ts("2024-01-01T00:00:00"), ts("2024-01-05T00:00:00"), 2L, 99L),
      (2L, ts("2024-01-03T00:00:00"), ts("2024-01-08T00:00:00"), 3L, 7L))
      .toDF("user_id", "valid_ts", "recorded_ts", "tie", "value")
    def asOf(v: String, t: String) = Temporal.bitemporalAsOf(log,
        Seq("user_id"), lit(ts(v)), lit(ts(t)))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // known Jan 2: correction invisible, key 2's fact not yet recorded
    assert(asOf("2024-01-04T00:00:00", "2024-01-02T00:00:00") ===
      Map(1L -> 10L))
    // known Jan 9: correction wins (same valid_ts, later recorded), key 2 visible
    assert(asOf("2024-01-04T00:00:00", "2024-01-09T00:00:00") ===
      Map(1L -> 99L, 2L -> 7L))
    // valid Jan 2: key 2's fact not yet VALID even though recorded
    assert(asOf("2024-01-02T00:00:00", "2024-01-09T00:00:00") ===
      Map(1L -> 99L))
  }

  test("clampedRunningBalance: hand fold with clamp and peak, order from (ts, tie)") {
    import graft.operators.Temporal
    def ts(s: String) = java.time.LocalDateTime.parse(s)
    // fed OUT of order; sorted deltas are [5, -3, -9, 4]:
    // balances 5, 2, 0 (one clamp), 4; peak 5
    val ev = Seq(
      (1L, ts("2024-01-01T03:00:00"), 4L, 4L),
      (1L, ts("2024-01-01T01:00:00"), 2L, -3L),
      (1L, ts("2024-01-01T00:00:00"), 1L, 5L),
      (1L, ts("2024-01-01T02:00:00"), 3L, -9L),
      (2L, ts("2024-01-01T00:00:00"), 5L, -7L)) // immediate clamp to 0
      .toDF("user_id", "ts", "tie", "delta")
    val out = Temporal.clampedRunningBalance(ev.repartition(5),
        Seq("user_id"), col("ts"), col("tie"), col("delta"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out === Seq((1L, 4L, 4L, 1L, 5L), (2L, 1L, 0L, 1L, 0L)))
  }

  test("giniByGroup: hand values — equal mass 0, extreme concentration") {
    // g1: equal [5,5,5,5] -> G = 0. g2: [0,0,0,10] -> G = (2*40)/(4*10) - 5/4 = 0.75
    // g3: all-zero mass -> NULL. g4: single row -> 0 by the formula.
    val df = Seq(
      ("g1", 1L, 5L), ("g1", 2L, 5L), ("g1", 3L, 5L), ("g1", 4L, 5L),
      ("g2", 1L, 0L), ("g2", 2L, 0L), ("g2", 3L, 0L), ("g2", 4L, 10L),
      ("g3", 1L, 0L), ("g3", 2L, 0L),
      ("g4", 1L, 7L)).toDF("grp", "id", "mass")
    val out = Stats.giniByGroup(df, Seq("grp"), col("mass"), col("id"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out.toSeq === Seq(("g1", 0.0), ("g2", 0.75), ("g3", null),
      ("g4", 0.0)))
    val again = Stats.giniByGroup(df.repartition(7), Seq("grp"),
      col("mass"), col("id")).orderBy("grp").collect()
      .map(r => (r.getString(0), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(again.toSeq === out.toSeq)
  }

  test("decayedCounts: exact power-of-two staircase weights, far tail zero") {
    // halflife 7: ages 0,0 -> step 0 (w=1); 8 -> step 1 (w=1/2);
    // 490 -> step 70 > 62 -> weight exactly 0
    val df = Seq(("g", 0L), ("g", 0L), ("g", 8L), ("g", 490L))
      .toDF("grp", "age")
    val out = Stats.decayedCounts(df, Seq("grp"), col("age"), 7)
      .collect().head
    assert(out.getLong(1) === 4L && out.getDouble(2) === 2.5)
    val again = Stats.decayedCounts(df.repartition(5), Seq("grp"),
      col("age"), 7).collect().head
    assert(again.getDouble(2) === 2.5)
    // negative age (clock skew) clamps to step 0 / weight 1.0 — NOT a
    // negative shift count (Spark would mask it to 2^63, DuckDB raises)
    val skewed = Stats.decayedCounts(
      Seq(("g", -3L), ("g", -700L), ("g", 8L)).toDF("grp", "age"),
      Seq("grp"), col("age"), 7).collect().head
    assert(skewed.getLong(1) === 3L && skewed.getDouble(2) === 2.5)
  }

  test("cupedMeans: exact theta recovers equal adjusted means on a planted line") {
    // y = 10 + 2x exactly -> theta = 2; the arms differ only through x,
    // so CUPED must equalize them: adj = 16 for both
    val units = Seq(("a", 0L, 10L), ("a", 2L, 14L),
      ("b", 4L, 18L), ("b", 6L, 22L)).toDF("arm", "x", "y")
    val out = Stats.cupedMeans(units, "arm", col("x"), col("y"))
      .orderBy("arm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(out === Seq(("a", 2L, 12.0, 16.0), ("b", 2L, 20.0, 16.0)))
    // partition invariance (decimal sums)
    val again = Stats.cupedMeans(units.repartition(5), "arm",
      col("x"), col("y")).orderBy("arm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(again === out)
  }

  test("ksTwoSample: hand CDF gap, identical sides zero, disjoint sides one") {
    val df = Seq(
      // g1: a={1,2}, b={1,4} -> CDFs at v=2: 1.0 vs 0.5 -> D=0.5
      ("g1", "a", 1L), ("g1", "a", 2L), ("g1", "b", 1L), ("g1", "b", 4L),
      // g2: identical -> 0
      ("g2", "a", 5L), ("g2", "b", 5L),
      // g3: disjoint supports -> 1
      ("g3", "a", 1L), ("g3", "b", 9L))
      .toDF("grp", "side", "v")
    val out = Stats.ksTwoSample(df, Seq("grp"), col("side"), col("v"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getDouble(3))).toSeq
    assert(out === Seq(("g1", 0.5), ("g2", 0.0), ("g3", 1.0)))
    // max is order-independent: repartition invariance
    val again = Stats.ksTwoSample(df.repartition(5), Seq("grp"),
      col("side"), col("v")).orderBy("grp").collect()
      .map(r => (r.getString(0), r.getDouble(3))).toSeq
    assert(again === out)
  }

  test("mutualInfo: ln2 on a dependent pair, 0 on independent, exact entropies") {
    val df = Seq(
      ("g", "A", 1L), ("g", "A", 1L), ("g", "B", 2L), ("g", "B", 2L),
      ("h", "A", 1L), ("h", "A", 2L), ("h", "B", 1L), ("h", "B", 2L))
      .toDF("grp", "x", "y")
    val out = Stats.mutualInfo(df, Seq("grp"), col("x"), col("y"))
      .orderBy("grp").collect()
    val ln2 = math.rint(math.log(2) * 1e6) / 1e6
    // g: fully dependent -> MI = H = ln 2; h: independent -> MI = 0
    assert(out(0).getLong(1) === 4L && out(0).getLong(2) === 2L &&
      out(0).getDouble(3) === ln2 && out(0).getDouble(4) === ln2 &&
      out(0).getDouble(5) === ln2)
    assert(out(1).getLong(2) === 4L && out(1).getDouble(3) === 0.0 &&
      out(1).getDouble(4) === ln2 && out(1).getDouble(5) === ln2)
    // fixed-order folds: repartition invariance
    val again = Stats.mutualInfo(df.repartition(7), Seq("grp"),
      col("x"), col("y")).orderBy("grp").collect().toSeq
    assert(again === out.toSeq)
  }

  test("ngramNovelty: first-owner fractions, sub-3-word docs absent") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c"),
      (3L, "x y z a b c"), (4L, "hi")).toDF("doc_id", "text")
    val out = Corpus.ngramNovelty(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc1 owns {abc,bcd}; doc2's {abc} is owned by doc1; doc3 owns 3 of 4
    assert(out.toSeq === Seq((1L, 2L, 2L, 1.0), (2L, 1L, 0L, 0.0),
      (3L, 4L, 3L, 0.75)))
  }

  test("pathNgrams: trigram paths per key, short sequences dropped") {
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C"), (1L, 4L, "D"),
      (2L, 1L, "A"), (2L, 2L, "B"), // too short for n=3
      (3L, 1L, "A"), (3L, 2L, "B"), (3L, 3L, "C"))
      .toDF("uid", "seq", "e")
    val out = Temporal.pathNgrams(ev, Seq("uid"), Seq(col("seq")),
        col("e"), n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("A>B>C", 2L), ("B>C>D", 1L)))
  }

  test("tokenBudgetMix: stratum cut overshoots by at most one doc") {
    // md5 order of ids 1..5 is deterministic; compute it test-side
    def h(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val docs = Seq((1L, 40L), (2L, 40L), (3L, 40L), (4L, 40L), (5L, 40L))
      .map { case (i, t) => ("s", i, t) }.toDF("src", "id", "tok")
    val out = graft.operators.Corpus.tokenBudgetMix(
        docs, Seq("src"), "id", col("tok"), budget = 100L)
      .collect().map(_.getLong(1)).toSet
    // kept = first ceil(100/40)=3 docs in md5 order (cum before: 0,40,80)
    val expect = (1L to 5L).sortBy(h).take(3).toSet
    assert(out === expect)
    // budget below the first doc still keeps exactly one per stratum
    val one = graft.operators.Corpus.tokenBudgetMix(
        docs, Seq("src"), "id", col("tok"), budget = 10L).collect()
    assert(one.length === 1 && one.head.getLong(1) === (1L to 5L).minBy(h))
  }

  test("chi2TopItems: hand-checked 2x2 statistic, ubiquitous item dropped") {
    // 10 ids, classes A(5)/B(5); "t" in 4 A-ids + 1 B-id; "u" in all 10
    val rows =
      (1L to 10L).map(i => (i, if (i <= 5) "A" else "B", "u")) ++
        Seq(1L, 2L, 3L, 4L, 6L).map(i => (i, if (i <= 5) "A" else "B", "t"))
    val pres = rows.toDF("id", "cls", "item")
    val out = Stats.chi2TopItems(pres, "id", "cls", "item",
        minDf = 1, k = 5)
      .orderBy("cls", "item").collect()
    //   a=4, tc=5, lc=5, N=10 -> det=15, chi2 = 10*225/(5*5*5*5) = 3.6
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3))).toSeq ===
      Seq(("A", "t", 4L, 3.6), ("B", "t", 1L, 3.6)))
  }
}
