package graft

import graft.operators.{Audit, Eval, Features, Robust, Temporal}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Differential property tests for the round-12 operators: seeded random
  * inputs (deterministic run-to-run), each operator checked against a
  * brute-force in-memory recomputation of its contract — the invariants
  * a hand-picked example can't sweep. Inputs stay small (≤ 300 rows) so
  * each case is one fast local job; seeds are fixed so a failure
  * reproduces exactly.
  */
class PropertySpec extends SparkSpec {
  private val session = SparkSpec.session
  import session.implicits._

  test("doubleEvents equals the brute-force quadratic pair set") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      val rows = (1L to 200L).map { id =>
        (rnd.nextInt(5).toLong, rnd.nextInt(8).toLong,
          rnd.nextInt(1000).toLong, id)
      }
      val w = 50L + rnd.nextInt(100)
      val got = Audit.doubleEvents(rows.toDF("k", "amt", "t", "id"),
          Seq("k"), col("t"), col("id"), col("amt"), windowMicros = w)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        .toSet
      val want = (for {
        a <- rows; b <- rows
        if a._1 == b._1 && a._2 == b._2
        if b._3 > a._3 || (b._3 == a._3 && b._4 > a._4)
        if b._3 - a._3 <= w
      } yield (a._1, a._4, b._4)).toSet
      assert(got === want, s"seed=$seed w=$w")
    }
  }

  test("sequenceGaps fields reconstruct from the brute-force value sets") {
    for (seed <- Seq(7, 8)) {
      val rnd = new Random(seed)
      val rows = (1 to 250).map { _ =>
        (rnd.nextInt(6).toLong,
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(40).toLong))
      }
      val got = Audit.sequenceGaps(rows.toDF("k", "s"), Seq("k"), col("s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(6), r.getLong(7), r.getLong(8))).toMap
      rows.groupBy(_._1).foreach { case (k, rs) =>
        val vals = rs.flatMap(_._2)
        val distinct = vals.distinct.sorted
        val (nR, nN, nV, miss, dup, gap) = got(k)
        assert(nR === rs.size && nN === rs.count(_._2.isEmpty))
        assert(nV === distinct.size)
        if (distinct.nonEmpty) {
          assert(miss === distinct.max - distinct.min + 1 - distinct.size)
          assert(dup === vals.size - distinct.size)
          val maxGap = if (distinct.size < 2) 0L
            else distinct.sliding(2).map(p => p(1) - p(0) - 1).max
          assert(gap === maxGap, s"seed=$seed k=$k")
        }
      }
    }
  }

  test("sequenceFunnel matches a greedy scan and ignores input order") {
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      val pat = Seq("a", "b", "c")
      val rows = (1L to 300L).map { id =>
        (rnd.nextInt(8).toLong, id, ("a" :: "b" :: "c" :: "x" :: Nil)(
          rnd.nextInt(4)))
      }
      val got = Temporal.sequenceFunnel(
          rnd.shuffle(rows).toDF("k", "t", "e").repartition(7),
          Seq("k"), col("t"), col("t"), col("e"), pat)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3))).toMap
      rows.groupBy(_._1).foreach { case (k, rs) =>
        var ptr = 0; var done = 0L
        rs.sortBy(_._2).foreach { r =>
          if (r._3 == pat(ptr)) {
            ptr += 1; if (ptr == pat.size) { done += 1; ptr = 0 }
          }
        }
        assert(got(k) === ((rs.size.toLong, done, ptr.toLong)),
          s"seed=$seed k=$k")
      }
    }
  }

  test("winsorized/trimmed means stay inside the cut interval") {
    for (seed <- Seq(21, 22, 23)) {
      val rnd = new Random(seed)
      val rows = (1L to 260L).map { id =>
        ((rnd.nextInt(3) + 'a').toChar.toString,
          rnd.nextInt(100000).toLong - 20000, id)
      }
      val out = Robust.winsorizedStats(rows.toDF("g", "v", "id"),
        Seq("g"), col("v"), col("id"), pctPermille = 50).collect()
      out.foreach { r =>
        val (n, nt, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))
        val (tm, wm) = (r.getDouble(5), r.getDouble(6))
        assert(nt === 2 * ((n * 50) / 1000) && lo <= hi)
        assert(tm >= lo && tm <= hi, s"seed=$seed trimmed outside cuts")
        assert(wm >= lo && wm <= hi, s"seed=$seed winsor outside cuts")
      }
    }
  }

  test("rankNormalize is strictly monotone on distinct values, bounded") {
    val rnd = new Random(31)
    val vals = rnd.shuffle((1 to 200).toList).take(120)
      .map(v => ("g", v.toLong * 7, v.toLong))
    val out = Features.rankNormalize(vals.toDF("g", "v", "id"),
        Seq("g"), col("v"), col("id"))
      .collect().map(r => (r.getLong(1), r.getDouble(3))).sortBy(_._1)
    assert(out.forall { case (_, p) => p >= 0.0 && p <= 1.0 })
    out.sliding(2).foreach { case Array((v1, p1), (v2, p2)) =>
      assert(p1 < p2, s"pr not strictly monotone at $v1 < $v2")
    }
    assert(out.head._2 === 0.0 && out.last._2 === 1.0)
  }

  test("aucExact: label complement flips the score, monotone transform preserves it") {
    for (seed <- Seq(41, 42)) {
      val rnd = new Random(seed)
      val rows = (1 to 150).map { _ =>
        (rnd.nextInt(40).toDouble, rnd.nextInt(2).toLong)
      }
      def auc(d: Seq[(Double, Long)]): Double =
        Eval.aucExact(d.toDF("s", "y"), col("s"), col("y"))
          .collect().head.getDouble(3)
      val a = auc(rows)
      val flipped = auc(rows.map { case (s, y) => (s, 1L - y) })
      assert(math.abs(a + flipped - 1.0) < 2e-6, s"seed=$seed: $a/$flipped")
      val scaled = auc(rows.map { case (s, y) => (s * 3 + 11, y) })
      assert(scaled === a, s"seed=$seed monotone transform moved AUC")
    }
  }

  test("mergeState over any random partial split equals direct aggregation") {
    import graft.operators.Incremental
    for (seed <- Seq(71, 72)) {
      val rnd = new Random(seed)
      val rows = (1 to 200).map { _ =>
        (s"g${rnd.nextInt(4)}", s"shard${rnd.nextInt(9)}",
          rnd.nextInt(20000).toLong - 5000)
      }
      val df = rows.toDF("g", "shard", "v")
      // two-level chain: (g, shard) partials -> per-g merge
      val chained = Incremental.mergeState(
        Incremental.aggState(df, Seq("g", "shard"), col("v")), Seq("g"))
      val direct = Incremental.aggState(df, Seq("g"), col("v"))
      def m(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toMap
      assert(m(chained) === m(direct), s"seed=$seed")
    }
  }

  test("quantilesAtScale: within one bin width of the exact nearest-rank quantile") {
    import graft.operators.Robust
    for (seed <- Seq(61, 62)) {
      val rnd = new Random(seed)
      val rows = (1L to 240L).map { id =>
        ((rnd.nextInt(2) + 'a').toChar.toString, rnd.nextInt(10000).toLong, id)
      }
      val (lo, hi, nBins) = (0L, 10000L, 100)
      val binW = (hi - lo) / nBins
      val got = Robust.quantilesAtScale(rows.toDF("g", "v", "id"),
          Seq("g"), col("v"), lo, hi, nBins, Seq(100, 500, 900))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3))
        .toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val sorted = rs.map(_._2).sorted
        for (q <- Seq(100, 500, 900)) {
          val exact = sorted((((sorted.size.toLong * q + 999) / 1000) - 1).toInt)
          val approx = got((g, q))
          assert(math.abs(approx - exact) <= binW,
            s"seed=$seed g=$g q=$q: $approx vs exact $exact (binW $binW)")
        }
      }
    }
  }

  test("bin-state merge equals the direct sketch; quantiles from state equal raw") {
    import graft.operators.Robust
    val rnd = new Random(81)
    val rows = (1L to 300L).map { _ =>
      ("g" + rnd.nextInt(3), rnd.nextInt(10000).toLong, rnd.nextInt(4))
    }
    val df = rows.toDF("g", "v", "shard")
    val direct = Robust.binState(df, Seq("g"), col("v"), 0L, 10000L, 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val sharded = Robust.binState(df, Seq("g", "shard"), col("v"),
      0L, 10000L, 100)
    val merged = Robust.mergeBinState(sharded.drop("shard"), Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(merged === direct)
    // and the quantile report from merged state equals the raw-scan path
    val fromState = Robust.quantilesFromState(
        Robust.mergeBinState(sharded.drop("shard"), Seq("g")),
        Seq("g"), 0L, 10000L, 100, Seq(250, 500, 750))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val fromRaw = Robust.quantilesAtScale(df, Seq("g"), col("v"),
        0L, 10000L, 100, Seq(250, 500, 750))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(fromState === fromRaw)
  }

  test("medianMadAtScale: med/mad within one bin width; exact on bin-aligned data") {
    import graft.operators.Robust
    for (seed <- Seq(71, 72)) {
      val rnd = new Random(seed)
      val rows = (1L to 240L).map { id =>
        ((rnd.nextInt(2) + 'a').toChar.toString, rnd.nextInt(10000).toLong, id)
      }
      val (lo, hi, nBins) = (0L, 10000L, 100)
      val binW = (hi - lo) / nBins
      val got = Robust.medianMadAtScale(rows.toDF("g", "v", "id"),
          Seq("g"), col("v"), lo, hi, nBins)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      def nr50(sorted: Seq[Long]): Long =
        sorted((((sorted.size.toLong * 500 + 999) / 1000) - 1).toInt)
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val (n, med, mad) = got(g)
        assert(n === rs.size.toLong)
        val exactMed = nr50(rs.map(_._2).sorted)
        assert(math.abs(med - exactMed) <= binW,
          s"seed=$seed g=$g med $med vs exact $exactMed")
        // mad contract: within one bin width of the exact median of the
        // deviations ABOUT THE RETURNED med (the cuts a screen applies)
        val exactMad = nr50(rs.map(r => math.abs(r._2 - med)).sorted)
        assert(math.abs(mad - exactMad) <= binW,
          s"seed=$seed g=$g mad $mad vs exact $exactMad")
      }
      // bin-aligned data (values multiples of the bin width): exact
      val aligned = rows.map { case (g, v, id) => (g, v / binW * binW, id) }
      val gotA = Robust.medianMadAtScale(aligned.toDF("g", "v", "id"),
          Seq("g"), col("v"), lo, hi, nBins)
        .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3)))
        .toMap
      aligned.groupBy(_._1).foreach { case (g, rs) =>
        val (med, mad) = gotA(g)
        assert(med === nr50(rs.map(_._2).sorted), s"aligned med g=$g")
        assert(mad === nr50(rs.map(r => math.abs(r._2 - med)).sorted),
          s"aligned mad g=$g")
      }
    }
  }

  test("sharedSpanPairs: hand spans, min-pos dedup, stop-window guard") {
    import graft.operators.TextDedup
    // docs 1 and 2 share the exact 6-token run "q r s t u v" (k=4 ⇒ 3
    // consecutive anchors on one diagonal) and nothing else; doc 3 is
    // unrelated; docs 4..9 all share one boilerplate window that the
    // maxDf=4 guard must drop entirely.
    val boiler = "x1 x2 x3 x4"
    val docs = Seq(
      (1L, "a b q r s t u v c d"),
      (2L, "e q r s t u v f g h"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")) ++
      (4L to 9L).map(i => (i, s"pre$i $boiler post$i"))
    val out = TextDedup.sharedSpanPairs(docs.toDF("id", "text"),
        "id", "text", k = 4, maxDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // one surviving pair: (1,2) with 3 anchors, 1 maximal run of 6 tokens
    assert(out.toSeq === Seq((1L, 2L, 3L, 1L, 6L)))
    // raising maxDf readmits the boilerplate window: 6 docs pair C(6,2)
    val loose = TextDedup.sharedSpanPairs(docs.toDF("id", "text"),
        "id", "text", k = 4, maxDf = 16)
      .collect()
    assert(loose.length === 1 + 15)
    // sub-k documents contribute nothing and don't break the plan
    val short = TextDedup.sharedSpanPairs(
      Seq((1L, "a b"), (2L, "a b")).toDF("id", "text"), "id", "text",
      k = 4, maxDf = 4)
    assert(short.count() === 0L)
  }

  test("hashFeatures: total signed mass bounded by token count, permutation-invariant") {
    val rnd = new Random(51)
    val docs = (1L to 40L).map { id =>
      (id, Seq.fill(rnd.nextInt(30) + 1)(s"w${rnd.nextInt(50)}")
        .mkString(" "))
    }
    val out = Features.hashFeatures(docs.toDF("id", "text"), "id", "text",
        dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    docs.foreach { case (id, text) =>
      val nTok = text.split(" ").length
      val mass = out.filter(_._1 == id).map(t => math.abs(t._3)).sum
      assert(mass <= nTok, s"doc $id signed mass $mass > tokens $nTok")
    }
    val again = Features.hashFeatures(
        rnd.shuffle(docs).toDF("id", "text").repartition(5),
        "id", "text", dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet === out.toSet)
  }
}
