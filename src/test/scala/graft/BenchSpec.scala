package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's capture self-adjudication (VERDICT r12 #4), replayed
  * against the REAL committed capture history: every quiet same-code
  * capture must read clean, every loaded-window driver artifact must
  * flag itself. No Spark session needed — the predicate is pure.
  */
class BenchSpec extends AnyFunSuite {

  test("contaminatedCapture replays the committed capture history") {
    // quiet same-code captures (docs/bench_passes_*.csv headers:
    // cpu, entries, start/end 1-min loadavg)
    assert(!Bench.contaminatedCapture(1169.7, 255, "sf0.1", 1.12, 1.75)) // r11p
    assert(!Bench.contaminatedCapture(1227.5, 268, "sf0.1", 1.61, 2.90)) // r12b
    assert(!Bench.contaminatedCapture(1299.3, 279, "sf0.1", 1.15, 2.73)) // r12e
    assert(!Bench.contaminatedCapture(1482.9, 281, "sf0.1", 0.89, 1.93)) // r13
    // the driver's loaded-window artifacts (BENCH_r11/BENCH_r12.json),
    // each independently adjudicated contaminated by the r11/r12
    // verdicts: the CPU-inflated signature (loadavg looked ordinary)
    assert(Bench.contaminatedCapture(4207.9, 255, "sf0.1", 2.4, 2.9))
    assert(Bench.contaminatedCapture(3035.3, 279, "sf0.1", 2.2, 1.9))
    // the DELIBERATELY loaded r13 rerun (40 memory-churn hogs,
    // docs/bench_passes_r13b.csv): wall 383 s vs 217 quiet, process CPU
    // still IN band — the wall-inflated signature only loadavg catches
    assert(Bench.contaminatedCapture(1325.9, 281, "sf0.1", 31.2, 42.9))
    // the slice-stolen signature: quiet cpu and load, but /proc/stat
    // steal in double digits over the run (shared-physical-host
    // neighbors — idle steal on this box reads ~2.3%)
    assert(Bench.contaminatedCapture(1400.0, 281, "sf0.1", 2.0, 2.0,
      stealPct = 25.0))
    assert(!Bench.contaminatedCapture(1400.0, 281, "sf0.1", 2.0, 2.0,
      stealPct = 2.3))
  }

  test("derived quiet band replays the committed capture history") {
    // the live ceiling comes from docs/bench_passes_r*.csv (per-round
    // cleanest cpu/query, last 3 rounds, median × 1.8) — replay the REAL
    // committed files through the parser and re-adjudicate the history
    // under the derived band, exactly as Bench.main will
    val hist = Bench.capturesFromCsvDir(new java.io.File("docs"))
    assert(hist.nonEmpty, "committed capture history must parse")
    val ceiling = Bench.derivedCpuCeiling(hist)
    // the derived band must stay near the hand calibration (quiet
    // captures read 4.4–5.3 cpu/query; contaminated driver windows >10)
    assert(ceiling > 6.0 && ceiling < 10.0, s"derived ceiling $ceiling")
    // quiet references stay clean under the derived band...
    assert(!Bench.contaminatedCapture(1349.7, 282, "sf0.1", 1.0, 2.0,
      stealPct = 0.5, cpuCeiling = ceiling)) // r13c definitive
    assert(!Bench.contaminatedCapture(1299.3, 279, "sf0.1", 1.15, 2.73,
      cpuCeiling = ceiling)) // r12e
    // ...and the driver's loaded windows still flag under it
    assert(Bench.contaminatedCapture(4207.9, 255, "sf0.1", 2.4, 2.9,
      cpuCeiling = ceiling)) // BENCH_r11
    assert(Bench.contaminatedCapture(3035.3, 279, "sf0.1", 2.2, 1.9,
      cpuCeiling = ceiling)) // BENCH_r12
    assert(Bench.contaminatedCapture(9162.8, 282, "sf0.1", 2.9, 2.2,
      stealPct = 1.3, cpuCeiling = ceiling)) // BENCH_r13
  }

  test("derivedCpuCeiling falls back without history and uses last 3 rounds") {
    assert(Bench.derivedCpuCeiling(Nil) == Bench.quietCpuPerQueryCeiling)
    assert(Bench.derivedCpuCeiling(Seq((13, 5.0))) ==
      Bench.quietCpuPerQueryCeiling) // one round is not a band
    // per-round MIN (the cleanest capture) feeds the median: round 12's
    // contaminated 10.9 is ignored in favor of its quiet 4.6
    val h = Seq((11, 4.6), (11, 16.5), (12, 4.6), (12, 10.9), (13, 4.8),
      (10, 99.0), (9, 99.0)) // rounds 9/10 fall outside the last-3 window
    assert(math.abs(Bench.derivedCpuCeiling(h) - 1.8 * 4.6) < 1e-9)
  }

  test("cleanestIndex: first clean attempt wins, else least-poisoned") {
    // the retry loop's selection (VERDICT r13 #1): a contaminated first
    // attempt followed by a clean rerun ships the rerun
    assert(Bench.cleanestIndex(Seq(true, false), Seq(12.0, 4.6)) == 1)
    assert(Bench.cleanestIndex(Seq(false), Seq(4.6)) == 0)
    // all attempts contaminated: ship the one that burned least cpu/query,
    // still flagged honestly by its own telemetry
    assert(Bench.cleanestIndex(Seq(true, true, true),
      Seq(12.0, 9.1, 10.4)) == 1)
  }

  test("contaminatedCapture is calibrated at sf0.1 only and total-safe") {
    assert(!Bench.contaminatedCapture(4207.9, 255, "sf0.01", 31.0, 31.0))
    assert(!Bench.contaminatedCapture(4207.9, 255, "sf0.001", 2.0, 2.0))
    assert(!Bench.contaminatedCapture(100.0, 0, "sf0.1", 2.0, 2.0))
    // unreadable proc files (-1 samples) are unknown, not incriminating
    assert(!Bench.contaminatedCapture(1400.0, 281, "sf0.1", -1.0, -1.0,
      stealPct = -1.0))
  }
}
