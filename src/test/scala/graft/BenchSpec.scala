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

  test("contaminatedCapture is calibrated at sf0.1 only and total-safe") {
    assert(!Bench.contaminatedCapture(4207.9, 255, "sf0.01", 31.0, 31.0))
    assert(!Bench.contaminatedCapture(4207.9, 255, "sf0.001", 2.0, 2.0))
    assert(!Bench.contaminatedCapture(100.0, 0, "sf0.1", 2.0, 2.0))
    // unreadable proc files (-1 samples) are unknown, not incriminating
    assert(!Bench.contaminatedCapture(1400.0, 281, "sf0.1", -1.0, -1.0,
      stealPct = -1.0))
  }
}
