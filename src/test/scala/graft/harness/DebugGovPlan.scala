package graft

/** Plan-shape audit for the scale-sensitive gates (rounds 12–14): prints
  * the join/exchange/window/sort skeleton of the physical plans so the
  * PERF log can cite the actual shapes (equi join for the double-event
  * cells, no data-rank window in the sketch quantile paths, no
  * SinglePartition sort over the two-phase-ranked axes in q257/q260).
  * Run: `tools/run.sh graft.DebugGovPlan [sfDir]`. */
object DebugGovPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("8")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    for (q <- Seq("q271_double_events", "q280_winsorized_at_scale",
        "q281_quantiles_at_scale", "q277_auc", "q279_calibration",
        "q257_rank_movers", "q260_tier_migration",
        "q288_rank_normalize_at_scale")) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, sf)
      println(df.queryExecution.executedPlan.toString.split('\n')
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Window") || l.contains("Sort") ||
          l.contains("HashAggregate"))
        .take(14).mkString("\n"))
    }
    spark.stop()
  }
}
