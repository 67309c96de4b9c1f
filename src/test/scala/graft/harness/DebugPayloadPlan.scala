package graft

/** Scratch: inspect the physical strategy of q170's payload join-backs —
  * the binding stream is a LogicalRDD with no stats, so the join-back may
  * default to sort-merge even when the leaf side is broadcastable. */
object DebugPayloadPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("8")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val df = SparkEntry.queries("q170_wcoj_payload_routed")(spark, dir)
    val phys = df.queryExecution.executedPlan.toString
    println("=== q170 physical (joins + exchanges only) ===")
    phys.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Scan ExistingRDD") || l.contains("HashAggregate"))
      .foreach(l => println(l.take(140)))
    spark.stop()
  }
}
