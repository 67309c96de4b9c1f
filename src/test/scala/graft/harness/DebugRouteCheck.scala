package graft

/** Scratch: report every registry query where the WCOJ router fires (and
  * its RouteStats), so a routing-guard change can be audited against the
  * whole workload in one pass — a JOB text that silently started routing
  * would otherwise only show up as a bench delta. */
object DebugRouteCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("8")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = SparkEntry.queries.keys.toSeq.sorted
    var fired = 0
    names.foreach { n =>
      graft.plans.WcojJoinRule.clearStats()
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        df.queryExecution.optimizedPlan
        graft.plans.WcojJoinRule.lastRoute.foreach { r =>
          fired += 1
          println(s"ROUTED $n -> core=${r.nrRelations}/${r.nrGraphLeaves} " +
            s"vars=${r.nrVars} payload=${r.payloadLeaves} cells=${r.cells} " +
            s"pinned=${r.pinnedVars}")
        }
      } catch { case e: Throwable =>
        println(s"ERROR $n -> ${String.valueOf(e.getMessage).take(100)}") }
    }
    println(s"TOTAL routed: $fired of ${names.size}")
    spark.stop()
  }
}
