package graft

/** Scratch: confirm cyclic-but-payload registry shapes (q85) keep their
  * binary plans under the WCOJ router, and report any registry query where
  * the router fires. */
object DebugRouteCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("8")
    val dir = "/root/testdata/sf0.001"
    val names = Seq("q85_job_cycle8", "q80_job_snowflake8", "q05_local_supplier_volume",
      "q155_wcoj_triangle", "q167_wcoj_sql_routed")
    names.foreach { n =>
      graft.plans.WcojJoinRule.clearStats()
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        df.queryExecution.optimizedPlan
        println(s"$n -> route=${graft.plans.WcojJoinRule.lastRoute.isDefined}")
      } catch { case e: Throwable => println(s"$n -> error ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
