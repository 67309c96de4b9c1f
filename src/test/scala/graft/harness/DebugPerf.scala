package graft

import org.apache.spark.sql.functions._

/** Scratch micro-bench for formulations and rule overhead (not a driver
  * surface). */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("32")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.range(100000).agg(sum("id")).collect()
    time("q05 with UCT rule") {
      SparkEntry.queries("q05_local_supplier_volume")(spark, dir).collect()
    }
    spark.conf.set("spark.graft.uct.enabled", "false")
    time("q05 without UCT rule") {
      SparkEntry.queries("q05_local_supplier_volume")(spark, dir).collect()
    }
    spark.conf.set("spark.graft.uct.enabled", "true")
    time("q03 with UCT rule") {
      SparkEntry.queries("q03_shipping_priority")(spark, dir).collect()
    }
    spark.conf.set("spark.graft.uct.enabled", "false")
    time("q03 without UCT rule") {
      SparkEntry.queries("q03_shipping_priority")(spark, dir).collect()
    }
    for (q <- Seq("q83_job_wide12", "q82_job_pairs10", "q81_job_part9")) {
      spark.conf.set("spark.graft.uct.enabled", "true")
      graft.plans.UctJoinReorderRule.clearCache()
      graft.plans.SampleStore.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan
      println(f"$q: cold planning ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).collect()
      println(f"$q: exec after warm plan ${(System.nanoTime() - t1) / 1e9}%.2f s")
      spark.conf.set("spark.graft.uct.enabled", "false")
      val t2 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).collect()
      println(f"$q: catalyst-only total ${(System.nanoTime() - t2) / 1e9}%.2f s")
    }
    spark.conf.set("spark.graft.uct.enabled", "true")
    spark.stop()
  }
}
