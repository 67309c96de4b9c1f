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
    spark.stop()
  }
}
