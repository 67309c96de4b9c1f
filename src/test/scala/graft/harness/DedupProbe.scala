package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch: split a registry query's wall into executed-job time vs
  * driver-side gap (planning, codegen, checkpoint bookkeeping) — the
  * q91/q199 chain runs several eager actions (checkpoints, counts,
  * collects) whose job time may be a fraction of the wall.
  * Usage: tools/run.sh graft.DedupProbe <sfDir> <query> [reps]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.create()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val db = Db(spark, sfDir)
    Db.tableNames.foreach { n => if (n == "events") db.events else db.table(n) }
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        if (t0 != null) jobs.add((j.jobId, System.nanoTime() - t0))
      }
    })
    (1 to reps).foreach { rep =>
      jobs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(qname)(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(200) // drain listener bus
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      val jobMs = js.map(_._2 / 1e6)
      System.err.println(f"DPROBE rep$rep wall=$wall%.0f ms jobs=${js.size} " +
        f"jobSum=${jobMs.sum}%.0f ms gap=${wall - jobMs.sum}%.0f ms " +
        s"perJob=[${jobMs.map(m => f"$m%.0f").mkString(",")}]")
    }
    spark.stop()
  }
}
