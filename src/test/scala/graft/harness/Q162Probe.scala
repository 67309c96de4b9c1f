package graft

/** q162 bimodality probe: repeated passes in one fresh JVM, GC + sample
  * telemetry per pass (dev harness; see docs/PERF.md round 11). */
object Q162Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val dir = "/root/testdata/sf0.1"
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    sources.Imdb.ensure(spark)
    val q = args.headOption.getOrElse("q162_job_batch4")
    for (i <- 1 to 6) {
      val g0 = gcMillis(); val s0 = plans.SampleStore.scanMillis
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.foreach(_ => ())
      println(f"$q pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"gcMs=${gcMillis() - g0} sampleMs=${plans.SampleStore.scanMillis - s0}")
    }
    spark.stop()
  }
}
