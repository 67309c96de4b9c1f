package graft

/** Scratch: per-file timing inside one JOB composite entry (VERDICT r15
  * #5) — runs each of the batch's 16 files individually (2 passes, min)
  * so the dominator is identifiable without changing what the batch
  * computes. Usage: tools/run.sh graft.JobBatchProbe <batchIndex 1-6>
  */
object JobBatchProbe {
  def main(args: Array[String]): Unit = {
    val batchIdx = args(0).toInt
    val spark = GraftSession.create()
    spark.range(1000000).selectExpr("sum(id)").collect()
    sources.Imdb.ensure(spark)
    val individualFiles = Set("06d.sql", "10a.sql", "17a.sql",
      "33c.sql", "03b.sql", "01a.sql", "32a.sql", "08c.sql", "07b.sql",
      "16b.sql", "13a.sql", "21a.sql", "19c.sql", "22b.sql", "26a.sql",
      "28a.sql", "29b.sql")
    val rest = sources.Imdb.queryFiles.map(_.getFileName.toString)
      .filterNot(individualFiles)
    val files = rest.zipWithIndex.filter(_._2 % 6 == batchIdx - 1)
      .map(_._1).sorted
    def once(f: String): Double = {
      val t0 = System.nanoTime()
      spark.sql(sources.Imdb.queryText(f)).queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    val timed = files.map { f => (f, math.min(once(f), once(f))) }
    timed.sortBy(-_._2).foreach { case (f, t) =>
      println(f"JPROBE $f $t%.3f s")
    }
    println(f"JPROBE total ${timed.map(_._2).sum}%.3f s")
    spark.stop()
  }
}
