package graft

import graft.sources.Imdb

/** Dev harness: build the IMDB fixture, sweep all 113 reference queries
  * (parse/plan/execute + UCT width), and print row counts for the four
  * CORRECTNESS picks. */
object DebugImdb {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val t0 = System.nanoTime()
    Imdb.ensure(spark)
    println(f"fixture built+registered in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    var ok = 0
    var empty = 0
    val failures = Seq.newBuilder[String]
    Imdb.queryFiles.foreach { f =>
      val name = f.getFileName.toString
      val text = Imdb.queryText(name)
      val width = Imdb.relationCount(text)
      graft.plans.UctJoinReorderRule.lastStats = None
      val t = System.nanoTime()
      try {
        val df = spark.sql(text)
        val rows = df.collect()
        val uctW = graft.plans.UctJoinReorderRule.lastStats.map(_.nrRelations).getOrElse(0)
        val nonNull = rows.headOption.exists(r => (0 until r.length).exists(!r.isNullAt(_)))
        if (!nonNull) empty += 1
        ok += 1
        println(f"$name%-10s width=$width%2d uct=$uctW%2d rows=${rows.length} " +
          f"nonNull=$nonNull ${(System.nanoTime() - t) / 1e9}%.2f s")
        if (uctW != width) println(s"  !! UCT width $uctW != FROM width $width")
      } catch {
        case e: Throwable =>
          failures += s"$name: ${e.getMessage.take(200)}"
          println(s"$name FAILED: ${e.getMessage.take(200)}")
      }
    }
    println(s"\nswept: $ok ok, ${failures.result().size} failed, $empty all-null results")
    failures.result().foreach(f => println(s"FAIL $f"))
    println(s"total ${(System.nanoTime() - t0) / 1e9} s")
    spark.stop()
  }
}
