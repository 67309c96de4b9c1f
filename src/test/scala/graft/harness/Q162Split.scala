package graft

/** Plan-vs-execute split for the q162 composite (dev harness). */
object Q162Split {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    sources.Imdb.ensure(spark)
    val individualFiles = Set("06d.sql", "10a.sql", "17a.sql",
      "33c.sql", "03b.sql", "01a.sql", "32a.sql", "08c.sql", "07b.sql",
      "16b.sql", "13a.sql", "21a.sql", "19c.sql", "22b.sql", "26a.sql",
      "28a.sql", "29b.sql")
    val rest = sources.Imdb.queryFiles.map(_.getFileName.toString)
      .filterNot(individualFiles)
    val batch4 = rest.zipWithIndex.filter(_._2 % 6 == 3).map(_._1).sorted
    for (p <- 1 to 4) {
      var planS = 0.0; var execS = 0.0
      batch4.foreach { f =>
        val t0 = System.nanoTime()
        val df = spark.sql(sources.Imdb.queryText(f))
        val rdd = df.queryExecution.toRdd // analysis+optimization+physical
        val t1 = System.nanoTime()
        rdd.foreach(_ => ())
        val t2 = System.nanoTime()
        planS += (t1 - t0) / 1e9; execS += (t2 - t1) / 1e9
      }
      println(f"pass$p plan=$planS%.2f exec=$execS%.2f")
    }
    spark.stop()
  }
}
