package graft

/** Per-file timing inside the q162 composite across passes (dev harness). */
object Q162Files {
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
      val times = batch4.map { f =>
        val t0 = System.nanoTime()
        spark.sql(sources.Imdb.queryText(f)).queryExecution.toRdd.foreach(_ => ())
        f -> (System.nanoTime() - t0) / 1e9
      }
      println(f"pass$p total=${times.map(_._2).sum}%.2f " +
        times.sortBy(-_._2).take(5).map { case (f, t) => f"$f=$t%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}
