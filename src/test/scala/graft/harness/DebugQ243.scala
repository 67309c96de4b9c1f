package graft

/** Scratch: attribute q243's bench cost (8× q212 at sf0.1). */
object DebugQ243 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"DBG $tag%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
    }
    for (_ <- 1 to 2) {
      time("q212")(SparkEntry.queries("q212_resample_ffill")(spark, dir).count())
      time("q243")(SparkEntry.queries("q243_resample_interp")(spark, dir).count())
    }
    val df = SparkEntry.queries("q243_resample_interp")(spark, dir)
    df.count()
    println(df.queryExecution.executedPlan.toString
      .linesIterator.take(60).mkString("\n"))
    spark.stop()
  }
}
