object Q179Bench {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val dir = "/root/testdata/sf0.1"
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q179_fuzzy_match")(spark, dir).queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    println(f"q179 pass1=${once()}%.2f pass2=${once()}%.2f")
    val n = graft.SparkEntry.queries("q179_fuzzy_match")(spark, dir).count()
    println(s"rows=$n")
    spark.stop()
  }
}
