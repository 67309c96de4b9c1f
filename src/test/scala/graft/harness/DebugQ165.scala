package graft

/** Scratch timing: q165 (typed WCOJ, dictionary encode/decode) vs q155
  * (Long-domain WCOJ) — the broadcast-dict fix should bring q165 within
  * ~1.5x of q155. */
object DebugQ165 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def best(name: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      println(f"$name%-24s $t%6.2f s")
      t
    }
    val t155 = best("q155_wcoj_triangle")
    val t165 = best("q165_wcoj_typed")
    println(f"ratio q165/q155 = ${t165 / t155}%.2f")
    spark.stop()
  }
}
