package graft

/** Scratch: time named registry queries exactly the way the bench does
  * (two passes, toRdd.foreach materialization, min) with a steal stamp
  * per pass — the single-query iteration loop for optimization work.
  * Usage: tools/run.sh graft.TimeQueries <sfDir> <query...>
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = GraftSession.create()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val db = Db(spark, sfDir)
    Db.tableNames.foreach { n => if (n == "events") db.events else db.table(n) }
    queries.OperatorGates.ensureFixtures(spark, sfDir)
    if (names.exists(n => n.matches("q1[1-6]\\d_.*")))
      { sources.Imdb.ensure(spark); sources.Tpch.ensure(spark, sfDir) }
    def once(name: String): Double = {
      val (s0, t0ticks) = Bench.stealSample()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      val t = (System.nanoTime() - t0) / 1e9
      val (s1, t1ticks) = Bench.stealSample()
      val st = if (s0 < 0 || t1ticks <= t0ticks) -1.0
        else 100.0 * (s1 - s0) / (t1ticks - t0ticks)
      System.err.println(f"TIME $name pass $t%.3f s steal=$st%.1f%%")
      t
    }
    names.foreach { n =>
      val t = math.min(once(n), once(n))
      println(f"TIME $n best $t%.3f s")
    }
    spark.stop()
  }
}
