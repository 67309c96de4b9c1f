package graft

/** Scratch phase-timing breakdown for the JOB-width queries (not a driver
  * surface): where does cold wall-clock go — UCT sampling, UCT search,
  * physical planning/codegen, or execution?
  */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm JVM
    val db = Db(spark, dir)
    db.region.join(db.nation,
      org.apache.spark.sql.functions.col("r_regionkey") ===
        org.apache.spark.sql.functions.col("n_regionkey")).count()
    // q105 phase split: pair generation vs propagation rounds
    locally {
      val emb = Db(spark, dir).embeddings
      val t0 = System.nanoTime()
      val pairs = graft.operators.Similarity
        .nearDupPairsExact(emb, "vec_id", "embedding", 0.4)
        .localCheckpoint(false)
      val np = pairs.count()
      val t1 = System.nanoTime()
      val nc = graft.operators.TextDedup
        .duplicateClusters(emb, "vec_id", pairs).count()
      val t2 = System.nanoTime()
      println(f"q105 split: pairs($np) ${(t1 - t0) / 1e9}%.2f s, " +
        f"clusters($nc) ${(t2 - t1) / 1e9}%.2f s in " +
        s"${graft.operators.TextDedup.lastPropagationRounds} rounds")
    }
    for (q <- Seq("q80_job_snowflake8", "q83_job_wide12", "q86_job_chain9",
                  "q91_dedup_clusters")) {
      graft.plans.UctJoinReorderRule.clearCache()
      graft.plans.SampleStore.clear()
      graft.plans.UctJoinReorderRule.lastStats = None
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.optimizedPlan // triggers analysis + optimization (UCT)
      val t2 = System.nanoTime()
      df.queryExecution.executedPlan // physical planning
      val t3 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ()) // execution (incl. codegen)
      val t4 = System.nanoTime()
      def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.2f"
      val st = graft.plans.UctJoinReorderRule.lastStats
      println(f"$q%-22s build ${s(t0, t1)} opt ${s(t1, t2)} phys ${s(t2, t3)} " +
        f"exec ${s(t3, t4)} | uct: ${st.map(x => f"samples ${x.sampleMs}%.0f ms search ${x.searchMs}%.0f ms").getOrElse("-")}")
    }
    spark.stop()
  }
}
