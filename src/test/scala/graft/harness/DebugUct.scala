package graft

/** Scratch diagnostics for the UCT rule (not part of the driver contract). */
object DebugUct {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("8")
    println("extensions conf: " + spark.conf.getOption("spark.sql.extensions"))
    val opt = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.optimizer
    println("extendedOperatorOptimizationRules: " + opt.extendedOperatorOptimizationRules.map(_.ruleName))
    println("batches containing graft: " + opt.batches.filter(_.rules.exists(_.ruleName.contains("graft"))).map(b => b.name + "=" + b.rules.map(_.ruleName)))
    val df = SparkEntry.queries("q05_local_supplier_volume")(spark, "/root/testdata/sf0.001")
    val analyzed = df.queryExecution.analyzed
    println("=== analyzed joins: " + analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType.toString + "/" + j.hint
    })
    val optimized = df.queryExecution.optimizedPlan
    println("=== after pipeline optimization: lastStats = " + graft.plans.UctJoinReorderRule.lastStats)
    println(optimized.treeString.take(1500))
    val rule = new graft.plans.UctJoinReorderRule(spark)
    val out = rule.apply(df.queryExecution.withCachedData)
    println("=== after manual rule application: lastStats = " + graft.plans.UctJoinReorderRule.lastStats)
    println(out.treeString.take(1500))
    spark.stop()
  }
}
