package graft

import org.apache.spark.sql.functions._

/** Long-session memory check (not a driver surface): 500 queries with
  * distinct literals — every one a new canonicalized plan — must leave the
  * order/sample caches at their LRU bounds and cached storage near zero
  * (localCheckpoint blocks are ContextCleaner-freed once results are GC'd).
  */
object DebugLeak {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("8")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val d = Db(spark, dir)
    def report(tag: String): Unit = {
      val storage = spark.sparkContext.getRDDStorageInfo
      println(s"$tag: orderCache=${plans.UctJoinReorderRule.cacheSize} " +
        s"sampleStore=${plans.SampleStore.size} " +
        s"cachedRDDs=${storage.length} " +
        f"memUsedMB=${storage.map(_.memSize).sum / 1e6}%.1f")
    }
    report("start")
    for (i <- 1 to 500) {
      // distinct literal per iteration -> distinct canonicalized plan keys
      val n = d.lineitem
        .join(d.orders.filter(col("o_totalprice") > (1000.0 + i)),
          col("l_orderkey") === col("o_orderkey"))
        .join(d.customer.filter(col("c_acctbal") > (i % 97)),
          col("o_custkey") === col("c_custkey"))
        .join(d.nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").count().count()
      if (i % 25 == 0) {
        // and a dedup operator pass so checkpoint blocks churn too
        graft.operators.TextDedup
          .jaccardPairs(d.documents, "doc_id", "text", 0.25 + (i % 10) / 100.0)
          .count()
        System.gc()
        report(s"iter $i (rows=$n)")
      }
    }
    System.gc(); Thread.sleep(1000)
    report("end")
    spark.stop()
  }
}
