package graft

import graft.operators.TextDedup

/** Scratch micro-bench for the dedup operators (not a driver surface). */
object DebugDedup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Db(spark, dir).documents
    spark.range(100000).agg(org.apache.spark.sql.functions.sum("id")).collect()
    for (h <- Seq(3, 6, 12)) {
      val t0 = System.nanoTime()
      val n = TextDedup.simhashPairs(docs, "doc_id", "text", h).count()
      println(f"simhash h<=$h: $n pairs, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = TextDedup.jaccardPairs(docs, "doc_id", "text", 0.3).count()
      println(f"jaccard >=0.3 (run $i): $n pairs, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
