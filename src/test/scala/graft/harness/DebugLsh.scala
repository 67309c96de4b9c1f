package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Scratch recall/cost sweep for the LSH near-dup parameters (not a driver
  * surface). */
object DebugLsh {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("32")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Db(spark, dir).embeddings
      val exact = pairs(Similarity.nearDupPairsExact(e, "vec_id", "embedding", 0.4))
      for ((l, k) <- Seq((16, 4), (16, 6), (24, 6), (32, 8))) {
        val t0 = System.nanoTime()
        val got = pairs(Similarity.nearDupPairsLsh(e, "vec_id", "embedding", 0.4, l, k))
        val dt = (System.nanoTime() - t0) / 1e9
        val rec = if (exact.isEmpty) 1.0 else got.size.toDouble / exact.size
        println(f"$dir L=$l k=$k: recall $rec%.2f (${got.size}/${exact.size}), $dt%.2f s")
      }
    }
    spark.stop()
  }
}
