package graft

import java.nio.file.{Files, Paths}

import graft.plans.UctJoinReorderRule

/** Per-query stats CSV — the analog of the reference's `bench` command output
  * (/root/reference/src/benchmark/BenchUtil.java:66-113, JoinStats.java
  * vocabulary): wall millis, result rows, and for queries where the UCT rule
  * fired, the relation count, learned order, episodes and tree size.
  *
  * Usage: BenchCsv <sfDir> <outCsv>
  */
object BenchCsv {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outCsv = if (args.length > 1) args(1) else "/tmp/graft_bench.csv"
    val spark = GraftSession.create()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val sb = new StringBuilder(
      "Query,Millis,Rows,NrRelations,JoinOrder,NrSamples,NrUctNodes\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      UctJoinReorderRule.clearCache()
      UctJoinReorderRule.lastStats = None
      val t0 = System.nanoTime()
      val rows = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val ms = (System.nanoTime() - t0) / 1e6
      val uct = UctJoinReorderRule.lastStats
        .map(s => s"${s.nrRelations},${s.order.mkString("[", " ", "]")},${s.nrSamples},${s.nrUctNodes}")
        .getOrElse(",,,")
      sb.append(f"$name,$ms%.1f,$rows,$uct\n")
    }
    Files.writeString(Paths.get(outCsv), sb.toString)
    println(s"wrote $outCsv")
    spark.stop()
  }
}
