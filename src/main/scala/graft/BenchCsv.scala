package graft

import java.nio.file.{Files, Paths}

import graft.plans.UctJoinReorderRule

/** Per-query stats CSV — the analog of the reference's `bench` command output
  * (/root/reference/src/benchmark/BenchUtil.java:66-113, JoinStats.java
  * vocabulary): wall millis, result rows, and for queries where the UCT rule
  * fired, the relation count, learned order, episodes, tree size, and the
  * PLAN-TIME cost split (sample-collection vs tree-search millis). The
  * trailing columns record the WCOJ router's decision (fired?, core leaf
  * count, variable count, grid cells, payload join-backs, skew-pinned
  * variables) so plan-time routing is trackable across rounds the same way
  * join stats are.
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
      "Query,Millis,Rows,NrRelations,JoinOrder,NrSamples,NrUctNodes," +
        "UctSampleMs,UctSearchMs,WcojFired,WcojCore,WcojVars,WcojCells," +
        "WcojPayload,WcojPinned\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      UctJoinReorderRule.clearCache()
      UctJoinReorderRule.lastStats = None
      graft.plans.WcojJoinRule.clearStats()
      val t0 = System.nanoTime()
      val rows = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val ms = (System.nanoTime() - t0) / 1e6
      val uct = UctJoinReorderRule.lastStats
        .map(s => s"${s.nrRelations},${s.order.mkString("[", " ", "]")}," +
          f"${s.nrSamples},${s.nrUctNodes},${s.sampleMs}%.1f,${s.searchMs}%.1f")
        .getOrElse(",,,,,")
      val wcoj = graft.plans.WcojJoinRule.lastRoute
        .map(r => s"1,${r.nrRelations},${r.nrVars},${r.cells}," +
          s"${r.payloadLeaves},${r.pinnedVars.mkString("[", " ", "]")}")
        .getOrElse("0,,,,,")
      sb.append(f"$name,$ms%.1f,$rows,$uct,$wcoj\n")
    }
    Files.writeString(Paths.get(outCsv), sb.toString)
    println(s"wrote $outCsv")
    spark.stop()
  }
}
