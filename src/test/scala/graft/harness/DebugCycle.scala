package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch: why does the 4-cycle WCOJ scale superlinearly across the
  * decade? Variants: static vs dynamic order, grid size, variable order. */
object DebugCycle {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("32")
    import graft.plans.Leapfrog
    def graph(n: Int, per10k: Int): DataFrame = spark.range(0, n.toLong * n)
      .select((col("id") / n).cast("long").as("src"),
        (col("id") % n).cast("long").as("dst"))
      .where(col("src") < col("dst") &&
        pmod(hash(col("src"), col("dst")), lit(10000)) < per10k)
      .localCheckpoint(true)
    val g10 = graph(30000, 22)
    val m = g10.count()
    println(s"edges=$m")
    def cycRels(e: DataFrame) = Seq(
      (e.toDF("a", "b"), Seq("a", "b")),
      (e.toDF("b", "c"), Seq("b", "c")),
      (e.toDF("c", "d"), Seq("c", "d")),
      (e.toDF("a", "d"), Seq("a", "d")))
    val rels = cycRels(g10)
    val vars = Seq("a", "b", "c", "d")
    def run(label: String, shares: Map[String, Int], dyn: Boolean): Unit = {
      val t0 = System.nanoTime()
      val c = Leapfrog.join(spark, rels, vars, shares, dynamicOrder = dyn).count()
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$c")
    }
    val auto32 = Leapfrog.autoShares(rels.map { case (_, vs) => (vs, m) }, vars, 32)
    println(s"autoShares(32) = $auto32")
    val auto128 = Leapfrog.autoShares(rels.map { case (_, vs) => (vs, m) }, vars, 128)
    println(s"autoShares(128) = $auto128")
    run("dyn auto32", auto32, dyn = true)
    run("static auto32", auto32, dyn = false)
    run("dyn auto128", auto128, dyn = true)
    run("static auto128", auto128, dyn = false)
    spark.stop()
  }
}
