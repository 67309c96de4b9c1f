package graft

import org.apache.spark.sql.functions._

/** Scratch: exercise the TopKPerKey physical operator. */
object DebugTopK {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("8")
    val df = graft.plans.TopK.perKey(
      Db(spark, "/root/testdata/sf0.001").orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    try {
      println("rows: " + df.count())
      df.explain()
    } catch { case e: Throwable =>
      var c: Throwable = e
      while (c != null) { println("CAUSE: " + c.getClass.getName + ": " + String.valueOf(c.getMessage).take(300)); c = c.getCause }
    }
    spark.stop()
  }
}
