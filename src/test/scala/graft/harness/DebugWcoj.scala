package graft

/** Scratch driver for the WCOJ routing rule: runs the triangle census as
  * SQL TEXT through the session (the path a real user takes) and reports
  * whether WcojJoinRule fired, the plan shape, and binary-vs-WCOJ timing.
  */
object DebugWcoj {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.create()
    val sql = """
      WITH e AS (
        SELECT DISTINCT
          LEAST(l_partkey % 211, l_suppkey % 211) AS src,
          GREATEST(l_partkey % 211, l_suppkey % 211) AS dst
        FROM lineitem
        WHERE l_quantity <= 2 AND (l_partkey % 211) <> (l_suppkey % 211)
      )
      SELECT e1.src AS a, count(*) AS tri_cnt
      FROM e e1
      JOIN e e2 ON e2.src = e1.dst
      JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
      GROUP BY 1 ORDER BY 1"""

    // warm the JVM on an unrelated query so neither path pays startup
    Db(spark, dir).lineitem.groupBy("l_returnflag").count().collect()

    def time(enabled: Boolean): (Array[org.apache.spark.sql.Row], Double) = {
      spark.conf.set("spark.graft.wcoj.enabled", enabled.toString)
      val t0 = System.nanoTime()
      val rows = GraftSession.execute(spark, dir, sql).collect()
      ((rows, (System.nanoTime() - t0) / 1e9))
    }
    graft.plans.WcojJoinRule.clearStats()
    val (r1, tW1) = time(true)
    println(s"WCOJ route stats: ${graft.plans.WcojJoinRule.lastRoute}")
    val (_, tW2) = time(true)
    val (r2, tB1) = time(false)
    val (_, tB2) = time(false)
    println(f"testdata: wcoj ${tW1}%.2f/${tW2}%.2f s binary ${tB1}%.2f/${tB2}%.2f s rows=${r1.length}")
    require(r1.map(_.toString).sameElements(r2.map(_.toString)), "MISMATCH")
    spark.conf.set("spark.graft.wcoj.enabled", "true")
    val df = GraftSession.execute(spark, dir, sql)
    println(df.queryExecution.optimizedPlan.treeString.take(1500))

    // densified fixture: ~n-node random graph at density p — wedge count
    // makes every binary plan materialize a huge intermediate
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(4000)
    val pct = args.drop(2).headOption.map(_.toInt).getOrElse(15)
    import org.apache.spark.sql.functions._
    val g = spark.range(0, n.toLong * n)
      .select((col("id") / n).cast("long").as("src"),
        (col("id") % n).cast("long").as("dst"))
      .where(col("src") < col("dst") &&
        pmod(hash(col("src"), col("dst")), lit(100)) < pct)
    g.createOrReplaceTempView("dense_g")
    val dsql = """
      WITH e AS (SELECT DISTINCT src, dst FROM dense_g)
      SELECT count(*) AS tri FROM e e1
      JOIN e e2 ON e2.src = e1.dst
      JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst"""
    def dtime(enabled: Boolean): (Long, Double) = {
      spark.conf.set("spark.graft.wcoj.enabled", enabled.toString)
      val t0 = System.nanoTime()
      val c = spark.sql(dsql).collect()(0).getLong(0)
      ((c, (System.nanoTime() - t0) / 1e9))
    }
    val (cW, tW) = dtime(true); val (cW2, tWb) = dtime(true)
    val (cB, tB) = dtime(false); val (cB2, tBb) = dtime(false)
    println(s"dense route stats: ${graft.plans.WcojJoinRule.lastRoute}")
    println(f"dense n=$n: wcoj $tW%.2f/$tWb%.2f s binary $tB%.2f/$tBb%.2f s " +
      s"tri=$cW/$cW2 vs $cB/$cB2")
    require(cW == cB && cW2 == cB2 && cW == cW2, "dense MISMATCH")
    println("results MATCH")
    spark.stop()
  }
}
