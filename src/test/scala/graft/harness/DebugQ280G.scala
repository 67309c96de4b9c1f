package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bisection harness for the q280 derived-group-key slowdown the govops3
  * decade run exposed (109 s at G=50 over 15M rows vs 2.7 s with the
  * natural 5-value priority key on the SAME rows). Times each stage of
  * `Robust.winsorizedAtScale` separately. */
object DebugQ280G {
  private def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"Q280G $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    val ord1 = Db(spark, sfDir).orders
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .localCheckpoint(true)
    val ord100 = (0 until 100).map { i =>
      ord1.select((col("o_orderkey") + lit(i.toLong * (1L << 40)))
        .as("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    }.reduce(_ union _).repartition(32).localCheckpoint(true)
    println(s"Q280G orders: ${ord100.count()}")

    def exec(df: DataFrame): Long = df.queryExecution.toRdd.count()

    for ((tag, d) <- Seq(
        ("natural5", ord100),
        ("pmod50", ord100.select(pmod(col("o_orderkey"), lit(50))
          .cast("string").as("o_orderpriority"), col("o_totalprice"),
          col("o_orderkey"))))) {
      val v = d.select(col("o_orderpriority"),
        (Db.dec(col("o_totalprice")) * 100).cast("long").as("__v"))
        .where(col("__v").isNotNull)
      // stage 1: the bin-count aggregation alone
      val bins = v.withColumn("__b", expr(
          s"(least(CAST(${59999999L} AS BIGINT), greatest(CAST(0 AS BIGINT)," +
            s" __v - 0)) * 4096) div 60000000"))
        .groupBy(col("o_orderpriority"), col("__b"))
        .agg(count(lit(1)).as("__n"))
      t(s"$tag bins-agg")(exec(bins))
      t(s"$tag bins-agg again")(exec(bins))
      // stage 2: the cumulative sketch + cut location, collected (what
      // the broadcast build must produce)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = bins.withColumn("__cum", sum(col("__n")).over(w))
        .withColumn("__N",
          sum(col("__n")).over(Window.partitionBy(col("o_orderpriority"))))
      val cuts = cum.withColumn("__t", expr("(__N * 50) div 1000"))
        .groupBy(col("o_orderpriority"))
        .agg(min(when(col("__cum") >= col("__t") + 1, col("__b")))
            .as("__loBin"),
          min(when(col("__cum") >= col("__N") - col("__t"), col("__b")))
            .as("__hiBin"))
        .withColumn("lo_cut", expr("0 + (__loBin * 60000000 + 4095) div 4096"))
        .withColumn("hi_cut", expr("0 + (__hiBin * 60000000 + 4095) div 4096"))
        .select(col("o_orderpriority"), col("lo_cut"), col("hi_cut"))
      t(s"$tag cuts-collect")(cuts.collect().length.toLong)
      // stage 3: the clamp join + final agg with a LITERAL cut table
      val cutLit = spark.createDataFrame(
        java.util.Arrays.asList(cuts.collect(): _*), cuts.schema)
      val joined = v.join(broadcast(cutLit), Seq("o_orderpriority"))
        .withColumn("__c",
          least(col("hi_cut"), greatest(col("lo_cut"), col("__v"))))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("__c").cast("decimal(38,0)")).cast("double") /
            count(lit(1)), 6).as("wm"))
      t(s"$tag clamp-join-agg")(exec(joined))
      t(s"$tag clamp-join-agg again")(exec(joined))
      // stage 4: the whole operator, twice
      def full() = exec(graft.operators.Robust.winsorizedAtScale(
        d.select(col("o_orderpriority"),
          (Db.dec(col("o_totalprice")) * 100).cast("long").as("cents")),
        Seq("o_orderpriority"), col("cents"), 0L, 60000000L, 4096, 50))
      t(s"$tag full q280")(full())
      t(s"$tag full q280 again")(full())
    }
    spark.stop()
  }
}
