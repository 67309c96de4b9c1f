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
    // candidate-stage volume: prefix-join rows vs surviving candidates.
    // NOTE: deliberately mirrors the internal stages of
    // TextDedup.jaccardPairs — keep in sync when tuning its pruning bounds.
    {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val t = 0.3
      val sets = TextDedup.shingleSets(docs, "doc_id", "text").localCheckpoint(false)
      val rows = sets.select(col("doc_id"), col("nsh"), explode(col("h0")).as("s"))
      val dfreq = rows.groupBy("s").agg(count(lit(1)).as("dfreq"))
      val ranked = rows.join(dfreq, Seq("s"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("dfreq"), col("s"))))
      val prefix = ranked
        .filter(col("rk") <= col("nsh") - ceil(lit(t) * col("nsh")) + 1)
        .select(col("doc_id"), col("s"), col("dfreq"), col("rk"), col("nsh"))
      val joined = prefix
        .select(col("doc_id").as("a_id"), col("s"), col("dfreq"),
          col("rk").as("ia"), col("nsh").as("na"))
        .join(prefix.select(col("doc_id").as("b_id"), col("s"),
          col("rk").as("ib"), col("nsh").as("nb")), Seq("s"))
        .filter(col("a_id") < col("b_id"))
      println("prefix-join rows: " + joined.count())
      val grouped = joined.groupBy("a_id", "b_id")
        .agg(max("na").as("na"), max("nb").as("nb"), count(lit(1)).as("cpc"),
          min(struct(col("dfreq"), col("s"), col("ia"), col("ib"))).as("fw"),
          max(struct(col("dfreq"), col("s"), col("ia"), col("ib"))).as("lw"))
      println("distinct pairs: " + grouped.count())
      val alpha = ceil(lit(t / (1 + t)) * (col("na") + col("nb")) - lit(1e-6))
      val surviving = grouped.filter(
        col("nb") >= lit(t) * col("na") && col("na") >= lit(t) * col("nb") &&
        least(col("na") - col("fw.ia"), col("nb") - col("fw.ib")) + 1 >= alpha &&
        col("cpc") + least(col("na") - col("lw.ia"), col("nb") - col("lw.ib")) >= alpha &&
        col("cpc") >= alpha + 1 -
          greatest(ceil(lit(t) * col("na") + lit(1e-6)),
                   ceil(lit(t) * col("nb") + lit(1e-6))))
      println("surviving candidates: " + surviving.count())
    }
    spark.stop()
  }
}
