package graft.harness

import graft.Db
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-attribution probe for the q55 PPJoin second decade: the text2
  * run's @100x point (500k token-suffixed docs) ran >45 min against an
  * 8.7 s @10x — exponent ≥2.5 where the plan shape says ~linear. This
  * main replays jaccardPairs stage by stage (same code structure) and
  * counts/times each intermediate, at a caller-chosen copy factor:
  * `tools/run.sh graft.harness.DebugPpjoin /root/testdata/sf0.1 30`.
  */
object DebugPpjoin {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = args(1).toInt
    val threshold = 0.3
    val spark = graft.GraftSession.create("32")
    spark.sparkContext.setLogLevel("ERROR")
    val docs1 = Db(spark, sfDir).documents
      .select("doc_id", "text").localCheckpoint(true)
    val docs = (0 until k).map { i =>
      docs1.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"~$i"))), " ").as("text"))
    }.reduce(_ union _).repartition(32).localCheckpoint(true)
    println(s"PROBE docs=${docs.count()}")

    val sets = t("shingleSets+checkpoint") {
      val s = graft.operators.TextDedup.shingleSets(docs, "doc_id", "text")
        .localCheckpoint(false)
      println(s"PROBE   sets rows=${s.count()}")
      s
    }
    val rows = sets.select(col("doc_id"), col("nsh"), explode(col("h0")).as("s"))
    t("rows count")(println(s"PROBE   rows=${rows.count()}"))
    val dfreq = rows.groupBy("s").agg(count(lit(1)).as("dfreq"))
    t("dfreq count")(println(s"PROBE   dfreq=${dfreq.count()}"))
    val prefixLen =
      (col("nsh") - ceil(lit(threshold) * col("nsh") - lit(1e-6)) + 1).cast("int")
    val prefix = rows.join(dfreq, Seq("s"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("dfreq"), col("s")))).as("arr"),
        max(col("nsh")).as("nsh"))
      .select(col("doc_id"), col("nsh"),
        posexplode(slice(col("arr"), lit(1), prefixLen)).as(Seq("pos", "w")))
      .select(col("doc_id"), col("w.s").as("s"), col("w.dfreq").as("dfreq"),
        (col("pos") + 1).as("rk"), col("nsh"))
      .localCheckpoint(false)
    t("prefix build+checkpoint")(println(s"PROBE   prefix rows=${prefix.count()}"))
    val joined = prefix
      .select(col("doc_id").as("a_id"), col("s"), col("dfreq"),
        col("rk").as("ia"), col("nsh").as("na"))
      .join(prefix.select(col("doc_id").as("b_id"), col("s"),
        col("rk").as("ib"), col("nsh").as("nb")), Seq("s"))
      .filter(col("a_id") < col("b_id"))
    t("candidate join rows")(println(s"PROBE   joinRows=${joined.count()}"))
    // top hot prefix shingles: the quadratic suspects
    val hot = prefix.groupBy("s").agg(count(lit(1)).as("npref"))
      .orderBy(col("npref").desc).limit(5).collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
    println(s"PROBE hot prefix shingles (hash:docCount): $hot")
    val pairs = t("full jaccardPairs") {
      graft.operators.TextDedup.jaccardPairs(docs, "doc_id", "text", threshold).count()
    }
    println(s"PROBE pairs=$pairs")
    spark.stop()
  }
}
