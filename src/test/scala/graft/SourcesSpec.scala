package graft

import java.nio.file.Files

import graft.sources.Csv
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV source/sink roundtrip (SURVEY §2.1 — the reference's LoadCSV surface)
  * and INTO-style materialization.
  */
class SourcesSpec extends SparkSpec {

  test("CSV roundtrip preserves values, schema, and null representation") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val src = Db(spark, sf).customer
      .withColumn("c_name", when(col("c_custkey") % 10 === 0, lit(null: String))
        .otherwise(col("c_name")))
    Csv.save(src, s"$dir/customer_csv", nullRepresentation = "\\N")
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val back = Csv.load(spark, s"$dir/customer_csv", schema, nullRepresentation = "\\N")
    assert(back.count() == src.count())
    assert(back.filter(col("c_name").isNull).count() ==
      src.filter(col("c_name").isNull).count())
    val origSum = src.agg(sum("c_acctbal")).collect()(0).getDouble(0)
    val backSum = back.agg(sum("c_acctbal")).collect()(0).getDouble(0)
    assert(math.abs(origSum - backSum) < 1e-6)
  }

  test("materialize registers a query result as a relation for later SQL") {
    val top = GraftSession.execute(spark, sf,
      "SELECT c_custkey, c_acctbal FROM customer ORDER BY c_acctbal DESC LIMIT 10")
    GraftSession.materialize(top, "top_customers")
    val n = spark.sql("SELECT count(*) AS n FROM top_customers").collect()(0).getLong(0)
    assert(n == 10)
  }

  test("parquet write sink roundtrips a query result") {
    val dir = Files.createTempDirectory("graft_pq").toString
    run("q13_distinct").write.mode("overwrite").parquet(s"$dir/out")
    assert(spark.read.parquet(s"$dir/out").count() == run("q13_distinct").count())
  }

  test("bucketed tables join with no shuffle exchange (index-build analog)") {
    val d = Db(spark, sf)
    GraftSession.writeBucketed(d.orders, "orders_b", "o_orderkey", 8)
    GraftSession.writeBucketed(
      d.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must be exchange-free, got:\n$plan")
      val expected = d.orders.join(
        d.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("stats listener appends a CSV row per completed action with UCT stats") {
    val out = Files.createTempDirectory("graft_stats").resolve("stats.csv").toString
    val l = GraftSession.installStatsListener(spark, out)
    try {
      graft.plans.UctJoinReorderRule.clearCache()
      // lastStats keeps the WIDEST reorder seen until reset (mid-plan
      // re-entries of one query); reset so q05's 6-relation row isn't
      // shadowed by a wider query run earlier in the suite (e.g. q110)
      graft.plans.UctJoinReorderRule.lastStats = None
      run("q05_local_supplier_volume").collect()
      // listener callbacks are asynchronous; wait for the row to land
      var tries = 0
      while (tries < 50 &&
          !scala.io.Source.fromFile(out).getLines().exists(_.contains("[")))
        { Thread.sleep(100); tries += 1 }
      val lines = scala.io.Source.fromFile(out).getLines().toSeq
      assert(lines.head.startsWith("Millis,NrRelations"))
      assert(lines.exists { l =>
        val cols = l.split(",")
        cols.length >= 5 && cols(1) == "6" && cols(2).startsWith("[")
      }, s"expected a 6-relation UCT row, got:\n${lines.mkString("\n")}")
    } finally spark.listenerManager.unregister(l)
  }

  test("graft SQL functions are registered with arity validation") {
    val d = Db(spark, sf)
    d.registerAll()
    // positive: every registered function evaluates through SQL
    val r = spark.sql("""
      SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
             graft_simhash64(graft_ngram_hashes(array('a','b','c'), 1)) AS sh,
             graft_sorted_intersect_count(array(1L,2L,3L), array(2L,3L,4L)) AS ic,
             size(graft_minhash_bands(array(1L,2L), 4, 2)) AS mb,
             size(graft_hyperplane_buckets(array(0.5d, -0.5d), 4, 3)) AS hb
    """).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(2) == 2)
    assert(r.getInt(3) == 4)
    assert(r.getInt(4) == 4)
    // null array elements: grams touching a null word are skipped, not NPE
    val nulls = spark.sql(
      "SELECT size(graft_ngram_hashes(array('a', CAST(NULL AS STRING), 'b'), 1)) AS n1, " +
      "size(graft_ngram_hashes(array('a', CAST(NULL AS STRING), 'b', 'c'), 2)) AS n2")
      .collect()(0)
    assert(nulls.getInt(0) == 2) // 'a', 'b'
    assert(nulls.getInt(1) == 1) // only ('b','c'); grams with the null skipped
    // negative: wrong arity is an AnalysisException, not an index error
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(array(1.0d))").collect()
    }
    assert(e.getMessage.contains("graft_dot"))
    // negative: non-literal tuning argument is a proper analysis error
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_ngram_hashes(array('a'), c_nationkey) FROM customer").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("foldable"))
  }
}
