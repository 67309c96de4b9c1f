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
}
