package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain equi-join") {
    val d = Db(spark, sf)
    val plain = d.lineitem.join(d.supplier, col("l_suppkey") === col("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_name")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewJoin.saltedEquiJoin(d.lineitem, d.supplier,
        "l_suppkey", "s_suppkey", saltFactor = 8)
      .select("l_orderkey", "l_linenumber", "s_name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("salt actually spreads a hot key across partitions") {
    val d = Db(spark, sf)
    // count distinct salts assigned to the hottest supplier key
    val salted = d.lineitem.withColumn("__salt", (rand(42) * 8).cast("int"))
    val hot = salted.groupBy("l_suppkey").count().orderBy(col("count").desc)
      .first().getLong(0)
    val nSalts = salted.filter(col("l_suppkey") === hot)
      .select("__salt").distinct().count()
    assert(nSalts > 1, "hot key should be spread over multiple salt values")
  }
}
