package graft.queries

import graft.Db
import graft.Db.dec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window/analytic functions — beyond-parity (the reference stubs
  * AnalyticExpression as a TODO, /root/reference/src/expressions/typing/
  * TypeVisitor.java:780-784). Window sums use exact decimal accumulation so
  * running totals are bit-identical to the oracle.
  */
object Analytics {

  val all: Seq[Q] = Seq(
    // --- top-k per group via row_number
    Q("q31_window_topk", Some("""
      SELECT c_mktsegment, CAST(rn AS INT) AS rn, c_custkey, c_name, c_acctbal FROM (
        SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer) t
      WHERE rn <= 3 ORDER BY c_mktsegment, rn"""),
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Db(s, dir).customer
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("c_mktsegment", "rn", "c_custkey", "c_name", "c_acctbal")
          .orderBy("c_mktsegment", "rn")
      }),

    // --- running total per customer (exact-decimal accumulation)
    Q("q32_window_running_sum", Some("""
      SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
      FROM orders ORDER BY o_custkey, o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Db(s, dir).orders
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            sum(dec(col("o_totalprice"))).over(w).cast("double").as("run_total"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    // --- lag/lead deltas
    Q("q33_window_lag_lead", Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
        lag(o_totalprice) OVER w AS prev_price,
        lead(o_totalprice) OVER w AS next_price,
        o_totalprice - lag(o_totalprice) OVER w AS delta
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Db(s, dir).orders
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    // --- dense_rank + percent_rank
    Q("q34_window_rank", Some("""
      SELECT p_brand, p_partkey, p_retailprice,
        CAST(dense_rank() OVER w AS INT) AS drank,
        round(percent_rank() OVER w, 6) AS prank
      FROM part
      WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
      ORDER BY p_brand, drank, p_partkey"""),
      (s, dir) => {
        val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
        Db(s, dir).part
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
            dense_rank().over(w).as("drank"),
            round(percent_rank().over(w), 6).as("prank"))
          .orderBy("p_brand", "drank", "p_partkey")
      })
  )
}
