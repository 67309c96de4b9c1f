package graft

import graft.Db._
import org.apache.spark.sql.functions._

/** Scratch micro-bench for aggregate formulations (not a driver surface). */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("32")
    val d = Db(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = d.lineitem.filter(col("l_shipdate") <= ts("1998-09-02"))
    time("plain double sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))),
          count(lit(1))).collect()
    }
    time("decimal sums (current q01)") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), moneySum(dec(col("l_extendedprice"))),
          moneySum(dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))),
          moneySum(dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
            * (lit(1) + rate(col("l_tax")))),
          count(lit(1))).collect()
    }
    val p = dec(col("l_extendedprice"))
    val dt = (rate(col("l_discount")) * rate(col("l_tax"))).cast("decimal(5,4)")
    time("4-term narrow decimal sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"),
          moneySum(p),
          moneySum((p * rate(col("l_discount"))).cast("decimal(17,4)")),
          moneySum((p * rate(col("l_tax"))).cast("decimal(17,4)")),
          moneySum((p * dt).cast("decimal(17,6)")),
          count(lit(1))).collect()
    }
    spark.stop()
  }
}
