package graft

import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._

/** Scratch: what catalyst expression does a `.desc` Column unwrap to? */
object DebugSortOrder {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("4")
    val e1 = GraftShims.expression(col("n").desc)
    println(s"desc -> ${e1.getClass.getName}: $e1")
    val e2 = GraftShims.expression(col("n"))
    println(s"plain -> ${e2.getClass.getName}: $e2")
    spark.stop()
  }
}
