package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group statistics for data-quality screens: exact median and
  * MAD (median absolute deviation) via SORT-based selection, not a
  * buffering percentile aggregate — Spark's exact `percentile` holds every
  * group value in executor memory, which dies on a 100 TB group, while a
  * rank-selection window is one exchange + sort per pass and spills. Two
  * passes (values, then absolute deviations), each a window over the group
  * key.
  *
  * Median of an even group is the mean of the two middle values —
  * identical arithmetic to DuckDB's `median`, replayed position-by-
  * position by the q213 oracle. `tie` makes row positions deterministic;
  * positional VALUES are tie-insensitive (equal values at equal ranks).
  */
object Robust {

  private def selectMiddle(df: DataFrame, groupCols: Seq[String], v: Column,
                           tie: Column, out: String): DataFrame = {
    val g = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df
      .withColumn("__n", count(lit(1)).over(g))
      .withColumn("__rn", row_number().over(g.orderBy(v, tie)))
    ranked
      .where(col("__rn") === ((col("__n") + 1) / 2).cast("long") ||
             col("__rn") === ((col("__n") + 2) / 2).cast("long"))
      .groupBy(groupCols.map(col): _*)
      .agg(avg(v).as(out))
  }

  /** Per-group (median, mad): exact, sort-selected. */
  def medianMad(df: DataFrame, groupCols: Seq[String], value: Column,
                tie: Column): DataFrame = {
    val med = selectMiddle(df, groupCols, value, tie, "med")
    val withMed = df.join(med, groupCols)
    val mad = selectMiddle(
      withMed.withColumn("__dev", abs(value - col("med"))),
      groupCols, col("__dev"), tie, "mad")
    med.join(mad, groupCols)
  }

  /** Robust outlier screen: per group, count rows whose |value − median|
    * exceeds `k` MADs. Output: groupCols ++ (n, n_out, med, mad). */
  def madOutliers(df: DataFrame, groupCols: Seq[String], value: Column,
                  tie: Column, k: Double = 3.0): DataFrame =
    df.join(medianMad(df, groupCols, value, tie), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count(when(abs(value - col("med")) > lit(k) * col("mad"), 1)).as("n_out"),
        max(col("med")).as("med"), max(col("mad")).as("mad"))
}
