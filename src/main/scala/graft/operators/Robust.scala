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
    // NULL values are excluded from the ranked set (SQL median/aggregate
    // semantics — window NULLS FIRST would otherwise shift every position)
    val ranked = df.where(v.isNotNull)
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

  /** Trimmed and winsorized means per group — the robust location
    * estimates every metrics pipeline wants when a handful of whale rows
    * would drag a plain mean (trim DROPS the tails, winsorize CLAMPS
    * them to the cut values, keeping n). `pctPermille`‰ of rows come off
    * EACH end by exact integer rank: t = n·pctPermille div 1000 rows,
    * cut values are the ranked values at positions t+1 and n−t. `value`
    * must be integral (cents, counts — the caller's exact-unit
    * discipline); sums are DECIMAL(38,0), the two means are single
    * final double divisions rounded to 6, so the whole report replays
    * in SQL. One exchange + sort on the group key (rank window), one
    * hash aggregation — positional VALUES are tie-insensitive, `tie`
    * only makes row numbers total. NULL values are excluded from the
    * ranked set (SQL aggregate semantics; ranked NULLS FIRST they would
    * silently become the low tail). Output: groupCols ++ (n, n_trimmed,
    * lo_cut, hi_cut, trimmed_mean, winsorized_mean). */
  def winsorizedStats(df: DataFrame, groupCols: Seq[String], value: Column,
                      tie: Column, pctPermille: Int = 50): DataFrame = {
    require(pctPermille >= 0 && pctPermille < 500,
      "per-mille trim must be in [0, 500)")
    val d38 = "decimal(38,0)"
    val g = Window.partitionBy(groupCols.map(col): _*)
    df.where(value.isNotNull)
      .withColumn("__v", value.cast("long"))
      .withColumn("__n", count(lit(1)).over(g))
      .withColumn("__rn", row_number().over(g.orderBy(col("__v"), tie)))
      .withColumn("__t", expr(s"(__n * $pctPermille) div 1000"))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__n")).as("n"),
        max(col("__t") * 2).as("n_trimmed"),
        max(when(col("__rn") === col("__t") + 1, col("__v"))).as("lo_cut"),
        max(when(col("__rn") === col("__n") - col("__t"), col("__v")))
          .as("hi_cut"),
        sum(when(col("__rn") > col("__t") &&
          col("__rn") <= col("__n") - col("__t"),
          col("__v").cast(d38))).as("__mid"))
      .select(groupCols.map(col) ++ Seq(col("n"), col("n_trimmed"),
        col("lo_cut"), col("hi_cut"),
        round(col("__mid").cast("double") /
          (col("n") - col("n_trimmed")), 6).as("trimmed_mean"),
        round((col("__mid") +
          expr(s"CAST(n_trimmed div 2 AS $d38)") *
            (col("lo_cut") + col("hi_cut")))
          .cast("double") / col("n"), 6).as("winsorized_mean")): _*)
  }
}
