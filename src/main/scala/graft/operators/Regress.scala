package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group simple linear regression (OLS y = a + b·x) in EXACT integer
  * arithmetic: the five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are
  * BIGINT sums from ONE aggregation — map-side partial, any partition
  * order — and both coefficients come out as single integer-ratio
  * divisions, the only floats in the pipeline:
  *
  *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
  *   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − Σx·Σx)
  *
  * Callers pass x and y ALREADY as integers (e.g. hours since an epoch,
  * money in cents) — the exactness contract lives at the input. The
  * closed-form products are computed in DECIMAL(38,0) (Σy·Σx² overflows
  * BIGINT around 10^19, reachable at cluster row counts; decimal keeps
  * them exact and the DuckDB oracle replays the same cast). This is the
  * trend/drift detector per segment — never a driver-side fit, never an
  * iterative solver.
  *
  * Output: groupCols ++ (n, slope, intercept), rounded to 6; groups with
  * zero x-variance yield null (0/0 guarded to null, both engines).
  */
object Regress {

  def olsByGroup(df: DataFrame, groupCols: Seq[String], x: Column,
                 y: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val s = df
      .select(groupCols.map(col) :+ x.cast("long").as("__x")
        :+ y.cast("long").as("__y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("sx"),
        sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"))
    val den = (col("n").cast(d38) * col("sxx") -
      col("sx").cast(d38) * col("sx")).cast("double")
    s.select(groupCols.map(col) ++ Seq(col("n"),
      round((col("n").cast(d38) * col("sxy") -
        col("sx").cast(d38) * col("sy")).cast("double") /
        when(den === 0.0, lit(null)).otherwise(den), 6).as("slope"),
      round((col("sy").cast(d38) * col("sxx") -
        col("sx").cast(d38) * col("sxy")).cast("double") /
        when(den === 0.0, lit(null)).otherwise(den), 6).as("intercept")): _*)
  }
}
