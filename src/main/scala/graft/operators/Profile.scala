package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality column profiler: the "ANALYZE TABLE"-style audit a
  * training-data pipeline runs before ingesting a new crawl/shard —
  * per-column null counts, exact distinct counts, and min/max — emitted
  * as ROWS (one per column) so profiles of many shards/days union into a
  * longitudinal quality table and schema drift shows up as a diff.
  *
  * Reference analog: the per-column statistics the reference collects at
  * load time for its optimizer (column min/max/cardinality); here the
  * profile is a first-class queryable result instead of internal state.
  *
  * 100 TB shape: ONE aggregation over the scan — Spark plans the
  * multi-column distinct aggregate as a single Expand + two-stage hash
  * aggregation with map-side partials, so the full profile costs one
  * shuffle of (expanded) partial states, never one job per column. min/max
  * are computed on the NATIVE column type and cast to string only for the
  * uniform report schema (casting before the agg would rank "10" < "9").
  * For 1000-column tables swap the exact distinct for
  * `approx_count_distinct` — the report schema stays identical.
  */
object Profile {

  /** Profile `cols` of `df`: (col_name, n_rows, n_nulls, n_distinct,
    * min_s, max_s) — one row per column, in the given order. n_distinct
    * excludes NULLs (both Spark and ANSI SQL count distinct non-null). */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    // names are spliced into stack()'s SQL text below (both as string
    // literals and as the __nn_<c> aliases selectExpr must re-parse), so
    // only plain identifiers are safe — Spark legally allows spaces,
    // commas, quotes etc. in column names, but those need a quoted-alias
    // code path this report format doesn't justify
    require(cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"profiled column names must be plain identifiers: $cols")
    val aggs = cols.flatMap { c =>
      Seq(
        // count(when), not sum(when): both engines then agree on BIGINT
        // (DuckDB's sum() widens to HUGEINT, which the dtype-strict
        // oracle compare rejects)
        count(when(col(c).isNull, lit(1))).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    // stack the single wide row into one report row per column
    val stackArgs = cols.map { c =>
      s"'$c', __rows, __nn_$c, __nd_$c, __mn_$c, __mx_$c"
    }.mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
      "(col_name, n_rows, n_nulls, n_distinct, min_s, max_s)")
  }
}
