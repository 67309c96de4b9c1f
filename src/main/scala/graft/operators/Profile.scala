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

  /** Shuffle-key skew audit — the planning tool behind every salting /
    * AQE-skew decision (the q76 operator's "should I?"): for each
    * candidate key column, the exact per-key count distribution reduced
    * to the numbers that predict shuffle behavior:
    *
    *  - n_keys: reducer-key cardinality,
    *  - top1_n: the heaviest key's row count (the straggler partition),
    *  - sum_sq = Σ c_k²: the exact self-join/equi-join collision mass
    *    (q204's sketch estimates this across tables; here it's exact per
    *    column), and
    *  - skew = top1_n · n_keys / n_rows: 1.0 = uniform, ≫1 = salt it.
    *
    * Per column: one (key → count) hash aggregation with map-side
    * partials, then a 3-aggregate reduce of the count table — never a
    * sort, never a collect; columns are independent single-pass jobs
    * unioned into one report. Σc² is summed in exact DECIMAL(38,0)
    * (plain BIGINT c*c sums wrap SILENTLY past 2^63 under non-ANSI
    * long arithmetic — a hot key at 10¹⁰-row scale would report a
    * wrong, possibly negative, collision mass with no error); the
    * surfaced sum_sq stays BIGINT for report ergonomics, and a mass
    * past 2^63−1 RAISES (raise_error in the projection) instead of
    * wrapping — the audit refuses to lie. */
  def keySkew(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one key column to audit")
    val d38 = "decimal(38,0)"
    val reports = cols.map { c =>
      df.groupBy(col(c).as("__k")).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("__c")).as("top1_n"),
          sum(col("__c").cast(d38) * col("__c")).as("__sq38"))
        .withColumn("sum_sq",
          when(col("__sq38") > lit(Long.MaxValue).cast(d38),
            raise_error(concat(lit(s"keySkew($c): collision mass "),
              col("__sq38").cast("string"),
              lit(" exceeds BIGINT; audit with a sampled/salted key"))))
            .otherwise(col("__sq38").cast("long")))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_keys"),
          col("top1_n"), col("sum_sq"),
          round(col("top1_n").cast("double") * col("n_keys") /
            col("n_rows"), 4).as("skew"))
    }
    reports.reduce(_.unionAll(_))
  }

  /** Functional-dependency audit — does column `lhs` determine column
    * `rhs`? For each candidate pair, the exact g3 error (TANE's measure:
    * the minimum number of rows to DELETE for the dependency to hold —
    * Σ over lhs values of (group size − its most common rhs count)).
    * The profiling question behind key discovery, denormalization
    * checks, and "is this column derivable?" pruning.
    *
    * Per pair: one (lhs, rhs) count aggregation, one (lhs) reduce of
    * that count table, one final reduce — all map-side partial, never a
    * sort; pairs are independent jobs unioned into one report. NULLs
    * group SQL-style (NULL lhs is one group; NULL rhs one candidate
    * value). Output per pair: lhs, rhs, n_rows, n_lhs,
    * violating_rows (g3), holds. */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one (lhs, rhs) candidate pair")
    val reports = pairs.map { case (lhs, rhs) =>
      df.groupBy(col(lhs).as("__l"), col(rhs).as("__r"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("__l"))
        .agg(sum(col("__c")).as("__tot"), max(col("__c")).as("__keep"))
        .agg(sum(col("__tot")).as("n_rows"),
          count(lit(1)).as("n_lhs"),
          sum(col("__tot") - col("__keep")).as("violating_rows"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"), col("n_rows"),
          col("n_lhs"), col("violating_rows"),
          (col("violating_rows") === 0L).as("holds"))
    }
    reports.reduce(_.unionAll(_))
  }
}
