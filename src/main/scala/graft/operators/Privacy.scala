package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-governance audits over quasi-identifiers — the release gate a
  * training-data pipeline runs before publishing or sharing a corpus.
  *
  * The reference engine has no privacy surface (it is a pure query
  * executor); this is beyond-parity capability the 100 TB use case
  * demands: before a dataset leaves the pipeline, measure how
  * re-identifiable its rows are (k-anonymity over the quasi-identifier
  * columns) and whether small groups leak their sensitive attribute
  * (l-diversity), then quantify how much attribute generalization it
  * takes to reach a target k (the generalization curve).
  *
  * Everything is exact counting on one hash aggregation per audit —
  * map-side partial, shuffle keyed by the quasi-identifier tuple, no
  * sort, no collect — so the audits run at corpus scale exactly like
  * any groupBy. All outputs are integers plus one final rounded ratio,
  * so a SQL oracle replays them bit-for-bit.
  */
object Privacy {

  /** k-anonymity + l-diversity summary of `df` under quasi-identifier
    * columns `qiCols` with sensitive attribute `sensitive`:
    *
    *  - a row is k-ANONYMOUS when at least `k` rows share its full QI
    *    tuple (an attacker who knows the QI values cannot narrow below
    *    k candidates);
    *  - a QI group is l-DIVERSE when its rows span at least `l` distinct
    *    sensitive values (a homogeneous group leaks the attribute even
    *    at k-anonymity — the classic homogeneity attack).
    *
    * One (QI → count, distinct-sensitive) aggregation, then a single
    * reduce. NULL QI values form their own group (SQL GROUP BY
    * semantics — shared null identity is itself a linkage signal). An
    * EMPTY input reports clean zeros with NULL min/pct (an all-NULL
    * row would NPE a release gate reading counts), never a pass by
    * omission. Output (1 row): n_rows, n_groups, min_group_n,
    * groups_below_k, rows_below_k, pct_below_k (round 6),
    * groups_below_l. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], sensitive: Column,
                 k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        countDistinct(sensitive).as("__ndist"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("__n")).as("min_group_n"),
        count(when(col("__n") < k, 1)).as("groups_below_k"),
        coalesce(sum(when(col("__n") < k, col("__n"))), lit(0L))
          .as("rows_below_k"),
        count(when(col("__ndist") < l, 1)).as("groups_below_l"))
      .select(col("n_rows"), col("n_groups"), col("min_group_n"),
        col("groups_below_k"), col("rows_below_k"),
        when(col("n_rows") > 0,
          round(col("rows_below_k").cast("double") / col("n_rows"), 6))
          .as("pct_below_k"),
        col("groups_below_l"))
  }

  /** Generalization curve: for each rung of a coarsening ladder (most
    * specific quasi-identifier first, fully-suppressed last), the
    * re-identifiable mass that remains at threshold `k`. The audit that
    * answers "how much detail must we give up before the corpus is
    * k-anonymous?" — each rung is an independent one-aggregation job
    * over the same input (rung r does NOT need rung r−1's output, so
    * the jobs parallelize and none shuffles more than its own QI key).
    * An empty column list means full suppression: one global group
    * (dropped entirely when the input is empty — a zero-row "group"
    * is not a group, keeping the empty-input report consistent across
    * rungs: all zeros, NULL min/pct). NOTE this deliberately diverges
    * from the bare-SQL `SELECT count(*) FROM t` pattern (the q264
    * oracle's shape), which reports ONE zero-count group on empty
    * input — an oracle replaying the empty-cols rung must add the same
    * `HAVING count(*) > 0` / n > 0 filter to agree on empty tables
    * (the gate data is non-empty, so q264 is unaffected; the empty
    * contract is spec-pinned engine-side). Output (one row per rung, ladder
    * order): rung, rung_name, n_groups, min_group_n, rows_below_k,
    * pct_below_k (round 6). */
  def generalizationCurve(df: DataFrame, ladder: Seq[(String, Seq[Column])],
                          k: Int): DataFrame = {
    require(ladder.nonEmpty, "need at least one generalization rung")
    require(k >= 1, "k must be >= 1")
    val rungs = ladder.zipWithIndex.map { case ((name, cols), i) =>
      val grouped =
        if (cols.isEmpty)
          df.groupBy().agg(count(lit(1)).as("__n"))
            .where(col("__n") > 0)
        else df.groupBy(cols: _*).agg(count(lit(1)).as("__n"))
      grouped
        .agg(coalesce(sum(col("__n")), lit(0L)).as("__rows"),
          count(lit(1)).as("n_groups"),
          min(col("__n")).as("min_group_n"),
          coalesce(sum(when(col("__n") < k, col("__n"))), lit(0L))
            .as("rows_below_k"))
        .select(lit(i).as("rung"), lit(name).as("rung_name"),
          col("n_groups"), col("min_group_n"), col("rows_below_k"),
          when(col("__rows") > 0,
            round(col("rows_below_k").cast("double") / col("__rows"), 6))
            .as("pct_below_k"))
    }
    rungs.reduce(_.unionAll(_))
  }
}
