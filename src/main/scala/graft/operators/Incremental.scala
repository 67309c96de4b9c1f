package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Algebraic partial-aggregate state — the incremental-view-maintenance
  * pattern: fine-grained partials (per hour, per shard, per ingest
  * batch) are aggregated ONCE from raw data, then every coarser rollup
  * (daily, weekly, all-time) is computed from the partial STATES alone,
  * never re-scanning raw. At 100 TB this is the difference between a
  * rollup that reads gigabytes of state and one that reads the lake
  * again; it also composes across time (yesterday's states are
  * immutable — only the current period's partial is recomputed).
  *
  * Every kept statistic is ALGEBRAIC (count/sum/min/max merge by
  * count/sum/min/max of themselves), so `mergeState ∘ aggState` equals
  * aggregating raw directly — the q270 gate proves exactly that
  * equality against the oracle. Distinct counts are NOT algebraic
  * exactly; pair these states with [[Hll.registers]] sketches, whose
  * bucketwise-max merge ([[Hll.merge]]) is the mergeable companion.
  * Sums are BIGINT: callers keep `value` in integer units (cents,
  * counts) with per-partial magnitudes documented under 2^63 — the
  * merge re-sums in DECIMAL(38,0) and surfaces BIGINT, so a cross-
  * partial overflow would NULL loudly rather than wrap.
  */
object Incremental {

  /** Canonical state columns produced/consumed by this module. */
  val stateCols: Seq[String] = Seq("n", "sum_v", "min_v", "max_v")

  /** Build partial states from raw rows: one hash aggregation keyed by
    * the fine-grained group (map-side partial combine — the only scan
    * of raw data this pattern ever makes). Output: groupCols ++
    * (n, sum_v, min_v, max_v). */
  def aggState(df: DataFrame, groupCols: Seq[String],
               value: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(value.cast("long")).as("sum_v"),
        min(value.cast("long")).as("min_v"),
        max(value.cast("long")).as("max_v"))

  /** Merge partial states to a coarser key — pure state-in/state-out,
    * so rollups chain (hour→day→week) and shards/engines combine. The
    * input must carry [[stateCols]]; `coarseCols` is any subset of the
    * original group columns (or derived coarsenings selected onto the
    * state first). */
  def mergeState(state: DataFrame, coarseCols: Seq[String]): DataFrame = {
    require(stateCols.forall(state.columns.contains),
      s"state must carry ${stateCols.mkString(", ")}")
    state.groupBy(coarseCols.map(col): _*)
      // n takes the same DECIMAL(38,0) route as sum_v: a cross-partial
      // count overflow must NULL loudly (decimal→long overflow is NULL
      // under non-ANSI arithmetic), never wrap silently
      .agg(sum(col("n").cast("decimal(38,0)")).cast("long").as("n"),
        sum(col("sum_v").cast("decimal(38,0)")).cast("long").as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }
}
