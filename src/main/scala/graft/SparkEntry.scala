package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 surfaces here as a named
  * query; those with DuckDB-expressible semantics also carry the exact
  * oracle SQL (same column names, deterministic numerics).
  */
object SparkEntry {

  val registry: Seq[Q] =
    Relational.all ++ Analytics.all ++ Extended.all ++ Events.all ++
      TextOps.all ++ VectorOps.all ++ Media.all ++ JobWide.all ++
      OperatorGates.all ++ Pipeline.all ++ ScaleOps.all ++
      WarehouseOps.all ++ TextSearch.all ++ StatsOps.all ++
      GovernanceOps.all ++ FeatureOps.all ++
      ImdbQueries.all ++ TpchQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_local_supplier_volume")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. ANN
    * queries with engine-specific candidate generation register re-rank
    * verification oracles at run time (DynamicOracles) — Verify evaluates
    * this AFTER running the queries, so those entries are populated. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.sql.map(sql => q.name -> sql.trim)).toMap ++
      DynamicOracles.snapshot
}
