package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One verifiable operator: a Spark query + (optionally) the exact ANSI SQL
    * a DuckDB oracle runs over the same parquet tables. `sql = None` marks
    * operators whose semantics aren't SQL-expressible (hash-dependent LSH
    * bucketing etc.) — the driver then records a weaker rows-only check.
    */
  final case class Q(
      name: String,
      sql: Option[String],
      fn: (SparkSession, String) => DataFrame)

  // SQL-side twins of graft.Db's deterministic-decimal helpers. Money math is
  // aggregated in exact decimal on BOTH engines and only surfaced as double,
  // so results are bit-identical regardless of partition/merge order.
  private[queries] def DEC(c: String)  = s"CAST($c AS DECIMAL(12,2))"
  private[queries] def RT(c: String)   = s"CAST($c AS DECIMAL(4,2))"
  private[queries] def MSUM(e: String) = s"CAST(sum($e) AS DOUBLE)"
  private[queries] def AVG2(c: String) =
    s"CAST(sum(CAST($c AS DECIMAL(12,2))) AS DOUBLE) / count(*)"

  /** See graft.Scratch — per-process scratch root shared by the query gates. */
  private[queries] val scratchRoot: String = graft.Scratch.root
}
