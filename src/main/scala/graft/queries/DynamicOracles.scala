package graft.queries

/** Re-rank verification oracles for ANN queries whose CANDIDATE sets are
  * engine-specific (LSH buckets, IVF cells, PQ codebooks) but whose reported
  * scores are exact: after the query runs, it registers a DuckDB statement
  * that independently recomputes the exact cosine/L2 of the RETURNED ids
  * over the raw parquet — so the driver's differential gate verifies that
  * every reported (id, score) row is the true exact score, bit-for-bit.
  * Verify dumps oracle_sql.json AFTER running the queries, so the
  * registration is always populated for the run being verified (same
  * full-result-diff methodology as the reference's BenchAndVerify,
  * /root/reference/src/benchmark/BenchAndVerify.java:176-212).
  */
object DynamicOracles {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def put(name: String, sql: String): Unit = m.put(name, sql)

  def snapshot: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toMap
  }
}
