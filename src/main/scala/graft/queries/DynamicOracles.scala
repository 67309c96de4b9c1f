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

  /** Persist an emitted candidate-pair set to a per-process CSV and return
    * a DuckDB relation reading it back — replacing the `(a,b) IN (...)`
    * literal inlining that breaks at scale (a 1k-pair list is fine; the
    * ~100k pairs a sf1 SimHash run emits would be a megabyte-scale SQL
    * string, i.e. parse limits and quadratic planning). The file lives
    * under Scratch.root, which outlives this JVM because the driver's
    * DuckDB pass reads the gates' fixtures after the process exits — the
    * same mechanism the CSV/JSON source oracles already rely on. Ids must
    * render as plain SQL literals via toString (all current callers pass
    * integer ids).
    */
  def pairsRelation(name: String, pairs: Seq[(Any, Any)]): String = {
    val path = java.nio.file.Paths.get(
      s"${graft.Scratch.root}/oracle_pairs/$name.csv")
    java.nio.file.Files.createDirectories(path.getParent)
    val body = pairs.map { case (a, b) => s"$a,$b" }
      .mkString("a_id,b_id\n", "\n", "\n")
    java.nio.file.Files.writeString(path, body)
    s"(SELECT a_id, b_id FROM read_csv('$path', header=true))"
  }

  def snapshot: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toMap
  }
}
