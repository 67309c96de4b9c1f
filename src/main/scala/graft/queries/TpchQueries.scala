package graft.queries

import graft.sources.Tpch

/** The reference's TPC-H workload, executed verbatim: two of the 16 SQL
  * files shipped with the reference (/root/reference/tpch/skinnerqueries)
  * run unmodified through the engine's SQL facade over the augmented
  * testdata views (graft.sources.Tpch), with DuckDB oracles over the very
  * parquet files Spark wrote. The full 16-file sweep is asserted in
  * TpchSpec; these two are the hash-verifiable picks — the only texts in
  * the set whose results are partition-order-independent: q02 projects raw
  * columns under a MIN-subquery filter, q18 sums integer-valued quantities
  * (exact in double at any accumulation order). The other 14 aggregate
  * fractional doubles, which the engine's own registry covers with
  * decimal-deterministic twins (q01…q21).
  */
object TpchQueries {

  private def entry(qname: String, file: String): Q =
    Q(qname, Some(Tpch.oracleFor(file)),
      (s, dir) => { Tpch.ensure(s, dir); s.sql(Tpch.queryText(file)) })

  val all: Seq[Q] =
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(Tpch.queriesDir)))
      Seq.empty // reference workload not present on this machine
    else Seq(
      entry("q121_tpch_02", "q02.sql"),
      entry("q122_tpch_18", "q18.sql"))
}
