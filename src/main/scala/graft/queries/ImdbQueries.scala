package graft.queries

import graft.sources.Imdb

/** The reference's ACTUAL workload, executed verbatim: four of the 113
  * join-order-benchmark SQL files shipped with the reference
  * (/root/reference/imdb/queries) run unmodified through the engine's SQL
  * facade over the synthesized IMDB-schema fixture (graft.sources.Imdb),
  * with DuckDB oracles over the very parquet files Spark wrote. The full
  * 113-file sweep (parse + plan + execute + UCT fires at each query's
  * width) is asserted in ImdbSpec; these four — a 5-way, two 7-ways and the
  * 14-way self-join 33c — are the hash-verified CORRECTNESS picks.
  */
object ImdbQueries {

  private def entry(qname: String, file: String): Q =
    Q(qname, Some(Imdb.oracleFor(file)),
      (s, _) => { Imdb.ensure(s); s.sql(Imdb.queryText(file)) })

  val all: Seq[Q] =
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(Imdb.queriesDir)))
      Seq.empty // reference workload not present on this machine
    else Seq(
      entry("q117_imdb_06d", "06d.sql"),
      entry("q118_imdb_10a", "10a.sql"),
      entry("q119_imdb_17a", "17a.sql"),
      entry("q120_imdb_33c", "33c.sql"))
}
