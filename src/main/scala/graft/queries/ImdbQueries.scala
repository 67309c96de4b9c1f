package graft.queries

import graft.sources.Imdb

/** The reference's ACTUAL workload, executed verbatim: seventeen of the 113
  * join-order-benchmark SQL files shipped with the reference
  * (/root/reference/imdb/queries) run unmodified through the engine's SQL
  * facade over the synthesized IMDB-schema fixture (graft.sources.Imdb),
  * with DuckDB oracles over the very parquet files Spark wrote. The full
  * 113-file sweep (parse + plan + execute + UCT fires at each query's
  * width) is asserted in ImdbSpec; the hash-verified picks below cover
  * EVERY join width in the benchmark — 4, 5, 6, 7, 8, 9, 10, 11, 12, 14
  * and 17 relations (every JOB result is a single MIN() row, so each text
  * is partition-order-independent and hash-comparable as-is).
  */
object ImdbQueries {

  private def entry(qname: String, file: String): Q =
    Q(qname, Some(Imdb.oracleFor(file)),
      (s, _) => { Imdb.ensure(s); s.sql(Imdb.queryText(file)) })

  val all: Seq[Q] =
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(Imdb.queriesDir)))
      Seq.empty // reference workload not present on this machine
    else Seq(
      entry("q117_imdb_06d", "06d.sql"), // 5-way
      entry("q118_imdb_10a", "10a.sql"), // 7-way
      entry("q119_imdb_17a", "17a.sql"), // 7-way
      entry("q120_imdb_33c", "33c.sql"), // 14-way self-join
      entry("q127_imdb_03b", "03b.sql"), // 4-way
      entry("q128_imdb_01a", "01a.sql"), // 5-way
      entry("q129_imdb_32a", "32a.sql"), // 6-way
      entry("q130_imdb_08c", "08c.sql"), // 7-way
      entry("q131_imdb_07b", "07b.sql"), // 8-way
      entry("q132_imdb_16b", "16b.sql"), // 8-way
      entry("q133_imdb_13a", "13a.sql"), // 9-way
      entry("q134_imdb_21a", "21a.sql"), // 9-way
      entry("q135_imdb_19c", "19c.sql"), // 10-way
      entry("q136_imdb_22b", "22b.sql"), // 11-way
      entry("q137_imdb_26a", "26a.sql"), // 12-way
      entry("q138_imdb_28a", "28a.sql"), // 14-way
      entry("q139_imdb_29b", "29b.sql")) // 17-way
}
