package graft.queries

import graft.sources.Tpch

/** The reference's TPC-H workload, executed verbatim: ALL 16 SQL files
  * shipped with the reference (/root/reference/tpch/skinnerqueries) run
  * unmodified through the engine's SQL facade over the augmented testdata
  * views (graft.sources.Tpch), with DuckDB oracles over the very parquet
  * files Spark wrote (the full sweep is also asserted in TpchSpec).
  *
  * Three texts are hash-comparable as-is (partition-order-independent):
  * q02 projects raw columns under a MIN-subquery filter, q18 and q20 only
  * sum integer-valued quantities (exact in double at any accumulation
  * order), q12 counts. The rest aggregate fractional doubles, whose last
  * ulp depends on summation order — those run inside the normalization
  * wrapper (Tpch.wrappedText): the verbatim text executes unchanged as a
  * subquery and an IDENTICAL outer projection on both engines rounds each
  * double aggregate well below cross-engine noise (sums to cents at 1e-6
  * relative error; ratios to 6 dp) and pins DuckDB's widened integer types
  * back to BIGINT/INT. The engine's own registry additionally covers the
  * same workload with decimal-deterministic twins (q01…q21) that need no
  * rounding at all.
  */
object TpchQueries {

  private def entry(qname: String, file: String): Q =
    Q(qname, Some(Tpch.oracleFor(file)),
      (s, dir) => { Tpch.ensure(s, dir); s.sql(Tpch.queryText(file)) })

  private def normEntry(qname: String, file: String, cols: String): Q =
    Q(qname, Some(Tpch.oracleWrapped(file, cols)),
      (s, dir) => { Tpch.ensure(s, dir); s.sql(Tpch.wrappedText(file, cols)) })

  val all: Seq[Q] =
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(Tpch.queriesDir)))
      Seq.empty // reference workload not present on this machine
    else Seq(
      entry("q121_tpch_02", "q02.sql"),
      entry("q122_tpch_18", "q18.sql"),
      normEntry("q140_tpch_01", "q01.sql",
        """l_returnflag, l_linestatus, sum_qty,
          |round(sum_base_price, 2) AS sum_base_price,
          |round(sum_disc_price, 2) AS sum_disc_price,
          |round(sum_charge, 2) AS sum_charge,
          |round(avg_qty, 4) AS avg_qty, round(avg_price, 4) AS avg_price,
          |round(avg_disc, 6) AS avg_disc, count_order""".stripMargin),
      normEntry("q141_tpch_03", "q03.sql",
        "l_orderkey, round(revenue, 2) AS revenue, o_orderdate, o_shippriority"),
      normEntry("q142_tpch_05", "q05.sql",
        "n_name, round(revenue, 2) AS revenue"),
      normEntry("q143_tpch_06", "q06.sql",
        "round(revenue, 2) AS revenue"),
      normEntry("q144_tpch_07", "q07.sql",
        "supp_nation, cust_nation, CAST(l_year AS INT) AS l_year, round(revenue, 2) AS revenue"),
      normEntry("q145_tpch_08", "q08.sql",
        "CAST(o_year AS INT) AS o_year, round(mkt_share, 6) AS mkt_share"),
      normEntry("q146_tpch_09", "q09.sql",
        "nation, CAST(o_year AS INT) AS o_year, round(sum_profit, 2) AS sum_profit"),
      normEntry("q147_tpch_10", "q10.sql",
        """c_custkey, c_name, round(revenue, 2) AS revenue, c_acctbal,
          |n_name, c_address, c_phone, c_comment""".stripMargin),
      normEntry("q148_tpch_11", "q11.sql",
        "ps_partkey, round(value, 2) AS value"),
      normEntry("q149_tpch_12", "q12.sql",
        """l_shipmode, CAST(high_line_count AS BIGINT) AS high_line_count,
          |CAST(low_line_count AS BIGINT) AS low_line_count""".stripMargin),
      normEntry("q150_tpch_14", "q14.sql",
        "round(promo_revenue, 6) AS promo_revenue"),
      normEntry("q151_tpch_17", "q17.sql",
        "round(avg_yearly, 2) AS avg_yearly"),
      normEntry("q152_tpch_19", "q19.sql",
        "round(revenue, 2) AS revenue"),
      entry("q153_tpch_20", "q20.sql"))
}
