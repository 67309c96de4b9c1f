package graft.queries

import graft.Db
import graft.Db.{dec, moneySum}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JOB-width join workloads: 8–12 relation inner-join graphs (snowflakes with
  * self-joined dimension legs, dual-fact self-joins, shared-part chains,
  * cyclic graphs, theta edges) mirroring the shapes of the reference's IMDB
  * JOB corpus (/root/reference/imdb/queries/10a.sql-33c.sql: up to ~17
  * relations, repeated dimension aliases, highly selective predicates).
  *
  * Every query is deliberately AUTHORED in a bad order — fact tables
  * outermost, selective dimensions last — so Catalyst alone (no CBO stats,
  * no join reorder) would execute the written order; the UCT rule has to
  * learn the dims-first order from sample episodes. UctRuleSpec asserts the
  * learned order beats the authored one on episode reward and that the rule
  * fires at ≥10 relations.
  */
object JobWide {

  /** Rename every column with a prefix so self-joined legs stay unambiguous
    * (each renamed leg is its own opaque leaf for the join-graph flattener,
    * exactly like a JOB table alias). */
  private def pfx(df: DataFrame, p: String): DataFrame =
    df.select(df.columns.toIndexedSeq.map(c => col(c).as(p + c)): _*)

  val all: Seq[Q] = Seq(
    // --- q80: 8-relation double snowflake (both nation→region legs)
    Q("q80_job_snowflake8", Some(s"""
      SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
             count(*) AS n, ${MSUM(DEC("l_extendedprice"))} AS revenue
      FROM lineitem, orders, customer, nation cn, region cr,
           supplier, nation sn, region sr
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = cr.r_regionkey
        AND l_suppkey = s_suppkey AND s_nationkey = sn.n_nationkey
        AND sn.n_regionkey = sr.r_regionkey
        AND cr.r_name = 'AMERICA' AND sr.r_name = 'ASIA'
        AND o_orderpriority = '2-HIGH'
      GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, dir) => {
        val d = Db(s, dir)
        val cn = pfx(d.nation, "cn_")
        val sn = pfx(d.nation, "sn_")
        val cr = pfx(d.region, "cr_")
        val sr = pfx(d.region, "sr_")
        d.lineitem
          .join(d.orders.filter(col("o_orderpriority") === "2-HIGH"),
            col("l_orderkey") === col("o_orderkey"))
          .join(d.customer, col("o_custkey") === col("c_custkey"))
          .join(cn, col("c_nationkey") === col("cn_n_nationkey"))
          .join(cr.filter(col("cr_r_name") === "AMERICA"),
            col("cn_n_regionkey") === col("cr_r_regionkey"))
          .join(d.supplier, col("l_suppkey") === col("s_suppkey"))
          .join(sn, col("s_nationkey") === col("sn_n_nationkey"))
          .join(sr.filter(col("sr_r_name") === "ASIA"),
            col("sn_n_regionkey") === col("sr_r_regionkey"))
          .groupBy(col("cn_n_name").as("cust_nation"), col("sn_n_name").as("supp_nation"))
          .agg(count(lit(1)).as("n"),
            moneySum(dec(col("l_extendedprice"))).as("revenue"))
          .orderBy("cust_nation", "supp_nation")
      }),

    // --- q81: 9 relations — q80's snowflake + part dimension
    Q("q81_job_part9", Some(s"""
      SELECT p_brand, count(*) AS n, ${MSUM(DEC("l_extendedprice"))} AS revenue
      FROM lineitem, orders, customer, nation cn, region cr,
           supplier, nation sn, region sr, part
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = cr.r_regionkey
        AND l_suppkey = s_suppkey AND s_nationkey = sn.n_nationkey
        AND sn.n_regionkey = sr.r_regionkey AND l_partkey = p_partkey
        AND cr.r_name = 'EUROPE' AND p_size < 5
      GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val d = Db(s, dir)
        val cn = pfx(d.nation, "cn_")
        val sn = pfx(d.nation, "sn_")
        val cr = pfx(d.region, "cr_")
        val sr = pfx(d.region, "sr_")
        d.lineitem
          .join(d.orders, col("l_orderkey") === col("o_orderkey"))
          .join(d.customer, col("o_custkey") === col("c_custkey"))
          .join(cn, col("c_nationkey") === col("cn_n_nationkey"))
          .join(cr.filter(col("cr_r_name") === "EUROPE"),
            col("cn_n_regionkey") === col("cr_r_regionkey"))
          .join(d.supplier, col("l_suppkey") === col("s_suppkey"))
          .join(sn, col("s_nationkey") === col("sn_n_nationkey"))
          .join(sr, col("sn_n_regionkey") === col("sr_r_regionkey"))
          .join(d.part.filter(col("p_size") < 5), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            moneySum(dec(col("l_extendedprice"))).as("revenue"))
          .orderBy("p_brand")
      }),

    // --- q82: 10 relations — dual-fact self-join (two lineitems of the same
    //     order) with each line's own part
    Q("q82_job_pairs10", Some(s"""
      SELECT count(*) AS n, min(p1.p_name) AS min_p1, min(p2.p_name) AS min_p2,
             ${MSUM(DEC("l1.l_extendedprice"))} AS revenue
      FROM lineitem l1, lineitem l2, orders, customer, nation cn, region cr,
           supplier s1, nation sn1, part p1, part p2
      WHERE l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
        AND l1.l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = cr.r_regionkey
        AND l1.l_suppkey = s1.s_suppkey AND s1.s_nationkey = sn1.n_nationkey
        AND l1.l_partkey = p1.p_partkey AND l2.l_partkey = p2.p_partkey
        AND cr.r_name = 'AFRICA' AND p1.p_size < 10
        AND o_orderstatus = 'F'"""),
      (s, dir) => {
        val d = Db(s, dir)
        val l1 = pfx(d.lineitem, "l1_")
        val l2 = pfx(d.lineitem, "l2_")
        val p1 = pfx(d.part, "p1_")
        val p2 = pfx(d.part, "p2_")
        val s1 = pfx(d.supplier, "s1_")
        val sn1 = pfx(d.nation, "sn1_")
        val cn = pfx(d.nation, "cn_")
        val cr = pfx(d.region, "cr_")
        l1
          .join(l2, col("l1_l_orderkey") === col("l2_l_orderkey")
            && col("l1_l_linenumber") < col("l2_l_linenumber"))
          .join(d.orders.filter(col("o_orderstatus") === "F"),
            col("l1_l_orderkey") === col("o_orderkey"))
          .join(d.customer, col("o_custkey") === col("c_custkey"))
          .join(cn, col("c_nationkey") === col("cn_n_nationkey"))
          .join(cr.filter(col("cr_r_name") === "AFRICA"),
            col("cn_n_regionkey") === col("cr_r_regionkey"))
          .join(s1, col("l1_l_suppkey") === col("s1_s_suppkey"))
          .join(sn1, col("s1_s_nationkey") === col("sn1_n_nationkey"))
          .join(p1.filter(col("p1_p_size") < 10),
            col("l1_l_partkey") === col("p1_p_partkey"))
          .join(p2, col("l2_l_partkey") === col("p2_p_partkey"))
          .agg(count(lit(1)).as("n"),
            min("p1_p_name").as("min_p1"), min("p2_p_name").as("min_p2"),
            moneySum(dec(col("l1_l_extendedprice"))).as("revenue"))
      }),

    // --- q83: 12 relations — dual-fact self-join with BOTH suppliers'
    //     full nation→region legs plus the customer leg
    Q("q83_job_wide12", Some(s"""
      SELECT cn.n_name AS cust_nation, count(*) AS n,
             min(o_totalprice) AS min_order, ${MSUM(DEC("l1.l_extendedprice"))} AS revenue
      FROM lineitem l1, lineitem l2, orders, customer, nation cn, region cr,
           supplier s1, nation sn1, region sr1, supplier s2, nation sn2, region sr2
      WHERE l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
        AND l1.l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = cr.r_regionkey
        AND l1.l_suppkey = s1.s_suppkey AND s1.s_nationkey = sn1.n_nationkey
        AND sn1.n_regionkey = sr1.r_regionkey
        AND l2.l_suppkey = s2.s_suppkey AND s2.s_nationkey = sn2.n_nationkey
        AND sn2.n_regionkey = sr2.r_regionkey
        AND cr.r_name = 'ASIA' AND sr1.r_name = 'EUROPE' AND sr2.r_name = 'AMERICA'
      GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val d = Db(s, dir)
        val l1 = pfx(d.lineitem, "l1_")
        val l2 = pfx(d.lineitem, "l2_")
        val s1 = pfx(d.supplier, "s1_")
        val s2 = pfx(d.supplier, "s2_")
        val sn1 = pfx(d.nation, "sn1_")
        val sn2 = pfx(d.nation, "sn2_")
        val sr1 = pfx(d.region, "sr1_")
        val sr2 = pfx(d.region, "sr2_")
        val cn = pfx(d.nation, "cn_")
        val cr = pfx(d.region, "cr_")
        l1
          .join(l2, col("l1_l_orderkey") === col("l2_l_orderkey")
            && col("l1_l_linenumber") < col("l2_l_linenumber"))
          .join(d.orders, col("l1_l_orderkey") === col("o_orderkey"))
          .join(d.customer, col("o_custkey") === col("c_custkey"))
          .join(cn, col("c_nationkey") === col("cn_n_nationkey"))
          .join(cr.filter(col("cr_r_name") === "ASIA"),
            col("cn_n_regionkey") === col("cr_r_regionkey"))
          .join(s1, col("l1_l_suppkey") === col("s1_s_suppkey"))
          .join(sn1, col("s1_s_nationkey") === col("sn1_n_nationkey"))
          .join(sr1.filter(col("sr1_r_name") === "EUROPE"),
            col("sn1_n_regionkey") === col("sr1_r_regionkey"))
          .join(s2, col("l2_l_suppkey") === col("s2_s_suppkey"))
          .join(sn2, col("s2_s_nationkey") === col("sn2_n_nationkey"))
          .join(sr2.filter(col("sr2_r_name") === "AMERICA"),
            col("sn2_n_regionkey") === col("sr2_r_regionkey"))
          .groupBy(col("cn_n_name"))
          .agg(count(lit(1)).as("n"), min("o_totalprice").as("min_order"),
            moneySum(dec(col("l1_l_extendedprice"))).as("revenue"))
          .withColumnRenamed("cn_n_name", "cust_nation")
          .orderBy("cust_nation")
      }),

    // --- q84: 11 relations — two orders sharing a (selective) part, each
    //     with its own order→customer→nation→region chain
    Q("q84_job_sharedpart11", Some("""
      SELECT count(*) AS n, min(p_name) AS min_part,
             min(c1.c_name) AS min_c1, min(c2.c_name) AS min_c2
      FROM part, lineitem l1, lineitem l2,
           orders o1, customer c1, nation n1, region r1,
           orders o2, customer c2, nation n2, region r2
      WHERE l1.l_partkey = p_partkey AND l2.l_partkey = p_partkey
        AND l1.l_orderkey < l2.l_orderkey
        AND l1.l_orderkey = o1.o_orderkey AND o1.o_custkey = c1.c_custkey
        AND c1.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r1.r_regionkey
        AND l2.l_orderkey = o2.o_orderkey AND o2.o_custkey = c2.c_custkey
        AND c2.c_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        AND p_size = 1 AND r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'"""),
      (s, dir) => {
        val d = Db(s, dir)
        val l1 = pfx(d.lineitem, "l1_")
        val l2 = pfx(d.lineitem, "l2_")
        val o1 = pfx(d.orders, "o1_")
        val o2 = pfx(d.orders, "o2_")
        val c1 = pfx(d.customer, "c1_")
        val c2 = pfx(d.customer, "c2_")
        val n1 = pfx(d.nation, "n1_")
        val n2 = pfx(d.nation, "n2_")
        val r1 = pfx(d.region, "r1_")
        val r2 = pfx(d.region, "r2_")
        l1
          .join(l2, col("l1_l_partkey") === col("l2_l_partkey")
            && col("l1_l_orderkey") < col("l2_l_orderkey"))
          .join(d.part.filter(col("p_size") === 1),
            col("l1_l_partkey") === col("p_partkey"))
          .join(o1, col("l1_l_orderkey") === col("o1_o_orderkey"))
          .join(c1, col("o1_o_custkey") === col("c1_c_custkey"))
          .join(n1, col("c1_c_nationkey") === col("n1_n_nationkey"))
          .join(r1.filter(col("r1_r_name") === "ASIA"),
            col("n1_n_regionkey") === col("r1_r_regionkey"))
          .join(o2, col("l2_l_orderkey") === col("o2_o_orderkey"))
          .join(c2, col("o2_o_custkey") === col("c2_c_custkey"))
          .join(n2, col("c2_c_nationkey") === col("n2_n_nationkey"))
          .join(r2.filter(col("r2_r_name") === "EUROPE"),
            col("n2_n_regionkey") === col("r2_r_regionkey"))
          .agg(count(lit(1)).as("n"), min("p_name").as("min_part"),
            min("c1_c_name").as("min_c1"), min("c2_c_name").as("min_c2"))
      }),

    // --- q85: 8 relations, CYCLIC graph — the dimension legs are tied
    //     together by an equality between the two nation names
    Q("q85_job_cycle8", Some(s"""
      SELECT cn.n_name AS nation, count(*) AS n,
             ${MSUM(DEC("l_extendedprice"))} AS revenue
      FROM lineitem, orders, customer, supplier, nation cn, nation sn,
           region cr, region sr
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND l_suppkey = s_suppkey
        AND c_nationkey = cn.n_nationkey AND s_nationkey = sn.n_nationkey
        AND cn.n_regionkey = cr.r_regionkey AND sn.n_regionkey = sr.r_regionkey
        AND cn.n_name = sn.n_name
        AND cr.r_name = 'AFRICA' AND o_orderstatus = 'F'
      GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val d = Db(s, dir)
        val cn = pfx(d.nation, "cn_")
        val sn = pfx(d.nation, "sn_")
        val cr = pfx(d.region, "cr_")
        val sr = pfx(d.region, "sr_")
        d.lineitem
          .join(d.orders.filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .join(d.customer, col("o_custkey") === col("c_custkey"))
          .join(d.supplier, col("l_suppkey") === col("s_suppkey"))
          .join(cn, col("c_nationkey") === col("cn_n_nationkey"))
          .join(sn, col("s_nationkey") === col("sn_n_nationkey")
            && col("cn_n_name") === col("sn_n_name"))
          .join(cr.filter(col("cr_r_name") === "AFRICA"),
            col("cn_n_regionkey") === col("cr_r_regionkey"))
          .join(sr, col("sn_n_regionkey") === col("sr_r_regionkey"))
          .groupBy(col("cn_n_name"))
          .agg(count(lit(1)).as("n"),
            moneySum(dec(col("l_extendedprice"))).as("revenue"))
          .withColumnRenamed("cn_n_name", "nation")
          .orderBy("nation")
      }),

    // --- q86: 9 relations — one long chain region→…→lineitem→…→region
    //     with a part at the end
    Q("q86_job_chain9", Some("""
      SELECT count(*) AS n, min(p_retailprice) AS min_retail,
             max(s_acctbal) AS max_sbal
      FROM region cr, nation cn, customer, orders, lineitem,
           supplier, nation sn, region sr, part
      WHERE cr.r_regionkey = cn.n_regionkey AND cn.n_nationkey = c_nationkey
        AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        AND l_suppkey = s_suppkey AND s_nationkey = sn.n_nationkey
        AND sn.n_regionkey = sr.r_regionkey AND l_partkey = p_partkey
        AND cr.r_name = 'MIDDLE EAST' AND sr.r_name = 'AFRICA'
        AND o_orderpriority = '1-URGENT' AND p_size > 40"""),
      (s, dir) => {
        val d = Db(s, dir)
        val cn = pfx(d.nation, "cn_")
        val sn = pfx(d.nation, "sn_")
        val cr = pfx(d.region, "cr_")
        val sr = pfx(d.region, "sr_")
        d.lineitem
          .join(d.orders.filter(col("o_orderpriority") === "1-URGENT"),
            col("l_orderkey") === col("o_orderkey"))
          .join(d.customer, col("o_custkey") === col("c_custkey"))
          .join(cn, col("c_nationkey") === col("cn_n_nationkey"))
          .join(cr.filter(col("cr_r_name") === "MIDDLE EAST"),
            col("cn_n_regionkey") === col("cr_r_regionkey"))
          .join(d.supplier, col("l_suppkey") === col("s_suppkey"))
          .join(sn, col("s_nationkey") === col("sn_n_nationkey"))
          .join(sr.filter(col("sr_r_name") === "AFRICA"),
            col("sn_n_regionkey") === col("sr_r_regionkey"))
          .join(d.part.filter(col("p_size") > 40),
            col("l_partkey") === col("p_partkey"))
          .agg(count(lit(1)).as("n"), min("p_retailprice").as("min_retail"),
            max("s_acctbal").as("max_sbal"))
      }),

    // --- q110: 17 relations — the reference corpus's maximum width
    //     (/root/reference/imdb/queries/*.sql go up to ~17 FROM items): two
    //     orders sharing a selective part, EACH with its full lineitem→
    //     order→customer→nation→region chain AND its own supplier→nation→
    //     region leg. Authored facts-first as always.
    Q("q110_job_wide17", Some(s"""
      SELECT count(*) AS n, min(p_name) AS min_part,
             min(c1.c_name) AS min_c1, min(c2.c_name) AS min_c2,
             ${MSUM(DEC("l1.l_extendedprice"))} AS revenue
      FROM part, lineitem l1, lineitem l2,
           orders o1, customer c1, nation n1, region r1,
           orders o2, customer c2, nation n2, region r2,
           supplier s1, nation sn1, region sr1,
           supplier s2, nation sn2, region sr2
      WHERE l1.l_partkey = p_partkey AND l2.l_partkey = p_partkey
        AND l1.l_orderkey < l2.l_orderkey
        AND l1.l_orderkey = o1.o_orderkey AND o1.o_custkey = c1.c_custkey
        AND c1.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r1.r_regionkey
        AND l2.l_orderkey = o2.o_orderkey AND o2.o_custkey = c2.c_custkey
        AND c2.c_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        AND l1.l_suppkey = s1.s_suppkey AND s1.s_nationkey = sn1.n_nationkey
        AND sn1.n_regionkey = sr1.r_regionkey
        AND l2.l_suppkey = s2.s_suppkey AND s2.s_nationkey = sn2.n_nationkey
        AND sn2.n_regionkey = sr2.r_regionkey
        AND p_size = 1 AND r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'
        AND sr1.r_name = 'AMERICA'"""),
      (s, dir) => {
        val d = Db(s, dir)
        val l1 = pfx(d.lineitem, "l1_"); val l2 = pfx(d.lineitem, "l2_")
        val o1 = pfx(d.orders, "o1_");   val o2 = pfx(d.orders, "o2_")
        val c1 = pfx(d.customer, "c1_"); val c2 = pfx(d.customer, "c2_")
        val n1 = pfx(d.nation, "n1_");   val n2 = pfx(d.nation, "n2_")
        val r1 = pfx(d.region, "r1_");   val r2 = pfx(d.region, "r2_")
        val s1 = pfx(d.supplier, "s1_"); val s2 = pfx(d.supplier, "s2_")
        val sn1 = pfx(d.nation, "sn1_"); val sn2 = pfx(d.nation, "sn2_")
        val sr1 = pfx(d.region, "sr1_"); val sr2 = pfx(d.region, "sr2_")
        l1
          .join(l2, col("l1_l_partkey") === col("l2_l_partkey")
            && col("l1_l_orderkey") < col("l2_l_orderkey"))
          .join(d.part.filter(col("p_size") === 1),
            col("l1_l_partkey") === col("p_partkey"))
          .join(o1, col("l1_l_orderkey") === col("o1_o_orderkey"))
          .join(c1, col("o1_o_custkey") === col("c1_c_custkey"))
          .join(n1, col("c1_c_nationkey") === col("n1_n_nationkey"))
          .join(r1.filter(col("r1_r_name") === "ASIA"),
            col("n1_n_regionkey") === col("r1_r_regionkey"))
          .join(o2, col("l2_l_orderkey") === col("o2_o_orderkey"))
          .join(c2, col("o2_o_custkey") === col("c2_c_custkey"))
          .join(n2, col("c2_c_nationkey") === col("n2_n_nationkey"))
          .join(r2.filter(col("r2_r_name") === "EUROPE"),
            col("n2_n_regionkey") === col("r2_r_regionkey"))
          .join(s1, col("l1_l_suppkey") === col("s1_s_suppkey"))
          .join(sn1, col("s1_s_nationkey") === col("sn1_n_nationkey"))
          .join(sr1.filter(col("sr1_r_name") === "AMERICA"),
            col("sn1_n_regionkey") === col("sr1_r_regionkey"))
          .join(s2, col("l2_l_suppkey") === col("s2_s_suppkey"))
          .join(sn2, col("s2_s_nationkey") === col("sn2_n_nationkey"))
          .join(sr2, col("sn2_n_regionkey") === col("sr2_r_regionkey"))
          .agg(count(lit(1)).as("n"), min("p_name").as("min_part"),
            min("c1_c_name").as("min_c1"), min("c2_c_name").as("min_c2"),
            moneySum(dec(col("l1_l_extendedprice"))).as("revenue"))
      }),

    // --- q87: 10 relations with a cross-leaf THETA conjunct
    //     (l_quantity > p_size) on top of the equi edges
    Q("q87_job_theta10", Some(s"""
      SELECT sn.n_name AS supp_nation, count(*) AS n,
             ${MSUM(DEC("l_extendedprice"))} AS revenue
      FROM lineitem, orders, customer, nation cn, region cr,
           supplier, nation sn, region sr, part, region pr
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = cr.r_regionkey
        AND l_suppkey = s_suppkey AND s_nationkey = sn.n_nationkey
        AND sn.n_regionkey = sr.r_regionkey AND l_partkey = p_partkey
        AND pr.r_regionkey = cr.r_regionkey
        AND l_quantity > p_size
        AND cr.r_name = 'EUROPE' AND p_size > 30
      GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val d = Db(s, dir)
        val cn = pfx(d.nation, "cn_")
        val sn = pfx(d.nation, "sn_")
        val cr = pfx(d.region, "cr_")
        val sr = pfx(d.region, "sr_")
        val pr = pfx(d.region, "pr_")
        d.lineitem
          .join(d.orders, col("l_orderkey") === col("o_orderkey"))
          .join(d.customer, col("o_custkey") === col("c_custkey"))
          .join(cn, col("c_nationkey") === col("cn_n_nationkey"))
          .join(cr.filter(col("cr_r_name") === "EUROPE"),
            col("cn_n_regionkey") === col("cr_r_regionkey"))
          .join(d.supplier, col("l_suppkey") === col("s_suppkey"))
          .join(sn, col("s_nationkey") === col("sn_n_nationkey"))
          .join(sr, col("sn_n_regionkey") === col("sr_r_regionkey"))
          .join(d.part.filter(col("p_size") > 30),
            col("l_partkey") === col("p_partkey")
              && col("l_quantity") > col("p_size"))
          .join(pr, col("pr_r_regionkey") === col("cr_r_regionkey"))
          .groupBy(col("sn_n_name"))
          .agg(count(lit(1)).as("n"),
            moneySum(dec(col("l_extendedprice"))).as("revenue"))
          .withColumnRenamed("sn_n_name", "supp_nation")
          .orderBy("supp_nation")
      })
  )
}
