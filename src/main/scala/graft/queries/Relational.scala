package graft.queries

import graft.Db
import graft.Db.{avg2, dec, moneySum, rate, ts}
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.1–§2.7): scan, filter,
  * projection, inner/semi/anti/outer/theta joins, the reference's five
  * aggregates (MIN/MAX/SUM/AVG/COUNT — /root/reference/src/expressions/
  * aggregates/AggInfo.java:96-109), HAVING, ORDER BY with the reference's
  * nulls-last-ASC semantics (/root/reference/src/operators/OrderBy.java:130-152),
  * LIMIT, set ops (beyond-parity, SURVEY §2.6), scalar expression surface
  * (§2.7: arithmetic, date±interval, EXTRACT, BETWEEN, IN, LIKE, CASE, CAST,
  * concat) plus beyond-parity string/math function library.
  *
  * All expressed declaratively on the DataFrame API so Catalyst handles
  * pushdown/pruning/reorder; joins against dimension tables broadcast
  * automatically under the default threshold.
  */
object Relational {

  val all: Seq[Q] = Seq(
    // --- q01: scan → filter → group → 5-aggregate surface → sort (TPC-H Q1 shape)
    Q("q01_pricing_summary", Some(s"""
      SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        ${MSUM(DEC("l_extendedprice"))} AS sum_base_price,
        ${MSUM(s"${DEC("l_extendedprice")} * (1 - ${RT("l_discount")})")} AS sum_disc_price,
        ${MSUM(s"${DEC("l_extendedprice")} * (1 - ${RT("l_discount")}) * (1 + ${RT("l_tax")})")} AS sum_charge,
        sum(l_quantity) / count(*) AS avg_qty,
        ${AVG2("l_extendedprice")} AS avg_price,
        ${AVG2("l_discount")} AS avg_disc,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.lineitem
          .filter(col("l_shipdate") <= ts("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"),
            moneySum(dec(col("l_extendedprice"))).as("sum_base_price"),
            moneySum(dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
              .as("sum_disc_price"),
            moneySum(dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
              * (lit(1) + rate(col("l_tax")))).as("sum_charge"),
            (sum("l_quantity") / count(lit(1))).as("avg_qty"),
            avg2(col("l_extendedprice")).as("avg_price"),
            avg2(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }),

    // --- q03: selective 3-way join → group → top-k (TPC-H Q3 shape)
    Q("q03_shipping_priority", Some(s"""
      SELECT l_orderkey,
        ${MSUM(s"${DEC("l_extendedprice")} * (1 - ${RT("l_discount")})")} AS revenue,
        o_orderdate, o_orderpriority
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-06-15'
        AND l_shipdate > TIMESTAMP '1998-06-15'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.customer.filter(col("c_mktsegment") === "BUILDING")
          .join(d.orders.filter(col("o_orderdate") < ts("1998-06-15")),
            col("c_custkey") === col("o_custkey"))
          .join(d.lineitem.filter(col("l_shipdate") > ts("1998-06-15")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(moneySum(dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
          .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      }),

    // --- q05: 6-way snowflake join (the join-order stress shape; JOB-style)
    Q("q05_local_supplier_volume", Some(s"""
      SELECT n_name,
        ${MSUM(s"${DEC("l_extendedprice")} * (1 - ${RT("l_discount")})")} AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.customer
          .join(d.orders.filter(col("o_orderdate") >= ts("1996-01-01")
            && col("o_orderdate") < ts("1998-01-01")),
            col("c_custkey") === col("o_custkey"))
          .join(d.lineitem, col("o_orderkey") === col("l_orderkey"))
          .join(d.supplier, col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
          .join(d.nation, col("s_nationkey") === col("n_nationkey"))
          .join(d.region, col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(moneySum(dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),

    // --- q06: filter-only aggregation (predicate pushdown showcase)
    Q("q06_forecast_revenue", Some(s"""
      SELECT ${MSUM(s"${DEC("l_extendedprice")} * ${RT("l_discount")}")} AS revenue,
             count(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.lineitem
          .filter(col("l_shipdate") >= ts("1997-01-01")
            && col("l_shipdate") < ts("1998-01-01")
            && col("l_discount").between(0.03, 0.07)
            && col("l_quantity") < 24)
          .agg(moneySum(dec(col("l_extendedprice")) * rate(col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_lines"))
      }),

    // --- q07: theta join (equi key + non-equi residual), reference §2.3 theta predicates
    Q("q07_theta_join", Some(s"""
      SELECT p_brand, count(*) AS n_li, ${MSUM(DEC("l_extendedprice"))} AS total_price
      FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
      GROUP BY p_brand ORDER BY p_brand"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.lineitem
          .join(d.part, col("l_partkey") === col("p_partkey")
            && col("l_quantity") > col("p_size"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_li"), moneySum(dec(col("l_extendedprice"))).as("total_price"))
          .orderBy("p_brand")
      }),

    // --- q08: semi join (true EXISTS semantics — fixes the reference's
    //     IN→inner-join multiplicity quirk, SURVEY §2.3)
    Q("q08_semi_join", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.customer
          .join(d.orders.filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      }),

    // --- q09: anti join
    Q("q09_anti_join", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.customer
          .join(d.orders.filter(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      }),

    // --- q10: left outer join + aggregation over nullable side (beyond reference: inner-only)
    Q("q10_outer_join", Some(s"""
      SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
             COALESCE(${MSUM(DEC("o_totalprice"))}, 0.0) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name ORDER BY c_custkey"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.customer
          .join(d.orders, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey", "c_name")
          .agg(count(col("o_orderkey")).as("n_orders"),
            coalesce(moneySum(dec(col("o_totalprice"))), lit(0.0)).as("total_spent"))
          .orderBy("c_custkey")
      }),

    // --- q11: join → group → HAVING (reference PostProcessor.java:418-438)
    Q("q11_having", Some(s"""
      SELECT n_name, ${MSUM(DEC("s_acctbal"))} AS total_bal, count(*) AS n_supp
      FROM supplier, nation WHERE s_nationkey = n_nationkey
      GROUP BY n_name
      HAVING ${MSUM(DEC("s_acctbal"))} > 1000.0
      ORDER BY n_name"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.supplier.join(d.nation, col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(moneySum(dec(col("s_acctbal"))).as("total_bal"), count(lit(1)).as("n_supp"))
          .filter(col("total_bal") > 1000.0)
          .orderBy("n_name")
      }),

    // --- q12: CASE-inside-aggregate (TPC-H Q12 shape)
    Q("q12_case_agg", Some("""
      SELECT l_returnflag,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, dir) => {
        val d = Db(s, dir)
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        d.orders.join(d.lineitem, col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
          .groupBy("l_returnflag")
          .agg(sum(when(hi, 1).otherwise(0)).as("high_line_count"),
            sum(when(!hi, 1).otherwise(0)).as("low_line_count"))
          .orderBy("l_returnflag")
      }),

    // --- q13: DISTINCT projection
    Q("q13_distinct", Some("""
      SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      ORDER BY c_mktsegment, c_nationkey"""),
      (s, dir) => Db(s, dir).customer
        .select("c_mktsegment", "c_nationkey").distinct()
        .orderBy("c_mktsegment", "c_nationkey")),

    // --- q14: conditional-aggregate ratio (TPC-H Q14 shape)
    Q("q14_promo_effect", Some(s"""
      SELECT 100.0 * ${MSUM(s"CASE WHEN p_type = 'PROMO' THEN ${DEC("l_extendedprice")} * (1 - ${RT("l_discount")}) ELSE 0 END")}
             / ${MSUM(s"${DEC("l_extendedprice")} * (1 - ${RT("l_discount")})")} AS promo_revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'"""),
      (s, dir) => {
        val d = Db(s, dir)
        val discPrice = dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
        d.lineitem.join(d.part, col("l_partkey") === col("p_partkey"))
          .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1997-07-01"))
          .agg((lit(100.0) * moneySum(when(col("p_type") === "PROMO", discPrice).otherwise(lit(0)))
            / moneySum(discPrice)).as("promo_revenue"))
      }),

    // --- q15: uncorrelated scalar subquery (reference UnnestingVisitor scalar path)
    Q("q15_scalar_subquery", Some(s"""
      SELECT s_suppkey, s_name, s_acctbal FROM supplier
      WHERE s_acctbal > (SELECT ${AVG2("s_acctbal")} FROM supplier)
      ORDER BY s_suppkey"""),
      (s, dir) => {
        val d = Db(s, dir)
        val avgBal = d.supplier.agg(avg2(col("s_acctbal")).as("avg_bal"))
        d.supplier.crossJoin(avgBal)
          .filter(col("s_acctbal") > col("avg_bal"))
          .select("s_suppkey", "s_name", "s_acctbal").orderBy("s_suppkey")
      }),

    // --- q16: correlated subquery (TPC-H Q17 shape), decorrelated to group+join
    Q("q16_correlated_subquery", Some(s"""
      SELECT ${MSUM(DEC("l_extendedprice"))} / 7.0 AS avg_yearly
      FROM lineitem l, part
      WHERE p_partkey = l.l_partkey AND p_brand = 'Brand#1'
        AND l.l_quantity < (SELECT 0.5 * (sum(l2.l_quantity) / count(*))
                            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"""),
      (s, dir) => {
        val d = Db(s, dir)
        val avgQty = d.lineitem.groupBy(col("l_partkey").as("ap_partkey"))
          .agg((sum("l_quantity") / count(lit(1))).as("part_avg_qty"))
        d.lineitem.join(d.part.filter(col("p_brand") === "Brand#1"),
            col("l_partkey") === col("p_partkey"))
          .join(avgQty, col("l_partkey") === col("ap_partkey"))
          .filter(col("l_quantity") < lit(0.5) * col("part_avg_qty"))
          .agg((moneySum(dec(col("l_extendedprice"))) / lit(7.0)).as("avg_yearly"))
      }),

    // --- q17: IN value-list (reference rewrites to OR-chain; Spark isin)
    Q("q17_in_list", Some("""
      SELECT p_brand, count(*) AS n_parts, CAST(sum(p_size) AS BIGINT) AS total_size
      FROM part
      WHERE p_brand IN ('Brand#1','Brand#3','Brand#5')
        AND p_size IN (1, 5, 9, 14, 23, 36, 45, 49)
      GROUP BY p_brand ORDER BY p_brand"""),
      (s, dir) => Db(s, dir).part
        .filter(col("p_brand").isin("Brand#1", "Brand#3", "Brand#5")
          && col("p_size").isin(1, 5, 9, 14, 23, 36, 45, 49))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"), sum("p_size").as("total_size"))
        .orderBy("p_brand")),

    // --- q18: LIKE + BETWEEN (reference compiles LIKE to a DFA; Spark built-in)
    Q("q18_like_between", Some("""
      SELECT p_partkey, p_name, p_retailprice FROM part
      WHERE p_name LIKE '%bolt%' AND p_retailprice BETWEEN 500.0 AND 1500.0
      ORDER BY p_partkey"""),
      (s, dir) => Db(s, dir).part
        .filter(col("p_name").like("%bolt%") && col("p_retailprice").between(500.0, 1500.0))
        .select("p_partkey", "p_name", "p_retailprice").orderBy("p_partkey")),

    // --- q19: disjunctive multi-predicate join (TPC-H Q19 shape)
    Q("q19_disjunctive_join", Some(s"""
      SELECT ${MSUM(s"${DEC("l_extendedprice")} * (1 - ${RT("l_discount")})")} AS revenue,
             count(*) AS n
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND (
           (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 15)
        OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 25)
        OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 35))"""),
      (s, dir) => {
        val d = Db(s, dir)
        val cond =
          (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) && col("p_size").between(1, 15)) ||
          (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) && col("p_size").between(1, 25)) ||
          (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) && col("p_size").between(1, 35))
        d.lineitem.join(d.part, col("l_partkey") === col("p_partkey"))
          .filter(cond)
          .agg(moneySum(dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))).as("revenue"),
            count(lit(1)).as("n"))
      }),

    // --- q20: date ± interval arithmetic + EXTRACT (reference TypeVisitor.java:237-303)
    Q("q20_date_arith", Some(s"""
      SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
             count(*) AS n_orders, ${MSUM(DEC("o_totalprice"))} AS total
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01' + INTERVAL 2 YEAR
      GROUP BY yr, mo ORDER BY yr, mo"""),
      (s, dir) => Db(s, dir).orders
        .filter(col("o_orderdate") >= ts("1996-01-01")
          && col("o_orderdate") < (ts("1996-01-01") + expr("INTERVAL 2 YEAR")))
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"), moneySum(dec(col("o_totalprice"))).as("total"))
        .orderBy("yr", "mo")),

    // --- q21: ORDER BY null placement parity (reference: nulls last under ASC)
    Q("q21_orderby_nulls", Some("""
      SELECT o_orderkey, CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS st
      FROM orders ORDER BY st ASC NULLS LAST, o_orderkey DESC LIMIT 100"""),
      (s, dir) => Db(s, dir).orders
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "P", lit(null).cast("string"))
            .otherwise(col("o_orderstatus")).as("st"))
        .orderBy(col("st").asc_nulls_last, col("o_orderkey").desc)
        .limit(100)),

    // --- q22: string function library (beyond-parity: reference has none, §2.7)
    Q("q22_string_funcs", Some("""
      SELECT c_custkey,
        upper(c_mktsegment) AS seg_upper,
        lower(c_name) AS name_lower,
        substring(c_name, 10, 9) AS name_digits,
        CAST(length(c_name) AS INT) AS name_len,
        c_mktsegment || '-' || c_name AS seg_name,
        replace(c_name, 'Customer#', 'C') AS short_name
      FROM customer ORDER BY c_custkey"""),
      (s, dir) => Db(s, dir).customer.select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        substring(col("c_name"), 10, 9).as("name_digits"),
        length(col("c_name")).as("name_len"),
        concat(col("c_mktsegment"), lit("-"), col("c_name")).as("seg_name"),
        regexp_replace(col("c_name"), "Customer#", "C").as("short_name"))
        .orderBy("c_custkey")),

    // --- q23: math function library (beyond-parity)
    Q("q23_math_funcs", Some("""
      SELECT l_orderkey, l_linenumber,
        abs(-l_quantity) AS abs_qty,
        round(l_extendedprice * l_discount, 1) AS rounded_disc,
        CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        sqrt(l_quantity) AS sqrt_qty,
        round(ln(l_extendedprice), 6) AS ln_price,
        l_orderkey % 7 AS key_mod
      FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber"""),
      (s, dir) => Db(s, dir).lineitem
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(-col("l_quantity")).as("abs_qty"),
          round(col("l_extendedprice") * col("l_discount"), 1).as("rounded_disc"),
          floor(col("l_extendedprice")).as("floor_price"),
          ceil(col("l_extendedprice")).as("ceil_price"),
          sqrt(col("l_quantity")).as("sqrt_qty"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          (col("l_orderkey") % 7).as("key_mod"))
        .orderBy("l_orderkey", "l_linenumber")),

    // --- q24: CAST surface + boolean projection (reference ExpressionCompiler casts)
    Q("q24_cast_expr", Some("""
      SELECT c_custkey,
        CAST(c_custkey AS VARCHAR) AS key_str,
        CAST(substring(c_name, 10, 9) AS BIGINT) AS key_parsed,
        CAST(c_nationkey AS DOUBLE) AS nk_d,
        c_custkey * 2 + 1 AS arith,
        c_mktsegment = 'BUILDING' AS is_building
      FROM customer ORDER BY c_custkey"""),
      (s, dir) => Db(s, dir).customer.select(
        col("c_custkey"),
        col("c_custkey").cast("string").as("key_str"),
        substring(col("c_name"), 10, 9).cast("long").as("key_parsed"),
        col("c_nationkey").cast("double").as("nk_d"),
        (col("c_custkey") * 2 + 1).as("arith"),
        (col("c_mktsegment") === "BUILDING").as("is_building"))
        .orderBy("c_custkey")),

    // --- q25–q27: set operations (beyond-parity; reference rejects them, §2.6)
    Q("q25_union", Some("""
      SELECT c_nationkey AS nk FROM customer UNION
      SELECT s_nationkey AS nk FROM supplier ORDER BY nk"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.customer.select(col("c_nationkey").as("nk"))
          .union(d.supplier.select(col("s_nationkey").as("nk")))
          .distinct().orderBy("nk")
      }),
    Q("q26_intersect", Some("""
      SELECT c_nationkey AS nk FROM customer INTERSECT
      SELECT s_nationkey AS nk FROM supplier ORDER BY nk"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.customer.select(col("c_nationkey").as("nk"))
          .intersect(d.supplier.select(col("s_nationkey").as("nk")))
          .orderBy("nk")
      }),
    Q("q27_except", Some("""
      SELECT c_nationkey AS nk FROM customer EXCEPT
      SELECT s_nationkey AS nk FROM supplier ORDER BY nk"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.customer.select(col("c_nationkey").as("nk"))
          .except(d.supplier.select(col("s_nationkey").as("nk")))
          .orderBy("nk")
      }),

    // --- q28: global (ALL_ROWS) aggregation incl. COUNT DISTINCT
    Q("q28_agg_global", Some(s"""
      SELECT count(*) AS n_rows,
        count(DISTINCT l_partkey) AS n_parts,
        min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        sum(l_quantity) AS total_qty,
        ${MSUM(DEC("l_extendedprice"))} AS total_price,
        min(l_returnflag) AS min_flag
      FROM lineitem"""),
      (s, dir) => Db(s, dir).lineitem.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_partkey")).as("n_parts"),
        min("l_shipdate").as("min_ship"), max("l_shipdate").as("max_ship"),
        sum("l_quantity").as("total_qty"),
        moneySum(dec(col("l_extendedprice"))).as("total_price"),
        min("l_returnflag").as("min_flag"))),

    // --- q29: grouped COUNT DISTINCT
    Q("q29_count_distinct_group", Some("""
      SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, dir) => Db(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy("l_returnflag")),

    // --- q30: ROLLUP (beyond-parity; reference has no grouping sets)
    Q("q30_rollup", Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST"""),
      (s, dir) => Db(s, dir).lineitem
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last))
  )
}
