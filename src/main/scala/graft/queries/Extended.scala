package graft.queries

import graft.Db
import graft.Db.{dec, moneySum, ts}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coverage beyond the core inventory: cross join, CUBE grouping sets,
  * case-insensitive LIKE, date difference arithmetic, as-of join (windowed
  * formulation — no range explosion, the cluster-scale shape), and band/range
  * join against a broadcast tier table.
  */
object Extended {

  val all: Seq[Q] = Seq(
    // --- explicit Cartesian product (the reference only avoids them in
    //     ordering; Spark requires explicit crossJoin)
    Q("q35_cross_join", Some("""
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name LIMIT 50"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.region.crossJoin(d.nation)
          .select("r_name", "n_name").orderBy("r_name", "n_name").limit(50)
      }),

    // --- CUBE (all grouping-set combinations)
    Q("q36_cube", Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST"""),
      (s, dir) => Db(s, dir).orders
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_last, col("o_orderpriority").asc_nulls_last)),

    // --- case-insensitive LIKE (reference has a caseInsensitive DFA flag)
    Q("q37_ilike", Some("""
      SELECT p_partkey, p_name FROM part
      WHERE p_name ILIKE '%BOLT%' ORDER BY p_partkey"""),
      (s, dir) => Db(s, dir).part
        .filter(col("p_name").ilike("%BOLT%"))
        .select("p_partkey", "p_name").orderBy("p_partkey")),

    // --- date difference arithmetic (reference: date - date, TypeVisitor)
    Q("q38_datediff", Some("""
      SELECT l_orderkey, l_linenumber,
        CAST(datediff('day', o_orderdate, l_shipdate) AS INT) AS ship_delay_days
      FROM orders, lineitem WHERE o_orderkey = l_orderkey AND l_orderkey < 100
      ORDER BY l_orderkey, l_linenumber"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.orders.join(d.lineitem, col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            datediff(col("l_shipdate"), col("o_orderdate")).as("ship_delay_days"))
          .orderBy("l_orderkey", "l_linenumber")
      }),

    // --- as-of join: latest 'click' strictly before each 'purchase' by the
    //     same user. Windowed formulation (running last over ordered events)
    //     instead of a range self-join — linear work, shuffles once on user.
    Q("q44_asof_join", Some("""
      SELECT event_id, user_id, ts, prev_click_ts FROM (
        SELECT event_id, user_id, ts, event_type,
          max(CASE WHEN event_type = 'click' THEN ts END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ts
        FROM events) t
      WHERE event_type = 'purchase'
      ORDER BY event_id"""),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Db(s, dir).events
          .withColumn("prev_click_ts",
            max(when(col("event_type") === "click", col("ts"))).over(w))
          .filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "prev_click_ts")
          .orderBy("event_id")
      }),

    // --- band/range join against a small broadcast tier table
    Q("q45_range_join", Some(s"""
      SELECT t.tier, count(*) AS n, ${MSUM(DEC("o_totalprice"))} AS total
      FROM orders, (VALUES ('small', 0.0, 100000.0),
                           ('medium', 100000.0, 300000.0),
                           ('large', 300000.0, 1000000.0)) t(tier, lo, hi)
      WHERE o_totalprice >= t.lo AND o_totalprice < t.hi
      GROUP BY t.tier ORDER BY t.tier"""),
      (s, dir) => {
        val session = s
        import session.implicits._
        val tiers = Seq(("small", 0.0, 100000.0), ("medium", 100000.0, 300000.0),
          ("large", 300000.0, 1000000.0)).toDF("tier", "lo", "hi")
        Db(s, dir).orders
          .join(broadcast(tiers),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy("tier")
          .agg(count(lit(1)).as("n"), moneySum(dec(col("o_totalprice"))).as("total"))
          .orderBy("tier")
      }),

    // --- JOB-shaped min-aggregation over a selective 5-way chain (the
    //     reference's join-order stress shape: imdb/queries/*.sql — LIKE/IN
    //     filters, MIN selects, no GROUP BY). A naive left-to-right order
    //     starting from lineitem is ~100× the work of dims-first.
    Q("q47_job_chain", Some(s"""
      SELECT min(o_totalprice) AS min_order_price,
             ${MSUM(DEC("l_extendedprice"))} AS sum_line_price,
             count(*) AS n
      FROM lineitem, orders, customer, nation, region
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND o_orderpriority = '1-URGENT'
        AND c_acctbal > 0"""),
      (s, dir) => {
        val d = Db(s, dir)
        // deliberately written worst-first (lineitem outermost): the UCT rule
        // must learn to start from the selective dimension side
        d.lineitem
          .join(d.orders.filter(col("o_orderpriority") === "1-URGENT"),
            col("l_orderkey") === col("o_orderkey"))
          .join(d.customer.filter(col("c_acctbal") > 0),
            col("o_custkey") === col("c_custkey"))
          .join(d.nation, col("c_nationkey") === col("n_nationkey"))
          .join(d.region.filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .agg(min("o_totalprice").as("min_order_price"),
            moneySum(dec(col("l_extendedprice"))).as("sum_line_price"),
            count(lit(1)).as("n"))
      }),

    // --- JOB-shaped star: part × supplier × lineitem with LIKE/IN filters
    Q("q48_job_star", Some("""
      SELECT min(l_extendedprice) AS min_price, min(p_name) AS min_pname,
             min(s_name) AS min_sname
      FROM lineitem, part, supplier
      WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        AND p_name LIKE '%bolt%' AND p_size IN (1, 2, 3, 4, 5)
        AND s_acctbal > 1000"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.lineitem
          .join(d.part.filter(col("p_name").like("%bolt%")
            && col("p_size").isin(1, 2, 3, 4, 5)), col("l_partkey") === col("p_partkey"))
          .join(d.supplier.filter(col("s_acctbal") > 1000),
            col("l_suppkey") === col("s_suppkey"))
          .agg(min("l_extendedprice").as("min_price"),
            min("p_name").as("min_pname"), min("s_name").as("min_sname"))
      }),

    // --- exact interpolated percentiles (beyond-parity; deterministic:
    //     both engines linear-interpolate over the sorted exact values)
    Q("q39_percentiles", Some("""
      SELECT o_orderstatus,
        round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      (s, dir) => Db(s, dir).orders
        .groupBy("o_orderstatus")
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"))
        .orderBy("o_orderstatus")),

    // --- ordered string aggregation (reference lists group_concat as
    //     unsupported; both engines sort members for determinism)
    Q("q49_string_agg", Some("""
      SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
      FROM supplier, nation WHERE s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""),
      (s, dir) => {
        val d = Db(s, dir)
        d.supplier.join(d.nation, col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(concat_ws(",", sort_array(collect_list(col("s_name")))).as("suppliers"))
          .orderBy("n_name")
      }),

    // --- bitwise expression surface (typed but uncompiled in the reference)
    Q("q62_bitwise", Some("""
      SELECT c_custkey,
        c_custkey & 255 AS key_and,
        c_custkey | 4096 AS key_or,
        xor(c_custkey, 129) AS key_xor,
        c_custkey << 2 AS key_shl,
        c_custkey >> 1 AS key_shr
      FROM customer ORDER BY c_custkey LIMIT 200"""),
      (s, dir) => Db(s, dir).customer.select(
        col("c_custkey"),
        col("c_custkey").bitwiseAND(255).as("key_and"),
        col("c_custkey").bitwiseOR(4096).as("key_or"),
        col("c_custkey").bitwiseXOR(129).as("key_xor"),
        shiftleft(col("c_custkey"), 2).as("key_shl"),
        shiftright(col("c_custkey"), 1).as("key_shr"))
        .orderBy("c_custkey").limit(200)),

    // --- generator surface: explode words → global word count (the unnest
    //     operator as a first-class query)
    Q("q64_wordcount", Some("""
      SELECT w, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
      GROUP BY w ORDER BY n DESC, w LIMIT 20"""),
      (s, dir) => Db(s, dir).documents
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(20)),

    // --- array aggregation with deterministic ordering
    // (array surfaced as a joined string — array-typed result columns break
    // row-sorting comparison harnesses on both sides of the oracle)
    Q("q65_array_agg", Some("""
      SELECT user_id,
        array_to_string(list(DISTINCT event_type ORDER BY event_type), ',') AS types,
        CAST(len(list(DISTINCT event_type)) AS INT) AS n_types
      FROM events GROUP BY user_id ORDER BY user_id LIMIT 100"""),
      (s, dir) => Db(s, dir).events
        .groupBy("user_id")
        .agg(concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"),
          size(collect_set(col("event_type"))).as("n_types"))
        .orderBy("user_id").limit(100)),

    // --- statistical aggregates (reference has none beyond the 5)
    Q("q66_stats_agg", Some("""
      SELECT o_orderstatus,
        round(stddev_samp(o_totalprice), 2) AS sd_price,
        round(var_samp(o_totalprice), 1) AS var_price,
        round(corr(o_totalprice, o_custkey), 6) AS corr_pc
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      (s, dir) => Db(s, dir).orders
        .groupBy("o_orderstatus")
        .agg(round(stddev_samp(col("o_totalprice")), 2).as("sd_price"),
          round(var_samp(col("o_totalprice")), 1).as("var_price"),
          round(corr(col("o_totalprice"), col("o_custkey")), 6).as("corr_pc"))
        .orderBy("o_orderstatus")),

    // --- arbitrary GROUPING SETS through the SQL facade
    Q("q67_grouping_sets", Some("""
      SELECT c_mktsegment, c_nationkey, count(*) AS n,
        CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
      ORDER BY c_mktsegment NULLS LAST, c_nationkey NULLS LAST"""),
      (s, dir) => graft.GraftSession.execute(s, dir, """
        SELECT c_mktsegment, c_nationkey, count(*) AS n,
          CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY c_mktsegment NULLS LAST, c_nationkey NULLS LAST""")),

    // --- null-safe equality (<=> / IS NOT DISTINCT FROM)
    Q("q68_null_safe_eq", Some("""
      SELECT o_orderkey,
        (CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END
           IS NOT DISTINCT FROM 'F') AS is_f,
        (CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END
           IS NOT DISTINCT FROM NULL) AS is_null_match
      FROM orders ORDER BY o_orderkey LIMIT 300"""),
      (s, dir) => {
        val st = when(col("o_orderstatus") === "P", lit(null).cast("string"))
          .otherwise(col("o_orderstatus"))
        Db(s, dir).orders.select(col("o_orderkey"),
          (st <=> "F").as("is_f"),
          (st <=> lit(null).cast("string")).as("is_null_match"))
          .orderBy("o_orderkey").limit(300)
      }),

    // --- custom physical operator: heap-based top-k per key (bounded-shuffle
    //     alternative to the window formulation; oracle = row_number SQL)
    Q("q71_topk_operator", Some("""
      SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_custkey, o_totalprice DESC, o_orderkey"""),
      (s, dir) => graft.plans.TopK.perKey(
          Db(s, dir).orders, Seq("o_custkey"),
          Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))),

    // --- self-join (same relation twice in the join graph; also exercises
    //     the UCT sampler's handling of canonically-identical leaves)
    Q("q72_self_join", Some("""
      SELECT c_mktsegment, count(*) AS n_pairs
      FROM orders o1, orders o2, customer
      WHERE o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey
        AND c_custkey = o1.o_custkey
        AND datediff('day', o1.o_orderdate, o2.o_orderdate) BETWEEN 0 AND 30
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) => {
        val d = Db(s, dir)
        val o1 = d.orders.select(col("o_orderkey").as("k1"),
          col("o_custkey").as("ck1"), col("o_orderdate").as("d1"))
        val o2 = d.orders.select(col("o_orderkey").as("k2"),
          col("o_custkey").as("ck2"), col("o_orderdate").as("d2"))
        o1.join(o2, col("ck1") === col("ck2") && col("k1") < col("k2")
            && datediff(col("d2"), col("d1")).between(0, 30))
          .join(d.customer, col("c_custkey") === col("ck1"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("c_mktsegment")
      }),

    // --- approximate aggregates (HLL++ / quantile sketch): sketch INTERNALS
    //     are engine-specific, so the differential check pins what a sketch
    //     actually promises — the exact distinct count (recomputed by DuckDB)
    //     plus the sketch's error bounds as booleans the oracle asserts TRUE:
    //     HLL++ within its 3σ envelope (rsd 0.05 → 15%), the approx median
    //     inside the exact p45–p55 rank window (accuracy 1000 guarantees
    //     rank error ≤ n/1000, 50× tighter). A sketch regression now fails
    //     the driver gate instead of hiding behind a rows-only check.
    Q("q73_approx_agg", Some("""
      SELECT l_returnflag,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        TRUE AS parts_ok, TRUE AS median_ok
      FROM lineitem GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        // Two deliberate plan choices keep the verification gate cheap:
        // (1) the exact distinct count runs as its own pre-deduplicated
        // aggregate (map-side-combined distinct, then a count) and joins
        // back on the 3 group rows — mixing countDistinct with the other
        // aggregates would make Spark Expand every input row per aggregate
        // family; (2) ONE exact-percentile aggregate evaluates both rank
        // bounds (a single sort path instead of two).
        val li = Db(s, dir).lineitem
          .select(col("l_returnflag"), col("l_partkey"), col("l_extendedprice"))
        val exact = li.select("l_returnflag", "l_partkey").distinct()
          .groupBy("l_returnflag").agg(count(lit(1)).as("exact_parts"))
        val approx = li.groupBy("l_returnflag").agg(
          approx_count_distinct(col("l_partkey")).as("ap"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
          expr("percentile(l_extendedprice, array(0.45, 0.55))").as("pp"))
        val g = exact.join(approx, "l_returnflag")
          .select(col("*"), col("pp").getItem(0).as("p45"),
            col("pp").getItem(1).as("p55"))
        g.select(col("l_returnflag"), col("exact_parts"),
            (abs(col("ap") - col("exact_parts"))
              <= col("exact_parts") * lit(0.15)).as("parts_ok"),
            (col("am") >= col("p45") && col("am") <= col("p55")).as("median_ok"))
          .orderBy("l_returnflag")
      }),

    // --- q95: correlated LATERAL top-N — for every nation, its two
    //     highest-balance suppliers, written exactly as the SQL a user would
    //     type and executed through the spark.sql facade (identical text
    //     runs on DuckDB)
    Q("q95_lateral_topn", Some("""
      SELECT n_name, s_name, s_acctbal
      FROM nation, LATERAL (
        SELECT s_name, s_acctbal FROM supplier
        WHERE s_nationkey = n_nationkey
        ORDER BY s_acctbal DESC, s_name LIMIT 2) t
      ORDER BY n_name, s_acctbal DESC, s_name"""),
      (s, dir) => graft.GraftSession.execute(s, dir, """
        SELECT n_name, s_name, s_acctbal
        FROM nation, LATERAL (
          SELECT s_name, s_acctbal FROM supplier
          WHERE s_nationkey = n_nationkey
          ORDER BY s_acctbal DESC, s_name LIMIT 2) t
        ORDER BY n_name, s_acctbal DESC, s_name""")),

    // --- q96: PIVOT (Dataset relational pivot; oracle is the equivalent
    //     conditional-count formulation)
    Q("q96_pivot", Some("""
      SELECT o_orderstatus,
        CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS p1,
        CAST(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS p2,
        CAST(count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS p3,
        CAST(count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS p4,
        CAST(count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS p5
      FROM orders GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val pivoted = Db(s, dir).orders
          .groupBy("o_orderstatus")
          .pivot("o_orderpriority", prios)
          .count()
        prios.zipWithIndex.foldLeft(pivoted) { case (df, (p, i)) =>
          df.withColumn(s"p${i + 1}", coalesce(col(s"`$p`"), lit(0L))).drop(p)
        }.orderBy("o_orderstatus")
      }),

    // --- TPC-H Q2-shaped: min-cost supplier per part via groupBy + join-back
    //     (the reference's correlated-subquery pattern, decorrelated)
    Q("q46_min_by_group_join", Some("""
      SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal FROM supplier s, nation n,
        (SELECT s_nationkey AS nk, max(s_acctbal) AS mb FROM supplier GROUP BY s_nationkey) m
      WHERE s.s_nationkey = n.n_nationkey AND s.s_nationkey = m.nk AND s.s_acctbal = m.mb
      ORDER BY s.s_suppkey"""),
      (s, dir) => {
        val d = Db(s, dir)
        val best = d.supplier.groupBy(col("s_nationkey").as("nk"))
          .agg(max("s_acctbal").as("mb"))
        d.supplier.join(d.nation, col("s_nationkey") === col("n_nationkey"))
          .join(best, col("s_nationkey") === col("nk") && col("s_acctbal") === col("mb"))
          .select("s_suppkey", "s_name", "n_name", "s_acctbal")
          .orderBy("s_suppkey")
      })
  )
}
