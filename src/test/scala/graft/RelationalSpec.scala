package graft

import org.apache.spark.sql.functions._

/** Invariant checks per relational operator (the DuckDB oracle — driver-side
  * and tools/check_oracle.py — is the authoritative value check; these specs
  * pin structural/semantic invariants and keep `sbt test` meaningful offline).
  */
class RelationalSpec extends SparkSpec {

  test("registry hygiene: unique names, oracle SQL only for registered queries") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // the compact bench keys (qNN prefixes) must stay unique too
    val prefixes = names.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.size == prefixes.size,
      s"duplicate bench prefixes: ${prefixes.diff(prefixes.distinct)}")
  }

  test("plan audit: filters and projection reach the parquet scan (q06)") {
    val top = run("q06_forecast_revenue").queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan // unwrap AQE to the current physical plan
      case p => p
    }
    val scan = top
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.nonEmpty, "expected a parquet file scan")
    // predicate pushdown: the scan itself carries the data filters
    assert(scan.get.dataFilters.nonEmpty,
      s"no pushed data filters on the scan: ${scan.get.metadata}")
    // column pruning: only the 4 referenced columns are read, not all 16
    assert(scan.get.requiredSchema.fieldNames.toSet ==
      Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"),
      s"scan reads ${scan.get.requiredSchema.fieldNames.mkString(", ")}")
  }

  test("driver contract: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 aggregates over all 6 flag/status groups and counts add up") {
    val rows = run("q01_pricing_summary").collect()
    assert(rows.length == 6)
    val totalCount = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Db(spark, sf).lineitem
      .filter(col("l_shipdate") <= Db.ts("1998-09-02")).count()
    assert(totalCount == expected)
  }

  test("semi and anti join partition the customer set") {
    val semi = run("q08_semi_join").select("c_custkey").collect().map(_.getLong(0)).toSet
    val anti = Db(spark, sf).customer
      .join(Db(spark, sf).orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert((semi & anti).isEmpty)
    assert((semi | anti).size == Db(spark, sf).customer.count())
  }

  test("outer join keeps customers with zero orders") {
    val df = run("q10_outer_join")
    assert(df.count() == Db(spark, sf).customer.count())
    assert(df.filter(col("n_orders") === 0 && col("total_spent") === 0.0).count() >= 0)
  }

  test("set algebra: |A ∪ B| == |A∩B| + |A\\B| + |B\\A|") {
    val union = run("q25_union").count()
    val inter = run("q26_intersect").count()
    val exceptAB = run("q27_except").count()
    val exceptBA = Db(spark, sf).supplier.select(col("s_nationkey").as("nk"))
      .except(Db(spark, sf).customer.select(col("c_nationkey").as("nk"))).count()
    assert(union == inter + exceptAB + exceptBA)
  }

  test("order-by places nulls last under ASC (reference semantics)") {
    val st = run("q21_orderby_nulls").collect().map(r => Option(r.getAs[String]("st")))
    val firstNull = st.indexWhere(_.isEmpty)
    if (firstNull >= 0) assert(st.drop(firstNull).forall(_.isEmpty))
  }

  test("rollup emits per-group, subtotal and grand-total rows") {
    val rows = run("q30_rollup").collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Db(spark, sf).lineitem.count())
  }

  test("approximate aggregates land within sketch error bounds of exact") {
    // q73 reports the exact distinct count (differentially checked by the
    // oracle) plus in-bound booleans; re-derive the exact side here and
    // additionally pin the raw sketch values against it
    val rows = run("q73_approx_agg").collect()
    val exact = Db(spark, sf).lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd"),
        approx_count_distinct(col("l_partkey")).as("and"),
        expr("percentile(l_extendedprice, 0.5)").as("med"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("amed"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = exact(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Long]("exact_parts") == e.getAs[Long]("nd"))
      assert(r.getAs[Boolean]("parts_ok"), "HLL outside its 3-sigma envelope")
      assert(r.getAs[Boolean]("median_ok"), "approx median outside p45..p55")
      val (nd, and) = (e.getAs[Long]("nd"), e.getAs[Long]("and"))
      assert(math.abs(and - nd).toDouble / nd < 0.1, s"HLL off: $and vs $nd")
      val (med, amed) = (e.getAs[Double]("med"), e.getAs[Double]("amed"))
      assert(math.abs(amed - med) / med < 0.05, s"median off: $amed vs $med")
    }
  }

  test("window top-k returns at most 3 per segment, ranked") {
    val rows = run("q31_window_topk").collect()
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rn")).sorted.sameElements(1 to rs.length))
    }
  }
}
