package graft

import org.apache.spark.sql.functions._

/** Bloom filter + count-min sketch invariants (the q189/q190 operators). */
class SketchSpec extends SparkSpec {

  private val M = 4096
  private val K = 4

  private def keysDf(n: Int) = {
    val session = spark
    import session.implicits._
    (0 until n).map(i => i.toLong * 37 + 11).toDF("k")
  }

  test("Bloom: zero false negatives — every build key passes mightContain") {
    val keys = keysDf(500)
    val f = operators.Bloom.dense(
      operators.Bloom.words(keys, col("k"), M, K), M)
    val misses = keys
      .where(!operators.Bloom.mightContain(col("k"), f, M, K)).count()
    assert(misses == 0L)
  }

  test("Bloom: false-positive rate on disjoint probes is near theory") {
    val keys = keysDf(500)
    val f = operators.Bloom.dense(
      operators.Bloom.words(keys, col("k"), M, K), M)
    val session = spark
    import session.implicits._
    // disjoint probe space (build keys are ≡ 11 mod 37)
    val probes = (0 until 2000).map(i => 1000000L + i * 37 + 12).toDF("k")
    val fp = probes
      .where(operators.Bloom.mightContain(col("k"), f, M, K)).count()
    // theory: (1 - e^(-kn/m))^k ≈ 0.024 at n=500, m=4096, k=4 → ~48 of
    // 2000; allow a generous band (hash family is fixed, not sampled)
    assert(fp < 200, s"false positives $fp out of 2000 — filter degenerate?")
  }

  test("Bloom: shard filters merge losslessly (bit_or per word)") {
    val a = keysDf(300)
    val b = {
      val session = spark
      import session.implicits._
      (300 until 500).map(i => i.toLong * 37 + 11).toDF("k")
    }
    val whole = operators.Bloom.words(a.union(b), col("k"), M, K)
    val merged = operators.Bloom.words(a, col("k"), M, K)
      .union(operators.Bloom.words(b, col("k"), M, K))
      .groupBy("word_idx").agg(expr("bit_or(word)").as("word"))
    assert(operators.Bloom.dense(whole, M).toSeq ==
      operators.Bloom.dense(merged, M).toSeq)
  }

  test("Bloom: probe column stays codegen (no join in the probe plan)") {
    val keys = keysDf(100)
    val f = operators.Bloom.dense(
      operators.Bloom.words(keys, col("k"), M, K), M)
    val plan = keysDf(1000)
      .where(operators.Bloom.mightContain(col("k"), f, M, K))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"probe plan joins:\n$plan")
  }

  test("Cms: estimates are upper bounds, exact for heavy distinct-ish keys") {
    val docs = Db(spark, sf).documents
      .select(explode(split(col("text"), " ")).as("t"))
    val counters = operators.Cms.counters(docs, col("t"), 4, 1024)
      .localCheckpoint(false)
    val exact = docs.groupBy("t").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(30).localCheckpoint(false)
    val joined = operators.Cms.estimate(
        exact.select("t"), "t", counters, 4, 1024)
      .join(exact, "t")
      .select(col("t"), col("est"), col("n")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n"),
        s"CMS under-counted ${r.getAs[String]("t")}")
    }
  }

  test("Cms: shard counter tables merge to the whole-scan sketch") {
    val docs = Db(spark, sf).documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val whole = operators.Cms.counters(docs, col("t"), 4, 256)
    val sharded = operators.Cms.merge(
      operators.Cms.counters(docs.where(col("doc_id") % 2 === 0), col("t"), 4, 256)
        .union(operators.Cms.counters(docs.where(col("doc_id") % 2 === 1), col("t"), 4, 256)))
    val a = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = sharded.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("Cms: counter table is bounded by depth x width") {
    val docs = Db(spark, sf).documents
      .select(explode(split(col("text"), " ")).as("t"))
    assert(operators.Cms.counters(docs, col("t"), 4, 64).count() <= 4L * 64)
  }

  test("Histogram: quantile estimates land within one bin width of exact") {
    val orders = Db(spark, sf).orders
    val (lo, hi, nb) = (0L, 60000000L, 1024)
    val bins = operators.Histogram.bins(orders, col("o_totalprice"), lo, hi, nb)
      .localCheckpoint(false)
    val est = operators.Histogram.quantiles(bins, lo, hi, nb, Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = orders.selectExpr(
        "percentile(floor(o_totalprice * 100), 0.5) AS p50",
        "percentile(floor(o_totalprice * 100), 0.9) AS p90")
      .collect().head
    val width = (hi - lo).toDouble / nb
    assert(math.abs(est(0.5) - exact.getDouble(0)) <= width)
    assert(math.abs(est(0.9) - exact.getDouble(1)) <= width)
  }

  test("Histogram: shard bins merge to the whole-scan table; mass conserved") {
    val orders = Db(spark, sf).orders
    val (lo, hi, nb) = (0L, 60000000L, 256)
    val whole = operators.Histogram.bins(orders, col("o_totalprice"), lo, hi, nb)
    val sharded = operators.Histogram.merge(
      operators.Histogram.bins(orders.where(col("o_orderkey") % 2 === 0),
        col("o_totalprice"), lo, hi, nb)
        .union(operators.Histogram.bins(orders.where(col("o_orderkey") % 2 === 1),
          col("o_totalprice"), lo, hi, nb)))
    val a = whole.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = sharded.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.sum == orders.count()) // clamped, never dropped
  }

  test("PMI: every reported collocation clears minCount and scores exactly") {
    val rows = run("q196_pmi_collocations").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("c_xy") >= 5))
    // descending by the integer score with (center, context) tiebreak
    val scores = rows.map(_.getAs[Long]("pmi_k")).toSeq
    assert(scores == scores.sorted(Ordering[Long].reverse))
  }

  test("CMS join-size estimate upper-bounds the true cardinality, within tail") {
    val db = Db(spark, sf)
    val (d, w) = (4, 512)
    val est = operators.Cms.joinSizeEstimate(
        operators.Cms.counters(db.lineitem, col("l_orderkey"), d, w),
        operators.Cms.counters(db.orders, col("o_orderkey"), d, w), d)
      .collect().head.getLong(0)
    val truth = db.lineitem.select("l_orderkey")
      .join(db.orders.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(est >= truth, s"sketch inner product must over-estimate: $est < $truth")
    // collision tail: expected excess ~ N_A*N_B/width per row; min over
    // depth rows stays within a few multiples of it
    val na = db.lineitem.count(); val nb = db.orders.count()
    assert(est <= truth + 4L * na * nb / w,
      s"estimate $est implausibly far above $truth")
    // disjoint-key regression: with a wide-enough sketch the occupied
    // cells need not coincide on every depth row — a missing row means
    // TRUE inner product 0 and the estimate must be 0, not NULL/minimum
    // of the surviving rows
    import graft.SparkSpec.session.implicits._
    val left = Seq("only_left").toDF("k")
    val right = Seq("only_right").toDF("k")
    val zero = operators.Cms.joinSizeEstimate(
        operators.Cms.counters(left, col("k"), d, 1 << 16),
        operators.Cms.counters(right, col("k"), d, 1 << 16), d)
      .collect().head
    assert(!zero.isNullAt(0) && zero.getLong(0) == 0L,
      s"disjoint sketches must estimate 0, got $zero")
  }

  test("q189 gate: bloom pass set is a superset of the exact match set") {
    val rows = run("q189_bloom_semijoin").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pass, m, fp) = (r.getAs[Long]("n_pass"),
        r.getAs[Long]("n_match"), r.getAs[Long]("n_fp"))
      assert(pass == m + fp) // pass splits exactly into matches + FPs
      assert(pass >= m)      // zero false negatives
    }
  }
}
