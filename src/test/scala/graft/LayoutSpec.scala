package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Storage-layout operators: z-order clustering must bound every file's
  * min/max box in BOTH dimensions (that bound is exactly what parquet
  * footer stats / file listings prune on at scale), and compaction must be
  * lossless while actually reducing the file count.
  */
class LayoutSpec extends SparkSpec {

  private val base = s"${Scratch.root}/layout_spec"

  /** Files whose [lo,hi] box on column b intersects [qLo, qHi]. */
  private def filesHit(path: String, qLo: Long, qHi: Long): (Long, Long) = {
    val boxes = Layout.fileBoxes(spark, path, "l_orderkey", "l_partkey")
    val total = boxes.count()
    val hit = boxes.filter(col("b_max") >= qLo && col("b_min") <= qHi).count()
    (hit, total)
  }

  test("z-order bounds both dimensions; a linear sort bounds only its leading column") {
    val li = Db(spark, sf).lineitem.select("l_orderkey", "l_partkey", "l_quantity")
    val zPath = s"$base/z"
    val linPath = s"$base/lin"
    Layout.writeZOrdered(li, "l_orderkey", "l_partkey", zPath, nFiles = 16)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linPath)

    // box on the NON-leading dimension (l_partkey spans 0..199 at sf0.001):
    // the linear layout spreads every partkey across every file, so all
    // files intersect; the z layout keeps bounded partkey ranges per file
    val (zHit, zTotal) = filesHit(zPath, 40, 79)
    val (linHit, linTotal) = filesHit(linPath, 40, 79)
    assert(linHit == linTotal,
      s"expected the linear layout to be unprunable on the non-leading dim, hit $linHit/$linTotal")
    assert(zHit * 2 <= zTotal,
      s"z-order should prune at least half the files for a 20% box, hit $zHit/$zTotal")

    // the box predicate must reach the parquet reader as pushed filters —
    // min/max row-group pruning only bites on filters the scan sees
    val probe = spark.read.parquet(zPath)
      .filter(col("l_orderkey").between(100, 300) &&
        col("l_partkey").between(10, 40))
    // (the toString truncates the pushed-filter list, so assert on the
    // leading entries rather than every bound)
    val scanPlan = probe.queryExecution.executedPlan.toString
    assert(scanPlan.contains("PushedFilters: [IsNotNull(l_orderkey)") &&
      scanPlan.contains("GreaterThanOrEqual(l_orderkey,100)"),
      s"box predicate must push to the scan, got:\n$scanPlan")

    // clustering must never change the data: full-content parity
    val a = li.agg(count(lit(1)), sum("l_orderkey"), sum("l_partkey"),
      sum("l_quantity")).head
    val b = spark.read.parquet(zPath).agg(count(lit(1)), sum("l_orderkey"),
      sum("l_partkey"), sum("l_quantity")).head
    assert(a == b, s"z-ordered copy diverged: $a vs $b")
  }

  test("zValue is monotone per dimension and interleaves fairly") {
    val df = spark.range(0, 256).toDF("a")
      .withColumn("b", col("a") % 4) // 4 groups of 64 sharing a b value
      .withColumn("z", Layout.zValue(
        col("a"), lit(0L), lit(255L), col("b"), lit(0L), lit(255L)))
    val rows = df.orderBy("a").collect()
    // fixing b's bits, z grows with a (monotone quantization + spread)
    val sameB = rows.groupBy(_.getLong(1)).values.filter(_.length > 1)
    sameB.foreach { g =>
      val sorted = g.sortBy(_.getLong(0))
      assert(sorted.map(_.getLong(2)).sliding(2).forall(p => p(0) < p(1)))
    }
    // both dimensions contribute bits: z range must exceed either input's
    val zs = rows.map(_.getLong(2))
    assert(zs.max > 65535, s"interleave should use high bits, max=${zs.max}")
  }

  test("compaction reduces file count and preserves content") {
    val docs = Db(spark, sf).documents
    val fragPath = s"$base/frag"
    val outPath = s"$base/compacted"
    docs.repartition(64).write.mode("overwrite").parquet(fragPath)
    val compacted = Layout.compact(spark, fragPath, outPath, targetBytes = 64L << 20)
    def nFiles(p: String): Int =
      new java.io.File(p).listFiles.count(_.getName.endsWith(".parquet"))
    assert(nFiles(fragPath) == 64)
    assert(nFiles(outPath) <= 4,
      s"expected ~1 compacted file for a tiny table, got ${nFiles(outPath)}")
    val a = docs.agg(count(lit(1)), min("doc_id"), max("doc_id"),
      sum("n_chars")).head
    val b = compacted.agg(count(lit(1)), min("doc_id"), max("doc_id"),
      sum("n_chars")).head
    assert(a == b, s"compaction lost content: $a vs $b")
  }
}
