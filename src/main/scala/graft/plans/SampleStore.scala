package graft.plans

import org.apache.spark.sql.{GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** A leaf's cached sample: row-major values for the join attributes the graph
  * needs, plus per-attribute hash indexes (value → sorted row positions) —
  * the sample-scale analog of the reference's `IntIndex` position lists
  * (/root/reference/src/indexing/IntIndex.java:33-87).
  */
final case class LeafSample(
    nRows: Int,
    cols: Map[String, Array[Any]],        // keyed by attr exprId string
    index: Map[String, java.util.HashMap[Any, Array[Int]]]) {

  def matches(attrKey: String, value: Any): Array[Int] =
    index.get(attrKey).flatMap(m => Option(m.get(value))).getOrElse(Array.empty)
}

/** Collects + caches deterministic per-leaf samples of the already-filtered
  * leaf subplan (pushed-down predicates shape the sample). Rows are taken
  * per-partition and interleaved round-robin, NOT head-first: parquet at
  * scale is usually sorted/clustered, so a `limit(n)` head sample sees one
  * key range and the measured episode rewards mislead the search (the bias
  * SURVEY §7.4 warns about). Interleaving across partitions ≈ across files /
  * key ranges keeps the sample spread while staying deterministic (no rand).
  * Cache key = canonicalized plan, so repeated queries over the same
  * filtered scans reuse samples across the session.
  */
object SampleStore {

  /** Bounded LRU: canonicalized-plan keys embed filter literals, so unbounded
    * growth (sampleSize rows + retained plan per entry) would leak driver
    * memory across a long session of distinct constants. */
  private val maxEntries = 256
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[LogicalPlan, LeafSample](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[LogicalPlan, LeafSample]): Boolean =
        size() > maxEntries
    })

  /** numeric-widening so int32 keys equal int64 keys across tables */
  private def canon(v: Any): Any = v match {
    case null => null
    case b: Byte => java.lang.Long.valueOf(b.toLong)
    case s: Short => java.lang.Long.valueOf(s.toLong)
    case i: Int => java.lang.Long.valueOf(i.toLong)
    case l: Long => java.lang.Long.valueOf(l)
    case f: Float => java.lang.Double.valueOf(f.toDouble)
    case d: Double => java.lang.Double.valueOf(d)
    case other => other
  }

  def sample(spark: SparkSession, leaf: LogicalPlan,
             attrs: Seq[AttributeReference], sampleSize: Int): LeafSample = {
    val key = leaf.canonicalized
    val cached = cache.get(key)
    if (cached != null && attrs.forall(a => cached.cols.contains(attrKey(a)))) return cached

    val wanted: Seq[Attribute] =
      if (attrs.nonEmpty) attrs else leaf.output.take(1)
    val proj = GraftShims
      .ofRows(spark, org.apache.spark.sql.catalyst.plans.logical.Project(wanted.map(_.toAttribute), leaf))
    val rdd = proj.rdd
    val nParts = math.max(rdd.getNumPartitions, 1)
    // each task surrenders at most perPart rows (take() short-circuits), so
    // the collect stays bounded however large the leaf is; 2× headroom covers
    // empty/short partitions
    val perPart = math.max(1, (2L * sampleSize / nParts).toInt + 1)
    val parts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator.single(i -> it.take(perPart).toArray))
      .collect().sortBy(_._1).map(_._2)
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    var depth = 0
    while (buf.length < sampleSize && depth < perPart) {
      parts.foreach { p =>
        if (depth < p.length && buf.length < sampleSize) buf += p(depth)
      }
      depth += 1
    }
    val rows = buf.toArray
    val cols = wanted.zipWithIndex.map { case (a, i) =>
      attrKey(a) -> rows.map(r => canon(r.get(i)))
    }.toMap
    val index = cols.map { case (k, vs) =>
      val m = new java.util.HashMap[Any, Array[Int]]()
      val grouped = vs.zipWithIndex.filter(_._1 != null).groupBy(_._1)
      grouped.foreach { case (v, ps) => m.put(v, ps.map(_._2).sorted) }
      k -> m
    }
    val s = LeafSample(rows.length, cols, index)
    cache.put(key, s)
    s
  }

  def attrKey(a: Attribute): String = a.exprId.id.toString

  def size: Int = cache.size()

  def clear(): Unit = cache.clear()
}
