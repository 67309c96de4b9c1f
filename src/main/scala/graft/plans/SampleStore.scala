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
  * leaf subplan (pushed-down predicates shape the sample).
  *
  * Default mode is a SEEDED PER-PARTITION RESERVOIR (Algorithm R with a
  * partition-indexed seed): one pass over each partition, bounded memory
  * (perPart rows), and every row of the partition equally likely to be
  * kept. Parquet at scale is usually sorted/clustered (ids ascending,
  * events time-ordered), so any head-of-partition `take(n)` sees one key
  * range and the measured episode rewards mislead the search — the bias
  * SURVEY §7.4 warns about, and exactly what the reference avoids by
  * measuring real-data progress (OldJoin.java:92-106). The reservoir pass
  * reads its whole (already filter-pushed, column-pruned) partition but
  * collects only perPart rows per partition to the driver, and the SCAN
  * itself is bounded too: at most `spark.graft.uct.samplePartitions`
  * (default 64) seeded-randomly-chosen partitions are ever scheduled, so
  * plan-time IO stays flat however large the leaf is. Set
  * `spark.graft.uct.sampleMode=head` to opt back into the cheap prefix
  * take when plan-time scan cost matters more than sample fidelity.
  * Samples stay deterministic in both modes: the seed is fixed per
  * (conf.seed, partition index), and partition layout of a parquet scan is
  * stable. Rows are interleaved round-robin across partitions either way.
  * Cache key = canonicalized plan, so repeated queries over the same
  * filtered scans reuse samples across the session.
  */
object SampleStore {

  /** Cache payload: sampled columns keyed by POSITION in the canonicalized
    * leaf's output, not by exprId. Canonically-equal plans (self-join roles,
    * the same query re-run) carry DIFFERENT exprIds for the same column, so
    * an exprId-keyed entry missed for every role after the first and each
    * `put` evicted the previous role's columns; positions are stable across
    * canonical equality, so all roles share ONE sample and later requests
    * for NEW columns merge into the entry instead of replacing it. */
  private final case class PosSample(
      nRows: Int,
      cols: Map[Int, Array[Any]],
      index: Map[Int, java.util.HashMap[Any, Array[Int]]])

  /** Bounded LRU: canonicalized-plan keys embed filter literals, so unbounded
    * growth (sampleSize rows + retained plan per entry) would leak driver
    * memory across a long session of distinct constants. Seed, mode, and
    * the partition bound are part of the key — switching
    * `spark.graft.uct.sampleMode` or `…samplePartitions` mid-session must
    * not silently serve samples taken under the other setting. */
  private val maxEntries = 256
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(LogicalPlan, Long, String, Int), PosSample](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(LogicalPlan, Long, String, Int), PosSample]): Boolean =
        size() > maxEntries
    })

  /** Striped locks making the miss path atomic PER KEY: UctJoinReorderRule
    * samples leaves from concurrent Futures, and without the stripe two
    * canonically-equal roles could each miss, each scan, and the second
    * `put` silently drop the first's merged columns — re-opening the
    * re-scan the positional cache exists to prevent. 64 stripes keep
    * unrelated leaves sampling in parallel (collisions merely serialize two
    * scans, never corrupt); one stripe per key would pin the retained
    * canonical plans the LRU bound exists to cap. */
  private val lockStripes = Array.fill(64)(new Object)
  private def stripeFor(key: (LogicalPlan, Long, String, Int)): Object =
    lockStripes(math.floorMod(key.hashCode, lockStripes.length))

  /** Plan-time sampling telemetry (driver-side, test/bench attribution): how
    * many cache hits vs actual sample SCANS (each scan = one bounded Spark
    * job) and the wall time spent inside them. Bench threads scanMillis
    * deltas through each timed pass (Pass{1,2}SampleMs in the per-pass CSV)
    * so a slow pass splits into plan-time-sampling vs execution without a
    * judge rerun — the ambiguity behind the r9 q82–q86/q165/q55 rows. */
  private val scanCountA = new java.util.concurrent.atomic.AtomicLong
  private val hitCountA = new java.util.concurrent.atomic.AtomicLong
  private val scanNanosA = new java.util.concurrent.atomic.AtomicLong
  def scanCount: Long = scanCountA.get
  def hitCount: Long = hitCountA.get
  def scanMillis: Long = scanNanosA.get / 1000000L
  def resetStats(): Unit = { scanCountA.set(0); hitCountA.set(0); scanNanosA.set(0) }

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

  /** Per-partition sample (seeded Algorithm-R reservoir, or a cheap prefix
    * take when `head`) interleaved ROUND-ROBIN across partitions — every
    * partition contributes to the final n rows, so data clustered by key
    * (sorted parquet, the common layout) cannot hide a range or a heavy
    * hitter in the partitions a naive flatten-then-take would drop. One
    * pass, O(perPart) memory per task, only perPart rows per partition
    * reach the driver. Shared by the UCT leaf sampler and
    * `Leapfrog.skewAwareShares`.
    */
  private[plans] def interleavedSample(
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row],
      n: Int, seed: Long, head: Boolean,
      maxParts: Int = 64): Array[org.apache.spark.sql.Row] = {
    val allParts = math.max(rdd.getNumPartitions, 1)
    // bound the plan-time SCAN, not just the collect: the reservoir pass
    // consumes its whole partition iterator, so over a 100 TB leaf an
    // unpruned pass would read every filtered partition before the query
    // even starts. Sample a SEEDED RANDOM SUBSET of ≤maxParts partitions
    // (PartitionPruningRDD — unselected partitions are never scheduled,
    // capping plan-time IO) and reservoir within those; a random subset
    // keeps cross-range coverage on sorted/clustered layouts, unlike a
    // prefix of partitions which would reinstate the head bias one level
    // up.
    // Trade-off stated plainly: with a uniform subset, a value confined to
    // k of P partitions is missed with probability ~(1-maxParts/P)^k — a
    // hitter SPREAD across partitions (the common hot-key layout) is
    // essentially always seen, one hidden in a single fat partition may
    // not be. Raising maxParts buys certainty with plan-time IO.
    val sampled =
      if (allParts <= maxParts) rdd
      else {
        val keep = new scala.util.Random(seed)
          .shuffle((0 until allParts).toVector).take(maxParts).toSet
        org.apache.spark.rdd.PartitionPruningRDD.create(rdd, keep.contains)
      }
    val nParts = math.max(sampled.getNumPartitions, 1)
    // each task surrenders at most perPart rows, so the collect stays
    // bounded however large the input is; 2× headroom covers empty/short
    // partitions
    val perPart = math.max(1, (2L * n / nParts).toInt + 1)
    val parts = sampled
      .mapPartitionsWithIndex { (i, it) =>
        val rows =
          if (head) it.take(perPart).toArray // prefix take: cheap, biased
          else {
            // Algorithm R: uniform without replacement, one pass, O(perPart)
            // memory; seeded per partition so the sample is reproducible
            val rnd = new java.util.Random(seed * 1000003L + i)
            val res = new Array[org.apache.spark.sql.Row](perPart)
            var filled = 0
            var m = 0L
            while (it.hasNext) {
              val row = it.next()
              if (filled < perPart) { res(filled) = row; filled += 1 }
              else {
                val j = (rnd.nextDouble() * (m + 1)).toLong
                if (j < perPart) res(j.toInt) = row
              }
              m += 1
            }
            java.util.Arrays.copyOf(res, filled)
          }
        Iterator.single(i -> rows)
      }
      .collect().sortBy(_._1).map(_._2)
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    var depth = 0
    while (buf.length < n && depth < perPart) {
      parts.foreach { p =>
        if (depth < p.length && buf.length < n) buf += p(depth)
      }
      depth += 1
    }
    buf.toArray
  }

  def sample(spark: SparkSession, leaf: LogicalPlan,
             attrs: Seq[AttributeReference], sampleSize: Int,
             seed: Long = 42L, mode: String = "reservoir"): LeafSample = {
    val maxParts = spark.conf
      .get("spark.graft.uct.samplePartitions", "64").toInt
    val key = (leaf.canonicalized, seed, mode, maxParts)
    val wanted: Seq[Attribute] =
      if (attrs.nonEmpty) attrs else leaf.output.take(1)
    val wantedPos = wanted.map(a => leaf.output.indexWhere(_.exprId == a.exprId))
    require(wantedPos.forall(_ >= 0),
      s"sample attrs must come from the leaf's output: $wanted vs ${leaf.output}")
    // the exprId-keyed view canonically-equal callers see over one shared
    // positional entry
    def view(ps: PosSample): LeafSample = LeafSample(ps.nRows,
      wanted.zip(wantedPos).map { case (a, p) => attrKey(a) -> ps.cols(p) }.toMap,
      wanted.zip(wantedPos).map { case (a, p) => attrKey(a) -> ps.index(p) }.toMap)

    val fast = cache.get(key)
    if (fast != null && wantedPos.forall(fast.cols.contains)) {
      hitCountA.incrementAndGet()
      return view(fast)
    }

    stripeFor(key).synchronized {
      // re-check under the stripe: a concurrent equal-key caller may have
      // scanned while we waited, and merging against the entry PRESENT NOW
      // is what makes the get-then-put atomic
      val cached = cache.get(key)
      if (cached != null && wantedPos.forall(cached.cols.contains)) {
        hitCountA.incrementAndGet()
        return view(cached)
      }

      // merge, don't replace: re-sample the UNION of cached and requested
      // positions with the same seed (the reservoir is deterministic per
      // (seed, partition), so re-sampled values equal the cached ones and the
      // rows stay aligned across columns), then serve every earlier caller's
      // columns AND the new ones from one entry. For NARROW leaves (the join
      // subplans this store exists for — column pruning has already run)
      // widen the first scan to every FIXED-WIDTH output column up front:
      // one widened entry turns every staggered later request (a role asking
      // for a different join-attr subset, the WCOJ skew probe after the UCT
      // sampler) into a pure hit — the r9 bench regressions (q82–q86, q165,
      // q55) were exactly such staggered column sets re-running the scan per
      // request. Variable-width columns (text, embeddings, binary) are only
      // projected when actually REQUESTED: parquet decode cost IS
      // proportional to projection width for those, and an unrequested blob
      // column would otherwise ride the driver-side collect and sit in the
      // LRU at sampleSize values per entry.
      val cheapPos: Set[Int] =
        if (leaf.output.size > fullProjectionMaxCols) Set.empty
        else leaf.output.indices.filter { p =>
          leaf.output(p).dataType match {
            case _: org.apache.spark.sql.types.NumericType => true
            case org.apache.spark.sql.types.DateType |
                 org.apache.spark.sql.types.TimestampType |
                 org.apache.spark.sql.types.TimestampNTZType |
                 org.apache.spark.sql.types.BooleanType => true
            case _ => false
          }
        }.toSet
      val allPos =
        (cheapPos ++ Option(cached).map(_.cols.keySet).getOrElse(Set.empty[Int]) ++
          wantedPos.toSet).toSeq.sorted
      val projAttrs = allPos.map(p => leaf.output(p).toAttribute)
      val proj = GraftShims
        .ofRows(spark, org.apache.spark.sql.catalyst.plans.logical.Project(projAttrs, leaf))
      val t0 = System.nanoTime()
      val rows =
        interleavedSample(proj.rdd, sampleSize, seed, mode == "head", maxParts)
      scanCountA.incrementAndGet()
      scanNanosA.addAndGet(System.nanoTime() - t0)
      val cols = allPos.zipWithIndex.map { case (p, i) =>
        p -> rows.map(r => canon(r.get(i)))
      }.toMap
      val index = cols.map { case (k, vs) =>
        val m = new java.util.HashMap[Any, Array[Int]]()
        val grouped = vs.zipWithIndex.filter(_._1 != null).groupBy(_._1)
        grouped.foreach { case (v, ps) => m.put(v, ps.map(_._2).sorted) }
        k -> m
      }
      val s = PosSample(rows.length, cols, index)
      cache.put(key, s)
      view(s)
    }
  }

  /** Leaves at or under this output arity get their FIXED-WIDTH columns
    * widened into the first scan (see the merge comment above); wider leaves
    * keep the purely incremental union-merge so a fat projection never drags
    * unrequested columns through the sample collect. */
  private val fullProjectionMaxCols = 12

  def attrKey(a: Attribute): String = a.exprId.id.toString

  def size: Int = cache.size()

  def clear(): Unit = cache.clear()
}
