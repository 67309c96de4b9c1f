package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global exact ranking WITHOUT a single-reducer sort — the two-phase
  * (TeraSort-style) rank: range-partition on the order key, count rows
  * per partition, broadcast the prefix offsets, rank locally and add the
  * offset. Every reducer sorts only its own range slice, so the ranked
  * axis can be 10⁸–10⁹ rows (users, items) where a global
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
  * The range-partitioned frame is lazily `localCheckpoint`ed: the offsets
  * job and the rank job MUST see the same sampled range boundaries, and
  * two independent materializations of a range exchange may sample
  * differently — the checkpoint pins one shuffle output for both (the
  * TextDedup.portableGramHashes discipline, here for correctness, not
  * speed). Cost: one range shuffle + one (tiny) per-partition count
  * aggregate + one hash shuffle on the partition id; the per-reducer sort
  * is over |rows|/partitions.
  *
  * Output: all input columns ++ `out` (BIGINT rank, 1-based) and, when
  * `totalOut` is nonempty, the total ranked row count as a column —
  * callers computing quantile tiers ((rank−1)·k div n) get n from the
  * same count aggregate instead of a second full scan of the input.
  */
object Rank {

  def atScale(df: DataFrame, orderCols: Seq[Column], out: String = "r",
              totalOut: String = "", partitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "rank needs at least one order column")
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    // prefix offsets: ≤ `partitions` rows, so the global cumulative window
    // runs over a BOUNDED axis (the plan-hygiene contract for global
    // windows); empty partitions simply have no row and contribute 0
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot", sum(col("__cnt")).over(
        Window.orderBy(lit(1)).rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select("__pid", "__off", "__tot")
    val local = Window.partitionBy("__pid").orderBy(orderCols: _*)
    val ranked = ranged.join(broadcast(offsets), Seq("__pid"))
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
    * third of the table. Here the range partitioner keys on
    * (groupCols ++ orderCols), so a huge group SPANS partitions and
    * every reducer sorts only its slice; each group's slices are
    * contiguous in partition order, so the per-(partition, group) count
    * aggregate has ≤ partitions + groups − 1 rows and its prefix
    * cumulation runs over ≤ partitions rows per group (bounded axes
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
    val ranged = df
      .repartitionByRange(p, (groupCols.map(col) ++ orderCols): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val counts = ranged
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
    val ranked = ranged.join(offsets, joinCond.reduce(_ && _))
      .withColumn(out, row_number().over(local).cast("long") + col("__off"))
    (if (totalOut.nonEmpty) ranked.withColumnRenamed("__tot", totalOut)
     else ranked.drop("__tot"))
      .drop(("__pid" +: "__opid" +: "__off" +:
        groupCols.map(c => s"__g_$c")): _*)
  }
}
