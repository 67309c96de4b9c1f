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
}
