package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (temporal) join — for every left row, the most recent
  * right row at or before its timestamp, per key. The operator Spark's
  * DataFrame API lacks (pandas `merge_asof`, DuckDB/kdb `ASOF JOIN`,
  * Flink's temporal table join), expressed as the scalable
  * union-then-window formulation rather than an inequality join:
  *
  *   1. tag both sides and UNION them on (keys, ts) — map-only;
  *   2. one hash shuffle on the keys, each partition sorted by
  *      (ts, side) — right rows ahead of left rows at equal ts, so the
  *      join is at-or-before (inclusive);
  *   3. `last(payload) IGNORE NULLS` over the per-key running window
  *      carries the latest right payload forward onto every left row.
  *
  * 100 TB shape: ONE shuffle of left+right on the join keys (vs. the
  * naive `l JOIN r ON key AND r.ts <= l.ts` + argmax, which builds the
  * full O(|matches|) prefix blow-up, or a BroadcastNestedLoop when the
  * planner gives up on the inequality). Windows are per-key, so no
  * single-partition sort; a pathologically hot key concentrates its own
  * rows only — the same exposure as any per-key sessionization, and the
  * standard salt-by-time-range split composes if one key exceeds a
  * partition.
  *
  * Right rows are first deduplicated to one per (keys, ts) — the
  * lexicographically greatest payload wins — so results are deterministic
  * under ties (DuckDB's ASOF resolves equal-timestamp rows arbitrarily;
  * the dedup makes both engines agree). Right columns ride through under
  * their own names and must not collide with left columns.
  */
object AsOfJoin {

  /** Left rows with the latest right payload at ts' <= ts appended
    * (null-filled when no right row precedes). `rightTs` must differ in
    * name from `leftTs` only if the caller aliased it; both are consumed
    * and the right's timestamp is not emitted. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.toSeq
      .filterNot(c => keys.contains(c) || c == rightTs)
    require(payloadCols.nonEmpty, "right side carries no payload columns")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left: $collisions — alias them")
    val leftCols = left.columns.toSeq.filterNot(keys.contains)

    // one right row per (keys, ts): greatest payload wins, deterministically
    val rightDedup = right
      .groupBy((keys :+ rightTs).map(col): _*)
      .agg(max(struct(payloadCols.map(col): _*)).as("__p"))
    val pType = rightDedup.schema("__p").dataType
    val lType = org.apache.spark.sql.types.StructType(
      leftCols.map(c => left.schema(c)))

    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__t"), lit(1).as("__isL"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(pType).as("__p")): _*)
    val r = rightDedup.select(
      keys.map(col) ++ Seq(col(rightTs).as("__t"), lit(0).as("__isL"),
        lit(null).cast(lType).as("__l"), col("__p")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__isL"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__isL") === 1)
    filled.select(
      keys.map(col) ++
        leftCols.map(c => col("__l").getField(c).as(c)) ++
        payloadCols.map(c => col("__p").getField(c).as(c)): _*)
  }
}
