package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed interval-containment (range) join: probe points (key, t)
  * matched to intervals (key, start, end) with start <= t <= end. The
  * other temporal-join shape Spark lacks a native operator for — the
  * naive formulation (`ON key AND t BETWEEN start AND end`) plans as a
  * per-key nested loop (or BroadcastNestedLoop without the equi-key),
  * enumerating |intervals| x |probes| candidates per key.
  *
  * Scale path: quantize time into `bucketMicros`-wide grid cells. Each
  * interval is exploded to the cells it touches (ceil(len/bucket)+1 rows
  * — bounded by `maxCellsPerInterval`, the guard against a runaway
  * interval x fine grid), each probe lands in exactly ONE cell, and the
  * candidate join is a plain hash equi-join on (key, cell) refined by the
  * exact containment predicate. A probe's cell is unique, so no
  * dedup pass is needed — pairs emerge exactly once. Choosing
  * bucketMicros ~ the typical interval length keeps the blow-up factor
  * ~2x rows on the interval side and the per-cell fan-in proportional to
  * true selectivity, not key cardinality.
  *
  * 100 TB shape: one map-side explode + one hash shuffle on (key, cell)
  * with whole-stage-codegen'd refinement — the standard distributed
  * range-join grid (DuckDB's IEJoin and Spark's own range-join hints
  * solve the same problem; the grid is the partition-friendly variant).
  */
object IntervalJoin {

  /** Inner containment pairs: every (interval row ++ probe row) with equal
    * `keys` and probeTs in [startCol, endCol]. Column names must not
    * collide across the two inputs (beyond `keys`). */
  def containmentJoin(intervals: DataFrame, probes: DataFrame,
                      keys: Seq[String], startCol: String, endCol: String,
                      probeTs: String, bucketMicros: Long,
                      maxCellsPerInterval: Int = 1024): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val collisions = intervals.columns.toSet
      .intersect(probes.columns.toSet) -- keys
    require(collisions.isEmpty,
      s"interval/probe columns collide: $collisions — alias them")
    // cast handles TIMESTAMP_NTZ inputs (unix_micros only takes TIMESTAMP);
    // a session-timezone offset shifts every cell uniformly, and the exact
    // containment refinement below makes the grid's absolute origin moot
    def cellOf(t: Column): Column =
      floor(unix_micros(t.cast("timestamp")) / lit(bucketMicros))
    val i = intervals
      .withColumn("__c0", cellOf(col(startCol)))
      .withColumn("__cn", cellOf(col(endCol)))
    // guard: an interval spanning more grid cells than the cap means the
    // bucket is mis-sized for the data — refuse loudly instead of
    // exploding quadratically (same posture as FuzzyJoin's block guard)
    val worst = i.agg(max(col("__cn") - col("__c0"))).head()
    val span = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    require(span + 1 <= maxCellsPerInterval,
      s"an interval spans ${span + 1} grid cells (cap $maxCellsPerInterval)" +
        " — raise bucketMicros to ~the typical interval length")
    val exploded = i
      .withColumn("__cell", explode(sequence(col("__c0"), col("__cn"))))
      .drop("__c0", "__cn")
    val p = probes.withColumn("__cell", cellOf(col(probeTs)))
    exploded.join(p, keys :+ "__cell")
      .where(col(probeTs) >= col(startCol) && col(probeTs) <= col(endCol))
      .drop("__cell")
  }
}
