package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog: approximate-distinct as a FIRST-CLASS, mergeable
  * register table rather than an opaque binary sketch. Spark's own
  * `approx_count_distinct` (and the reference's HLL analog) hide the
  * sketch inside an engine-specific aggregation buffer; here the sketch
  * IS a DataFrame — (group..., bucket, register) — so it can be
  * persisted beside the data, unioned across shards/days, merged by a
  * plain max-aggregation, and differentially verified BIT-FOR-BIT by an
  * independent engine (the q185 oracle replays every register in DuckDB
  * from the same md5-derived hash; q73's built-in sketches can only be
  * checked against error bounds).
  *
  * Hash layout: the portable 60-bit md5 hash ([[TextDedup.portableHash60]]
  * on the value's string form) splits into log2(m) low bucket bits and
  * K = 60 - log2(m) rank bits; register = K + 1 - floor(log2(w)) - 1 for
  * the rank word w (K + 1 when w = 0) — computed as string-length-of-
  * binary, exact integer arithmetic both engines share.
  *
  * 100 TB shape: one map-side pass hashes values, one hash aggregation
  * with map-side partial max produces at most m rows per group whatever
  * the input cardinality — the canonical "sketch then merge" pattern for
  * counting distincts across a 1000-executor scan. Merging day-level
  * sketches into month-level is [[merge]]: max per (group, bucket) —
  * associative, commutative, re-shardable.
  */
object Hll {

  private def bitsOf(m: Int): Int = {
    require(m >= 16 && (m & (m - 1)) == 0 && m <= 4096,
      s"m must be a power of two in [16, 4096], got $m")
    java.lang.Integer.numberOfTrailingZeros(m)
  }

  /** Per-(group, bucket) max rank over `value`'s distinct hash stream.
    * Buckets no value hashed into are absent (implicit register 0).
    * Output: groupCols ++ (bucket: long, register: long). */
  def registers(df: DataFrame, groupCols: Seq[String], value: Column,
                m: Int = 64): DataFrame = {
    val mBits = bitsOf(m)
    val kBits = 60 - mBits
    val h = TextDedup.portableHash60(value.cast("string"))
    val w = shiftright(h, mBits)
    val rank = when(w === 0, lit(kBits + 1))
      .otherwise(lit(kBits + 1) - length(bin(w))).cast("long")
    df.select(groupCols.map(col) :+ (h % m).as("bucket") :+ rank.as("__r"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("__r")).as("register"))
  }

  /** Merge sketches (a union of [[registers]] outputs over the same m):
    * max per (group, bucket). Sharded scans, daily partitions, or
    * different engines' sketches combine losslessly. */
  def merge(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("register")).as("register"))

  /** Cardinality estimate per group from a register table. The harmonic
    * sum is EXACT integer (Σ 2^(K - register), absent buckets contribute
    * 2^K); only the final alpha·m²·2^K / sum division is floating point.
    * No small-range correction — callers counting n ≲ m per group should
    * count exactly instead.
    *
    * Register = K + 1 (rank word 0 — probability 2^-K ≈ 2^-54 per value)
    * would make the exponent −1; it is CLAMPED to 0 (term 2^0 instead of
    * the mathematical 2^-1) so the integer sum stays well-defined — an
    * unclamped negative shiftleft is garbage in Spark and an error in
    * DuckDB. The q270 oracle applies the same greatest(0, ·) clamp, so
    * the engines agree bit-for-bit even when the 2^-54 case is hit.
    * (The clamp makes a register of K+1 — rank word 0, probability
    * ~2^-54 — contribute 2^0 instead of the textbook 2^-1, doubling
    * that one term rather than truncating it; the exact alternative is
    * scaling every sum by 2^(K+1) so the half-unit is an integer.
    * Deliberately not taken: the deviation is one part in 2^54 of one
    * register's term, and the doubled-width integers would push the
    * DECIMAL sums past what both engines fold identically.) */
  def estimate(regs: DataFrame, groupCols: Seq[String],
               m: Int = 64): DataFrame = {
    val mBits = bitsOf(m)
    val kBits = 60 - mBits
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    regs.groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
            s"CAST(greatest(0, $kBits - register) AS INT))"))
          .as("__present"),
        count(lit(1)).as("__nb"))
      .withColumn("sum_scaled",
        col("__present") + (lit(m.toLong) - col("__nb")) * lit(1L << kBits))
      .withColumn("estimate",
        lit(alpha * m * m) * lit(math.pow(2.0, kBits)) / col("sum_scaled"))
      .select(groupCols.map(col) :+ col("sum_scaled") :+ col("estimate"): _*)
  }
}
