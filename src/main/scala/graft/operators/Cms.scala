package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable count-min sketch: approximate per-item frequencies as a
  * FIRST-CLASS mergeable counter table rather than an opaque binary blob —
  * the third member of the portable-sketch family ([[Hll]] distincts,
  * [[Bloom]] membership, Cms frequencies). The sketch IS a DataFrame of
  * (row, col, c): depth×width bounded however large the scan, persistable
  * beside the data, merged across shards/days by a plain sum, and
  * differentially verifiable COUNTER-FOR-COUNTER by an independent engine
  * (the q190 oracle replays every cell in DuckDB from the same md5-derived
  * hash family).
  *
  * Hash family: the shared portable permutations (TextDedup.permA/permB,
  * themselves md5-derived so SQL regenerates them in-query) over the 60-bit
  * md5 prefix hash reduced mod 2^31−1; col_j = ((a_j·h + b_j) mod p) mod
  * width. All arithmetic stays under 2^61 — exact BIGINT on both engines.
  *
  * 100 TB shape: one map pass hashes values, one hash aggregation with
  * map-side partial counts produces at most depth·width rows — the
  * "sketch then merge" pattern for frequency estimation across a
  * 1000-executor scan. Point estimates ([[estimate]]) take the min over
  * the depth rows: always ≥ the true count, within εN with probability
  * 1−δ for width = e/ε, depth = ln(1/δ).
  */
object Cms {

  private def checkParams(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    require(width >= 16 && width <= (1 << 20),
      s"width must be in [16, 2^20], got $width")
  }

  /** col_j for hash column h (h < 2^31): ((a_j·h + b_j) mod p) mod width. */
  private def colFor(j: Int, h: Column, width: Int): Column =
    ((lit(TextDedup.permA(j)) * h + lit(TextDedup.permB(j)))
      % TextDedup.PortableP) % width

  /** Build the counter table (row: int, col: long, c: long) over one
    * occurrence per input row of `value`. Cells no value hashed into are
    * absent (implicit 0). */
  def counters(df: DataFrame, value: Column, depth: Int, width: Int): DataFrame = {
    checkParams(depth, width)
    val h = TextDedup.portableHash60(value.cast("string")) % TextDedup.PortableP
    val cells = array((0 until depth).map(j =>
      struct(lit(j).as("row"), colFor(j, h, width).as("col"))): _*)
    df.select(explode(cells).as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.col").as("col"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge counter tables over the same (depth, width): sum per cell.
    * Associative and commutative — shard/day sketches combine losslessly. */
  def merge(counters: DataFrame): DataFrame =
    counters.groupBy("row", "col").agg(sum(col("c")).as("c"))

  /** Point-estimate the frequency of each key in `keys` (one column named
    * by `keyCol`): min over the depth rows of the addressed cells. The
    * counter table is at most depth·width rows — broadcast-joined, so the
    * probe adds no shuffle on the keys side. Estimates are upper bounds:
    * est ≥ true count, always. */
  def estimate(keys: DataFrame, keyCol: String, counters: DataFrame,
               depth: Int, width: Int): DataFrame = {
    checkParams(depth, width)
    val h = TextDedup.portableHash60(col(keyCol).cast("string")) % TextDedup.PortableP
    val cells = array((0 until depth).map(j =>
      struct(lit(j).as("row"), colFor(j, h, width).as("col"))): _*)
    keys.select(col(keyCol), explode(cells).as("cell"))
      .select(col(keyCol), col("cell.row").as("row"), col("cell.col").as("col"))
      .join(broadcast(counters), Seq("row", "col"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
