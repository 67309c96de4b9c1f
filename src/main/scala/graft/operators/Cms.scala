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

  /** AMS-style equi-join SIZE estimation from two counter tables over the
    * same (depth, width) and hash family: per depth row j,
    * s_j = Σ_col cA·cB (the sketch inner product); the estimate is
    * min_j s_j. Always an over-estimate of the true join cardinality
    * Σ_key fA(key)·fB(key) — colliding keys only ADD cross terms — with
    * the usual CMS ε·N_A·N_B tail. This is the planner/ops primitive for
    * "how big would this join be" WITHOUT running it: both sides reduce to
    * ≤ depth·width counters (persistable beside the data, mergeable across
    * shards), and the product costs a ≤ depth·width-row join however large
    * either input. Products stay exact BIGINT while N_A·N_B < 2^63. */
  def joinSizeRows(cA: DataFrame, cB: DataFrame, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    // left-join the products onto an explicit depth spine: a depth row
    // whose occupied cells never coincide has TRUE inner product 0, and
    // must contribute 0 (the tightest bound) — an inner join would drop
    // it, and with NO coinciding cells anywhere min-over-empty would
    // return NULL instead of the correct estimate 0
    val spine = cA.sparkSession.range(0, depth)
      .select(col("id").cast("int").as("row"))
    val prods = cA.join(cB.select(col("row"), col("col"), col("c").as("__cb")),
        Seq("row", "col"))
      .groupBy("row").agg(sum(col("c") * col("__cb")).as("__s"))
    spine.join(prods, Seq("row"), "left")
      .select(col("row"), coalesce(col("__s"), lit(0L)).as("s"))
  }

  /** The scalar estimate: min over [[joinSizeRows]]'s depth rows. */
  def joinSizeEstimate(cA: DataFrame, cB: DataFrame, depth: Int): DataFrame =
    joinSizeRows(cA, cB, depth).agg(min(col("s")).as("est"))

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
