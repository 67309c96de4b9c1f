package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom filter for semi-join pushdown — the canonical 100 TB
  * join-reduction technique: build a bit filter from the (small) dim side
  * in one aggregation, broadcast it as a plain value, and drop non-matching
  * fact rows INSIDE the scan stage, before any shuffle. Spark's own runtime
  * row-group filtering hides the filter in an opaque aggregate buffer;
  * here (as with [[Hll]]) the filter is a first-class value with two
  * interchangeable forms:
  *
  *  - a WORD TABLE `(word_idx, word)` DataFrame — mergeable across shards
  *    by `bit_or` per word, persistable beside the data, and differentially
  *    verifiable bit-for-bit by an independent engine (the q189 oracle
  *    replays every word in DuckDB from the same md5-derived hashes);
  *  - a dense `Array[Long]` (collected from the word table — bounded by
  *    m/32 words, NOT by dim cardinality) embedded as an array literal in a
  *    codegen'd boolean [[mightContain]] column, so the probe is one
  *    constant-array lookup per hash — no join, no shuffle, whole-stage
  *    codegen intact.
  *
  * Hash family (Kirsch–Mitzenmacher double hashing, every step exact BIGINT
  * on both engines): the 60-bit md5 prefix hash h1 ([[TextDedup.portableHash60]])
  * and a second 60-bit hash h2 from md5 hex chars 16..30, reduced mod
  * 2^31−1 and forced odd; bit_i = (h1 + i·h2) mod m for i < k
  * (h1 < 2^60, i·h2 < 2^34 — no BIGINT overflow). Words are 32-bit
  * (word = bit_or(1 << (bit mod 32)) per bit/32 group): shifts stay in
  * [0, 31], so no engine-specific 1<<63 sign/overflow behavior can leak
  * into the compare.
  *
  * False positives are quantified, never hidden: the q189 gate reports
  * n_pass / n_match / n_fp per group, and [[BloomSpec]] asserts ZERO false
  * negatives structurally (every true match passes the filter).
  */
object Bloom {

  private def checkParams(mBits: Int, k: Int): Unit = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0 && mBits <= (1 << 24),
      s"mBits must be a power of two in [64, 2^24], got $mBits")
    require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")
  }

  /** The k portable bit positions for `key`, as an array<long> column.
    * One digest kernel call per row ([[graft.functions.PortableHash60Pair]])
    * — the former md5-hex + substring + conv ×2 formulation, bit-identical
    * (h1 = hex chars 1..15, h2 = chars 16..30 of the same digest). */
  def bits(key: Column, mBits: Int, k: Int): Column = {
    checkParams(mBits, k)
    val hp = org.apache.spark.sql.GraftShims.column(
      graft.functions.PortableHash60Pair(org.apache.spark.sql.GraftShims
        .expression(key.cast("string").cast("binary"))))
    val h1 = hp.getField("h1")
    val h2 = (hp.getField("h2") % TextDedup.PortableP).bitwiseOR(1)
    array((0 until k).map(i => (h1 + lit(i.toLong) * h2) % mBits): _*)
  }

  /** Build the filter as a word TABLE: (word_idx: long, word: long), one
    * row per 32-bit word at least one key hashed into. One map pass + one
    * hash aggregation with map-side partial bit_or — at most m/32 output
    * rows whatever the dim cardinality. Shard filters over the same
    * (mBits, k) merge by `bit_or(word)` per word_idx. */
  def words(df: DataFrame, key: Column, mBits: Int, k: Int): DataFrame =
    df.select(explode(bits(key, mBits, k)).as("bit"))
      .select((col("bit") / 32).cast("long").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))").as("m"))
      .groupBy("word_idx").agg(expr("bit_or(m)").as("word"))

  /** Collect a word table into the dense broadcast form: exactly m/32
    * longs (absent words are 0). The collect is bounded by the FILTER
    * size (≤ 2^24 bits = 512 KiB of longs), not by the dim row count. */
  def dense(wordsDf: DataFrame, mBits: Int): Array[Long] = {
    val out = new Array[Long](mBits / 32)
    wordsDf.select("word_idx", "word").collect().foreach { r =>
      out(r.getLong(0).toInt) = r.getLong(1)
    }
    out
  }

  /** Boolean probe column: true iff all k bit positions for `key` are set
    * in the dense filter. A pure codegen expression over a constant array
    * literal — usable directly in `fact.filter(...)` so the drop happens
    * in the scan stage before any shuffle. May return true for a key not
    * in the build set (false positive, rate ≈ (1 − e^(−kn/m))^k); never
    * false for one that is. */
  private val shiftMasks: Seq[Long] = (0 until 32).map(1L << _)

  def mightContain(key: Column, filter: Array[Long], mBits: Int, k: Int): Column = {
    checkParams(mBits, k)
    require(filter.length == mBits / 32,
      s"filter has ${filter.length} words, expected ${mBits / 32}")
    val words = typedLit(filter.toSeq)
    val masks = typedLit(shiftMasks) // 1 << (bit % 32) as a constant lookup
    forall(bits(key, mBits, k), b =>
      element_at(words, (b / 32).cast("int") + 1)
        .bitwiseAND(element_at(masks, (b % 32).cast("int") + 1)) =!= 0)
  }
}
