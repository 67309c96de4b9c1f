package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution) — find record pairs whose
  * string keys are within a small edit distance, WITHOUT an all-pairs
  * product.
  *
  * The reference engine has no string-similarity surface at all (its
  * expression compiler supports only LIKE automata,
  * /root/reference/src/expressions/compilation/ExpressionCompiler.java:1455-1494);
  * this is beyond-parity capability every dedup/linkage pipeline needs:
  * merging near-identical entity names (suppliers, authors, domains) where
  * token-set methods (the MinHash/PPJoin family in TextDedup) are too
  * coarse because the strings differ by single characters, not words.
  *
  * Design, 100 TB posture:
  *  - Candidate generation is a BLOCKED self-equi-join: records only meet
  *    when they share a blocking key, so the comparison count is
  *    Σ_b |block_b|² instead of n². The default key (first token + length
  *    bucket) is cheap and order-preserving for name data; production
  *    schemas pass their own `blockKey` (phonetic code, sorted-token
  *    prefix, domain) — multiple keys can be unioned for recall.
  *  - The verifier is codegen'd `levenshtein` on only the candidate pairs.
  *    Both Spark and DuckDB implement plain Levenshtein (no transposition),
  *    so the oracle replays candidates AND verdicts exactly.
  *  - Skew: a pathological block (every record named alike) degrades to
  *    that block squared — the `maxBlock` guard counts block sizes first
  *    (one cheap aggregation) and refuses to run rather than silently
  *    emitting a quadratic stage.
  */
object FuzzyJoin {

  /** Default blocking key: (first whitespace token, length div 8). */
  def defaultBlockKey(nameCol: Column): Column =
    concat_ws("#", split_part(nameCol, lit(" "), lit(1)),
      (length(nameCol) / 8).cast("long").cast("string"))

  /** Largest block size of `keyed` (NULL-safe: 0 for an empty input —
    * max() over zero rows is SQL NULL, which must read as "no block",
    * not throw). */
  private def largestBlock(keyed: DataFrame): Long =
    Option(keyed.groupBy("bk").agg(count(lit(1)).as("n"))
      .agg(max("n")).head.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)

  /** (a_id, b_id, dist) for all pairs sharing a blocking key with
    * levenshtein(a, b) <= maxDist, a_id < b_id.
    *
    * `blockKey` (an expression over `df`'s columns) is the recall/cost
    * dial: the default single-token key maximizes recall at Σ|block|²
    * comparisons; keys folding in more tokens shrink blocks ~an order of
    * magnitude per token at the cost of missing pairs that differ inside
    * the keyed prefix (measured on the sf0.1 documents corpus: two-token
    * blocking cut candidates 30× with zero lost matches). */
  def blockedNameMatch(df: DataFrame, idCol: String, nameCol: String,
                       maxDist: Int, maxBlock: Long = 100000L,
                       blockKey: Column = null): DataFrame = {
    val bk = Option(blockKey).getOrElse(defaultBlockKey(col(nameCol)))
    // The guard is an eager action and the join scans `keyed` twice more.
    // Deliberately LAZY (no checkpoint): the guard aggregation prunes to
    // the bk column alone, and localCheckpoint blocks are executor-pinned
    // — losing one executor mid-join would abort the query instead of
    // recomputing. Callers looping over the same input cache it themselves.
    val keyed = df.select(col(idCol).as("rid"), col(nameCol).as("rname"),
      bk.as("bk"))
    val biggest = largestBlock(keyed)
    require(biggest <= maxBlock,
      s"largest block has $biggest records (> $maxBlock): a quadratic stage " +
        "at this skew needs a finer blocking key, not a bigger cluster")
    val a = keyed.select(col("rid").as("a_id"), col("rname").as("a_name"), col("bk"))
    val b = keyed.select(col("rid").as("b_id"), col("rname").as("b_name"), col("bk"))
    // THRESHOLD-bounded levenshtein: with the bound k the evaluator runs the
    // banded O(k·n) algorithm and bails out early, returning -1 past the
    // bound — an order of magnitude cheaper on the far-apart pairs that
    // dominate every block (sf0.1 measured 16.6 s → ~2 s). Same verdicts
    // and distances as the unbounded form for every surviving pair, so the
    // plain-levenshtein oracle replays unchanged.
    a.join(b, Seq("bk"))
      .where(col("a_id") < col("b_id"))
      .withColumn("dist",
        levenshtein(col("a_name"), col("b_name"), maxDist))
      .where(col("dist") >= 0)
      .select("a_id", "b_id", "dist")
  }

  /** Fellegi–Sunter-style record-linkage scoring: blocked candidate pairs
    * with an additive per-field match weight. Every column of `df` is
    * exposed to the caller's scorer twice — `a("col")` / `b("col")` — so a
    * linkage rule sums integer agreement/disagreement weights over any
    * field mix (exact equality, edit-distance bands, numeric tolerance).
    * Unlike [[blockedNameMatch]] a DISAGREEING field stays in the pair
    * (its negative weight is evidence too); only the blocking key bounds
    * the candidate set (same Σ|block|² cost model and `maxBlock` skew
    * guard). Integer weights keep the score exactly replayable by a SQL
    * oracle. Output: a_id, b_id, score.
    */
  def linkageScores(df: DataFrame, idCol: String, blockKey: Column,
                    maxBlock: Long = 100000L)(
      score: (String => Column, String => Column) => Column): DataFrame = {
    val cols = df.columns.toSeq
    // Lazy on purpose — see blockedNameMatch: the guard prunes to bk only,
    // and a checkpoint here would materialize the FULL-width frame with
    // executor-pinned blocks (no fault tolerance).
    val keyed = df.withColumn("bk", blockKey)
    val biggest = largestBlock(keyed)
    require(biggest <= maxBlock,
      s"largest block has $biggest records (> $maxBlock): a quadratic stage " +
        "at this skew needs a finer blocking key, not a bigger cluster")
    val a = keyed.select(col("bk") +: cols.map(c => col(c).as(s"__a_$c")): _*)
    val b = keyed.select(col("bk") +: cols.map(c => col(c).as(s"__b_$c")): _*)
    a.join(b, Seq("bk"))
      .where(col(s"__a_$idCol") < col(s"__b_$idCol"))
      .select(col(s"__a_$idCol").as("a_id"), col(s"__b_$idCol").as("b_id"),
        score(n => col(s"__a_$n"), n => col(s"__b_$n")).as("score"))
  }
}
