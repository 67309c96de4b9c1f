package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General-purpose text deduplication operators over ANY DataFrame with an
  * id column and a text column — the library surface behind the
  * `documents`-table queries in graft.queries.TextOps.
  *
  * Design for scale (the 100 TB posture): pair generation never enumerates
  * doc×doc; candidates come from shuffle keys (shingle hash / LSH band
  * bucket), per-row sketching is single-pass codegen
  * (graft.functions.{MinHashBands, SimHash64}), and documents are tokenized
  * exactly once via posexplode + windowed lead.
  */
object TextDedup {

  /** Distinct word-3-gram shingle hashes: one (id, s) row per shingle. */
  def shingleRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wnd = Window.partitionBy(idCol).orderBy("pos")
    df.select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .select(col(idCol),
        concat_ws(" ", col("word"), lead("word", 1).over(wnd), lead("word", 2).over(wnd))
          .as("sgram"),
        lead("word", 2).over(wnd).as("w2"))
      .filter(col("w2").isNotNull)
      .select(col(idCol), xxhash64(col("sgram")).as("s"))
      .distinct()
  }

  /** Per-doc hashed shingle sets: (id, h0: array<long>, nsh). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    shingleRows(df, idCol, textCol).groupBy(idCol)
      .agg(collect_list(col("s")).as("h0"), count(lit(1)).as("nsh"))

  /** Exact dedup: one canonical row (min id) per identical text value. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(textCol)
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Exact n-gram Jaccard near-dup pairs at or above `threshold`, via a
    * shuffle join keyed on the 64-bit shingle hash. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame = {
    val ds = shingleRows(df, idCol, textCol)
      .withColumn("nsh", count(lit(1)).over(Window.partitionBy(idCol)))
      .persist()
    val a = ds.select(col(idCol).as("a_id"), col("nsh").as("na"), col("s"))
    val b = ds.select(col(idCol).as("b_id"), col("nsh").as("nb"), col("s"))
    a.join(b, Seq("s")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("common"), max("na").as("na"), max("nb").as("nb"))
      .withColumn("jaccard", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** MinHash(bands×rows) + LSH bucket join + exact-Jaccard verification. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, nBands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val hashed = shingleSets(df, idCol, textCol).persist()
    val bandHashes = org.apache.spark.sql.GraftShims.column(
      graft.functions.MinHashBands(
        org.apache.spark.sql.GraftShims.expression(col("h0")), nBands, rowsPerBand))
    val bands = hashed
      .select(col(idCol), posexplode(bandHashes).as(Seq("band", "bh")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
          && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"))
      .distinct()
    val sets = hashed.select(col(idCol), array_distinct(col("h0")).as("hset"))
    cand
      .join(sets.select(col(idCol).as("a_id"), col("hset").as("sa")), Seq("a_id"))
      .join(sets.select(col(idCol).as("b_id"), col("hset").as("sb")), Seq("b_id"))
      .withColumn("jaccard",
        size(array_intersect(col("sa"), col("sb")))
          / size(array_union(col("sa"), col("sb"))))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val hashed = df
      .select(col(idCol),
        transform(array_distinct(split(col(textCol), " ")), w => xxhash64(w)).as("hs"))
      .repartition(col(idCol))
    val simhash = org.apache.spark.sql.GraftShims.column(
      graft.functions.SimHash64(
        org.apache.spark.sql.GraftShims.expression(col("hs"))))
    val sigs = hashed.select(col(idCol), simhash.as("sim"))
    sigs.as("x").join(sigs.as("y"), col(s"x.$idCol") < col(s"y.$idCol"))
      .withColumn("hamming", bit_count(col("x.sim").bitwiseXOR(col("y.sim"))))
      .filter(col("hamming") <= maxHamming)
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"), col("hamming"))
  }
}
