package graft.queries

import graft.Db
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data text pipeline: dedup (exact / n-gram Jaccard / MinHash-LSH /
  * SimHash), fingerprinting, token statistics, quality scoring, language ID.
  * Beyond-parity vs the reference (no string function surface at all —
  * /root/reference/src/expressions/compilation/ExpressionCompiler.java:918-958).
  *
  * Everything is partition-parallel: per-row array lambdas (no UDFs — Catalyst
  * higher-order functions), explode + shuffle-on-shingle for pair generation,
  * so the same plan scales to a multi-executor cluster. Hash-dependent
  * candidate generation (MinHash/SimHash) is deterministic but engine-specific
  * (xxhash64), hence rows-only checks for those two.
  */
object TextOps {

  /** words of a document */
  private def words: Column = split(col("text"), " ")

  private val shinglesSql =
    """list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |           || ' ' || string_split(text,' ')[i+2]))""".stripMargin

  /** Distinct word-3-gram shingle hashes, one row per (doc_id, shingle).
    *
    * Built with posexplode + windowed lead instead of array lambdas: each
    * document is tokenized exactly once and every shingle constructed once.
    * (An array-transform formulation had its shingle expression substituted
    * into the Generate's pushed-down size/not-null filters, re-running full
    * tokenization 3× per row at the scan.) Shuffles once on doc_id — the
    * same plan shape at any scale.
    */
  private def shingleRows(d: Db): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wnd = Window.partitionBy("doc_id").orderBy("pos")
    d.documents
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .select(col("doc_id"),
        concat_ws(" ", col("word"), lead("word", 1).over(wnd), lead("word", 2).over(wnd))
          .as("sgram"),
        lead("word", 2).over(wnd).as("w2"))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), xxhash64(col("sgram")).as("s"))
      .distinct()
  }

  /** per-doc shingle-hash sets: (doc_id, h0: array<long>, nsh) */
  private def docShingleSets(d: Db): DataFrame =
    shingleRows(d).groupBy("doc_id")
      .agg(collect_list(col("s")).as("h0"), count(lit(1)).as("nsh"))

  /** exact word-3-gram Jaccard pairs via explode + shingle-key shuffle join —
    * the scalable formulation (no quadratic doc×doc comparison).
    */
  private def jaccardPairs(d: Db, threshold: Double): DataFrame = {
    // joins on the 64-bit shingle hash, not the shingle string: far cheaper
    // shuffle keys/comparisons; xxhash64 collisions (~1e-10 at this scale)
    // are the accepted tradeoff of every hashed-shingle dedup pipeline
    // persisted: the a/b sides of the self-join would otherwise recompute
    // the windowed shingle pipeline (doc-count-sized, cheap to hold)
    val ds = shingleRows(d).withColumn("nsh",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .persist()
    val a = ds.select(col("doc_id").as("a_id"), col("nsh").as("na"), col("s"))
    val b = ds.select(col("doc_id").as("b_id"), col("nsh").as("nb"), col("s"))
    a.join(b, Seq("s")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("common"), max("na").as("na"), max("nb").as("nb"))
      .withColumn("jaccard", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
  }

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "es" -> Seq("el", "la", "de", "los", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"))

  private def stopCount(lang: String): Column =
    size(filter(words, w => w.isin(stopwords(lang): _*)))

  private def stopCountSql(lang: String): String = {
    val set = stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(text,' '), w -> w IN ($set)))"
  }

  val all: Seq[Q] = Seq(
    // --- q50: exact dedup — canonical-row election per identical text
    Q("q50_dedup_exact", Some("""
      SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents
      GROUP BY text ORDER BY keep_id"""),
      (s, dir) => Db(s, dir).documents
        .groupBy("text")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies").orderBy("keep_id")),

    // --- q51: content fingerprints (md5 / sha256)
    Q("q51_fingerprint_hash", Some("""
      SELECT doc_id, md5(text) AS fp_md5, sha256(text) AS fp_sha256
      FROM documents ORDER BY doc_id"""),
      (s, dir) => Db(s, dir).documents
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("fp_md5"),
          sha2(col("text").cast("binary"), 256).as("fp_sha256"))
        .orderBy("doc_id")),

    // --- q52: token counting (whitespace + regex word tokenizer)
    Q("q52_token_count", Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_unique,
        CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS n_words_re,
        CAST(length(text) AS INT) AS len_chars
      FROM documents ORDER BY doc_id"""),
      (s, dir) => Db(s, dir).documents
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"),
          size(array_distinct(split(col("text"), " "))).as("n_unique"),
          size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("n_words_re"),
          length(col("text")).as("len_chars"))
        .orderBy("doc_id")),

    // --- q53: quality scoring (length / stopword / uniqueness ratios)
    Q("q53_text_quality", Some(s"""
      SELECT doc_id,
        CAST(length(text) AS INT) AS len_chars,
        CAST(len(string_split(text,' ')) AS INT) AS n_words,
        round(length(text) / len(string_split(text,' ')), 4) AS avg_word_len,
        round(${stopCountSql("en")} / len(string_split(text,' ')), 4) AS stop_ratio,
        round(len(list_distinct(string_split(text,' '))) / len(string_split(text,' ')), 4) AS uniq_ratio,
        round(least(1.0, len(string_split(text,' ')) / 100.0)
              * (len(list_distinct(string_split(text,' '))) / len(string_split(text,' '))), 4) AS quality
      FROM documents ORDER BY doc_id"""),
      (s, dir) => {
        val nw = size(words)
        val uniqRatio = size(array_distinct(words)) / nw
        Db(s, dir).documents.select(col("doc_id"),
          length(col("text")).as("len_chars"),
          nw.as("n_words"),
          round(length(col("text")) / nw, 4).as("avg_word_len"),
          round(stopCount("en") / nw, 4).as("stop_ratio"),
          round(uniqRatio, 4).as("uniq_ratio"),
          round(least(lit(1.0), nw / lit(100.0)) * uniqRatio, 4).as("quality"))
          .orderBy("doc_id")
      }),

    // --- q54: language ID via stopword-hit heuristic (identical CASE both engines)
    Q("q54_lang_id", Some(s"""
      SELECT doc_id, lang,
        CASE WHEN ${stopCountSql("de")} > ${stopCountSql("en")}
                  AND ${stopCountSql("de")} >= ${stopCountSql("es")}
                  AND ${stopCountSql("de")} >= ${stopCountSql("fr")} THEN 'de'
             WHEN ${stopCountSql("es")} > ${stopCountSql("en")}
                  AND ${stopCountSql("es")} >= ${stopCountSql("fr")} THEN 'es'
             WHEN ${stopCountSql("fr")} > ${stopCountSql("en")} THEN 'fr'
             ELSE 'en' END AS pred_lang
      FROM documents ORDER BY doc_id"""),
      (s, dir) => {
        val (en, de, es, fr) =
          (stopCount("en"), stopCount("de"), stopCount("es"), stopCount("fr"))
        Db(s, dir).documents.select(col("doc_id"), col("lang"),
          when(de > en && de >= es && de >= fr, "de")
            .when(es > en && es >= fr, "es")
            .when(fr > en, "fr")
            .otherwise("en").as("pred_lang"))
          .orderBy("doc_id")
      }),

    // --- q55: n-gram Jaccard near-dup pairs (exact, shuffle-on-shingle)
    Q("q55_ngram_jaccard_dedup", Some(s"""
      WITH t AS (
        SELECT doc_id, $shinglesSql AS sh
        FROM documents WHERE len(string_split(text,' ')) >= 3),
      e AS (SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM t)
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        round(count(*) / (max(a.n) + max(b.n) - count(*)), 4) AS jaccard
      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) / (max(a.n) + max(b.n) - count(*)) >= 0.3
      ORDER BY a_id, b_id"""),
      (s, dir) => jaccardPairs(Db(s, dir), 0.3)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("a_id", "b_id")),

    // --- q56: MinHash + LSH near-dup (64 hashes, 16 bands × 4 rows) with
    //     exact-Jaccard verification of candidates. Hash-specific → rows-only;
    //     recall vs q55 is asserted in MinHashLshSpec.
    Q("q56_minhash_lsh_dedup", None,
      (s, dir) => minhashLshPairs(Db(s, dir), 0.3)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("a_id", "b_id")),

    // --- q57: SimHash near-dup (64-bit, hamming ≤ 12). Rows-only (hash-specific).
    Q("q57_simhash_dedup", None,
      (s, dir) => simhashPairs(Db(s, dir), 12)
        .orderBy("a_id", "b_id")),

    // --- q58: rolling polynomial fingerprint (same left-fold both engines)
    Q("q58_rolling_fingerprint", Some("""
      SELECT doc_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(1, length(text) + 1), i -> CAST(unicode(text[i]) AS BIGINT))),
          (a, b) -> (a * 31 + b) % 1000000007) AS fp
      FROM documents ORDER BY doc_id"""),
      (s, dir) => Db(s, dir).documents
        .select(col("doc_id"),
          aggregate(transform(split(col("text"), ""), c => ascii(c).cast("long")),
            lit(0L), (a, c) => (a * 31 + c) % 1000000007L).as("fp"))
        .orderBy("doc_id"))
  )

  /** MinHash(64) → 16 bands of 4 → bucket self-join → exact-Jaccard verify.
    *
    * Formulated as explode → partial-aggregate (min per (doc, perm) combines
    * map-side) → band hash → shuffle keyed on (band, bandHash): every stage is
    * partition-parallel with no quadratic step, the cluster-scale LSH plan.
    * (A first attempt computed the 64-slot signature as one nested
    * higher-order-function expression; Catalyst's projection collapse inlined
    * the shingle subexpression into all 64 lambdas — 50× slower. Keep the
    * per-row array work shallow and let aggregation do the heavy lifting.)
    */
  def minhashLshPairs(d: Db, threshold: Double): DataFrame = {
    // per-doc hashed shingle sets (grouping is itself the shuffle barrier
    // that keeps h0 a materialized attribute for the codegen sketch);
    // persisted — bands (×2 sides of the bucket self-join) and both
    // verification joins would otherwise recompute the whole pipeline
    val hashed = docShingleSets(d).persist()
    // 16 bands × 4 permutation-minima in one codegen pass per row
    // (graft.functions.MinHashBands)
    val bandHashes = org.apache.spark.sql.GraftShims.column(
      graft.functions.MinHashBands(
        org.apache.spark.sql.GraftShims.expression(col("h0")), 16, 4))
    val bands = hashed
      .select(col("doc_id"), posexplode(bandHashes).as(Seq("band", "bh")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    // exact-Jaccard verification over the hashed shingle sets (long compares,
    // not string compares — same hashed-set semantics as jaccardPairs)
    val sets = hashed.select(col("doc_id"), array_distinct(col("h0")).as("hset"))
    cand
      .join(sets.select(col("doc_id").as("a_id"), col("hset").as("sa")), Seq("a_id"))
      .join(sets.select(col("doc_id").as("b_id"), col("hset").as("sb")), Seq("b_id"))
      .withColumn("jaccard",
        size(array_intersect(col("sa"), col("sb")))
          / size(array_union(col("sa"), col("sb"))))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** 64-bit SimHash over distinct words; near-dup = hamming distance ≤ k.
    * Words are hashed once behind a shuffle barrier; the 64 bit-sums then
    * only shift/mask cached longs (not re-hash strings 64×).
    */
  def simhashPairs(d: Db, maxHamming: Int): DataFrame = {
    val hashed = d.documents
      .select(col("doc_id"),
        transform(array_distinct(split(col("text"), " ")), w => xxhash64(w)).as("hs"))
      .repartition(col("doc_id"))
    val simhash = org.apache.spark.sql.GraftShims.column(
      graft.functions.SimHash64(
        org.apache.spark.sql.GraftShims.expression(col("hs"))))
    val sigs = hashed.select(col("doc_id"), simhash.as("sim"))
    sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("hamming", bit_count(col("x.sim").bitwiseXOR(col("y.sim"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"), col("hamming"))
  }
}
