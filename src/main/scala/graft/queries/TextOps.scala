package graft.queries

import graft.Db
import graft.operators.TextDedup
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

  private[queries] val shinglesSql =
    """list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |           || ' ' || string_split(text,' ')[i+2]))""".stripMargin

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
      (s, dir) => TextDedup.exact(Db(s, dir).documents, "doc_id", "text")
        .orderBy("keep_id")),

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
      (s, dir) => TextDedup.jaccardPairs(Db(s, dir).documents, "doc_id", "text", 0.3)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("a_id", "b_id")),

    // --- q56: MinHash + LSH near-dup (64 hashes, 16 bands × 4 rows) with
    //     exact-Jaccard verification of candidates. Hash-specific → rows-only;
    //     recall vs q55 is asserted in MinHashLshSpec.
    Q("q56_minhash_lsh_dedup", None,
      (s, dir) => TextDedup.minhashLshPairs(Db(s, dir).documents, "doc_id", "text", 0.3)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("a_id", "b_id")),

    // --- q57: SimHash near-dup (64-bit, hamming ≤ 3 — the standard 64-bit
    //     near-dup budget, Manku et al. WWW'07; banded candidate generation).
    //     Rows-only (hash-specific).
    Q("q57_simhash_dedup", None,
      (s, dir) => TextDedup.simhashPairs(Db(s, dir).documents, "doc_id", "text", 3)
        .orderBy("a_id", "b_id")),

    // --- q91: duplicate clusters — connected components over the exact
    //     Jaccard near-dup pairs; every doc labeled with the smallest doc_id
    //     reachable through near-dup edges (its canonical representative).
    //     Oracle: recursive-CTE transitive closure over the same pair set.
    Q("q91_dedup_clusters", Some(s"""
      WITH RECURSIVE t AS (
        SELECT doc_id, $shinglesSql AS sh
        FROM documents WHERE len(string_split(text,' ')) >= 3),
      e AS (SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM t),
      p AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) / (max(a.n) + max(b.n) - count(*)) >= 0.3),
      edges AS (SELECT a_id AS src, b_id AS dst FROM p
                UNION SELECT b_id, a_id FROM p),
      reach(id, m) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.m FROM edges e JOIN reach r ON e.dst = r.id)
      SELECT id AS doc_id, min(m) AS cluster FROM reach
      GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val docs = Db(s, dir).documents
        TextDedup.duplicateClusters(docs, "doc_id",
            TextDedup.jaccardPairs(docs, "doc_id", "text", 0.3))
          .orderBy("doc_id")
      }),

    // --- q92: BM25-style top terms per document. The idf is the log-FREE
    //     rational form (N - df + 0.5)/(df + 0.5): integer-derived with one
    //     IEEE division, so scores are bit-identical across engines (ln()
    //     could differ in the last ulp between libm implementations).
    Q("q92_bm25_topterms", Some("""
      WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY 1, 2),
      df AS (SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.w,
               round(tf.tf * ((n.n - df.df + 0.5) / (df.df + 0.5)), 4) AS score
        FROM tf, df, n WHERE tf.w = df.w),
      ranked AS (
        SELECT doc_id, w, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rk
        FROM scored)
      SELECT doc_id, w AS term, score FROM ranked WHERE rk <= 3
      ORDER BY doc_id, term"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Db(s, dir).documents
        // lazy corpus size: a broadcast 1-row aggregate, not an eager count()
        val nDf = docs.agg(count(lit(1)).as("nn"))
        val words = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("w"))
        val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val dfq = words.groupBy("w").agg(countDistinct("doc_id").as("df"))
        val scored = tf.join(dfq, Seq("w")).crossJoin(broadcast(nDf))
          .withColumn("score",
            round(col("tf") * ((col("nn") - col("df") + 0.5) / (col("df") + 0.5)), 4))
        scored
          .withColumn("rk", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("score").desc, col("w"))))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("w").as("term"), col("score"))
          .orderBy("doc_id", "term")
      }),

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

}
