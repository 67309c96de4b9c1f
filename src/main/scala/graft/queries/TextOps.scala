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
    //     exact-Jaccard verification of candidates, on the PORTABLE hash
    //     family (md5-derived shingle hashes + (a·h+b) mod 2^31−1
    //     permutations) so the oracle replays the ENTIRE pipeline —
    //     signatures, band buckets, candidates, verification — in DuckDB
    //     SQL and the result hash-matches. The xxhash64 codegen variant
    //     (TextDedup.minhashLshPairs) stays the perf path; its recall vs
    //     exact Jaccard is asserted in MinHashLshSpec.
    Q("q56_minhash_lsh_dedup", Some(s"""
      WITH sh AS (
        SELECT doc_id, $shinglesSql AS sh
        FROM documents WHERE len(string_split(text,' ')) >= 3),
      tok AS (
        SELECT DISTINCT doc_id,
          ('0x' || substring(md5(s), 1, 15))::BIGINT % 2147483647 AS h
        FROM (SELECT doc_id, unnest(sh) AS s FROM sh)),
      perm AS (
        SELECT j,
          ('0x' || substring(md5('a' || j), 1, 7))::BIGINT * 2 + 1 AS pa,
          ('0x' || substring(md5('b' || j), 1, 7))::BIGINT AS pb
        FROM range(0, 64) t(j)),
      mh AS (
        SELECT doc_id, j, min((pa * h + pb) % 2147483647) AS m
        FROM tok, perm GROUP BY 1, 2),
      bands AS (
        SELECT doc_id, j // 4 AS band,
          sum(m * (CASE j % 4 WHEN 0 THEN 29791 WHEN 1 THEN 961
                              WHEN 2 THEN 31 ELSE 1 END)) AS bh
        FROM mh GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
      hs AS (SELECT doc_id, list(DISTINCT h) AS hl FROM tok GROUP BY 1),
      v AS (
        SELECT a_id, b_id, len(list_intersect(x.hl, y.hl)) AS c,
               len(x.hl) AS la, len(y.hl) AS lb
        FROM cand JOIN hs x ON x.doc_id = cand.a_id
                  JOIN hs y ON y.doc_id = cand.b_id)
      SELECT a_id, b_id, round(c / (la + lb - c), 4) AS jaccard
      FROM v WHERE c / (la + lb - c) >= 0.3
      ORDER BY a_id, b_id"""),
      (s, dir) => TextDedup.minhashLshPairsPortable(Db(s, dir).documents, "doc_id", "text", 0.3)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("a_id", "b_id")),

    // --- q173: cross-corpus FUZZY decontamination — near-dup (train, eval)
    //     pairs between the train split (source <> 'src0') and the
    //     benchmark slice (source = 'src0') on the q56 portable
    //     MinHash+LSH family. q107 catches verbatim leakage (an exact
    //     shared 5-gram); this catches paraphrase-level leakage that exact
    //     shingle equality misses. Candidates come from a (band, bucket)
    //     equi-join ACROSS the two corpora — each side shuffles once on its
    //     band keys, never an all-pairs product — then exact-Jaccard
    //     verification over the portable hash sets. The oracle replays
    //     signatures, buckets, candidates, and verification in DuckDB SQL.
    Q("q173_fuzzy_decontamination", Some(s"""
      WITH sh AS (
        SELECT doc_id, source, $shinglesSql AS sh
        FROM documents WHERE len(string_split(text,' ')) >= 3),
      tok AS (
        SELECT DISTINCT doc_id, source,
          ('0x' || substring(md5(s), 1, 15))::BIGINT % 2147483647 AS h
        FROM (SELECT doc_id, source, unnest(sh) AS s FROM sh)),
      perm AS (
        SELECT j,
          ('0x' || substring(md5('a' || j), 1, 7))::BIGINT * 2 + 1 AS pa,
          ('0x' || substring(md5('b' || j), 1, 7))::BIGINT AS pb
        FROM range(0, 64) t(j)),
      mh AS (
        SELECT doc_id, source, j, min((pa * h + pb) % 2147483647) AS m
        FROM tok, perm GROUP BY 1, 2, 3),
      bands AS (
        SELECT doc_id, source, j // 4 AS band,
          sum(m * (CASE j % 4 WHEN 0 THEN 29791 WHEN 1 THEN 961
                              WHEN 2 THEN 31 ELSE 1 END)) AS bh
        FROM mh GROUP BY 1, 2, 3),
      cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
        WHERE a.source <> 'src0' AND b.source = 'src0'),
      hs AS (SELECT doc_id, list(DISTINCT h) AS hl FROM tok GROUP BY 1),
      v AS (
        SELECT a_id, b_id, len(list_intersect(x.hl, y.hl)) AS c,
               len(x.hl) AS la, len(y.hl) AS lb
        FROM cand JOIN hs x ON x.doc_id = cand.a_id
                  JOIN hs y ON y.doc_id = cand.b_id)
      SELECT a_id, b_id, round(c / (la + lb - c), 4) AS jaccard
      FROM v WHERE c / (la + lb - c) >= 0.3
      ORDER BY a_id, b_id"""),
      (s, dir) => {
        val docs = Db(s, dir).documents
        TextDedup.crossCorpusLshPairsPortable(
            docs.filter(col("source") =!= "src0"),
            docs.filter(col("source") === "src0"),
            "doc_id", "text", 0.3)
          .select(col("a_id"), col("b_id"),
            round(col("jaccard"), 4).as("jaccard"))
          .orderBy("a_id", "b_id")
      }),

    // --- q57: SimHash near-dup (hamming ≤ 3, banded candidate generation —
    //     Manku et al. WWW'07) on the portable 60-bit md5-derived signature:
    //     the banded join's verified output equals the naive all-pairs scan,
    //     which is EXACTLY what the oracle runs (signature regenerated
    //     bit-for-bit in DuckDB, then brute-force hamming join). The
    //     xxhash64 codegen variant (TextDedup.simhashPairs) stays the perf
    //     path, spec-asserted set-equal to ITS naive scan in SimHashSpec.
    Q("q57_simhash_dedup", Some("""
      WITH tok AS (
        SELECT DISTINCT doc_id, ('0x' || substring(md5(w), 1, 15))::BIGINT AS h
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
      v AS (
        SELECT doc_id, i,
          sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        FROM tok, range(0, 60) t(i) GROUP BY 1, 2),
      sig AS (
        SELECT doc_id,
          sum(CASE WHEN vote > 0 THEN (1::BIGINT << i) ELSE 0 END) AS sim
        FROM v GROUP BY 1)
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sim, b.sim)) <= 3
      ORDER BY a_id, b_id"""),
      (s, dir) => TextDedup.simhashPairsPortable(Db(s, dir).documents, "doc_id", "text", 3)
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
        // df = docs containing w = row count per w OVER tf (one row per
        // distinct (doc, w)) — r16, guide §2.4: the countDistinct-over-
        // words formulation re-ran the corpus explode in a second sibling
        // plan and paid a two-stage distinct aggregation; this shape's
        // scan+explode+partial-agg is canonically identical to tf's, so
        // the shuffle is written once and reused (plan: one exchange
        // feeding both consumers), and the values are the same integers.
        val dfq = tf.groupBy("w").agg(count(lit(1)).as("df"))
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
        .orderBy("doc_id")),

    // --- q156: the PRODUCTION MinHash+LSH dedup path — xxhash64 codegen
    //     shingle hashes + the MinHashBands expression, the single-pass
    //     100 TB fast path (q56 keeps the portable md5 family for bit-exact
    //     whole-pipeline replay). Bucket membership is hash-specific, but
    //     every emitted pair's jaccard is EXACT over the documents' distinct
    //     3-gram shingles, so the re-rank oracle (q74 pattern) recomputes it
    //     from the raw text in DuckDB with the >= 0.3 threshold re-applied:
    //     a spurious pair or a wrong value fails the driver gate, and the
    //     driver bench now times this production path every round.
    Q("q156_minhash_lsh_perf", None,
      (s, dir) => {
        val out = TextDedup
          .minhashLshPairs(Db(s, dir).documents, "doc_id", "text", 0.3)
          .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
          .orderBy("a_id", "b_id")
        val rows = out.collect()
        if (rows.nonEmpty) {
          val rel = DynamicOracles.pairsRelation("q156_minhash_lsh_perf",
            rows.map(r => (r.get(0), r.get(1))).toSeq)
          DynamicOracles.put("q156_minhash_lsh_perf", s"""
            WITH sh AS (
              SELECT doc_id, $shinglesSql AS sh
              FROM documents WHERE len(string_split(text,' ')) >= 3),
            v AS (
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                len(list_intersect(a.sh, b.sh)) AS c,
                len(a.sh) AS la, len(b.sh) AS lb
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              JOIN $rel p ON p.a_id = a.doc_id AND p.b_id = b.doc_id)
            SELECT a_id, b_id, round(c / (la + lb - c), 4) AS jaccard
            FROM v WHERE c / (la + lb - c) >= 0.3
            ORDER BY a_id, b_id""")
        }
        out.sparkSession.createDataFrame(
          java.util.Arrays.asList(rows: _*), out.schema)
      }),

    // --- q157: the PRODUCTION SimHash dedup path — single-pass SimHash64
    //     codegen signature + pigeonhole bands (q57 keeps the portable
    //     60-bit md5 signature). The signature is engine-specific, so each
    //     emitted candidate pair is re-ranked with its EXACT distinct-word
    //     Jaccard — a portable per-pair score DuckDB independently
    //     recomputes from the raw text for the very ids emitted.
    Q("q157_simhash_perf", None,
      (s, dir) => {
        val docs = Db(s, dir).documents
        val pairs = TextDedup.simhashPairs(docs, "doc_id", "text", 3)
        // materialized once: consumed by both sides of the re-rank join.
        // distinct words as SORTED xxhash64 sets so the per-pair overlap is
        // a codegen merge (SortedIntersectCount) instead of a string-array
        // intersect — same count (64-bit collisions are negligible), and
        // the oracle recomputes the jaccard from the raw STRINGS anyway
        val toks = docs.select(col("doc_id"),
          org.apache.spark.sql.GraftShims.column(graft.functions.NgramHashes(
            org.apache.spark.sql.GraftShims.expression(
              split(col("text"), " ")), 1)).as("tk"))
          .localCheckpoint(false)
        val inter = org.apache.spark.sql.GraftShims.column(
          graft.functions.SortedIntersectCount(
            org.apache.spark.sql.GraftShims.expression(col("ta")),
            org.apache.spark.sql.GraftShims.expression(col("tb"))))
        val out = pairs
          .join(toks.select(col("doc_id").as("a_id"), col("tk").as("ta")), Seq("a_id"))
          .join(toks.select(col("doc_id").as("b_id"), col("tk").as("tb")), Seq("b_id"))
          .withColumn("common", inter)
          .select(col("a_id"), col("b_id"),
            round(col("common").cast("double") /
              (size(col("ta")) + size(col("tb")) - col("common")), 4).as("tok_jaccard"))
          .orderBy("a_id", "b_id")
        val rows = out.collect()
        if (rows.nonEmpty) {
          val rel = DynamicOracles.pairsRelation("q157_simhash_perf",
            rows.map(r => (r.get(0), r.get(1))).toSeq)
          DynamicOracles.put("q157_simhash_perf", s"""
            WITH tk AS (
              SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
              FROM documents)
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
                (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))), 4)
                AS tok_jaccard
            FROM tk a JOIN tk b ON a.doc_id < b.doc_id
            JOIN $rel p ON p.a_id = a.doc_id AND p.b_id = b.doc_id
            ORDER BY a_id, b_id""")
        }
        out.sparkSession.createDataFrame(
          java.util.Arrays.asList(rows: _*), out.schema)
      }),

    // --- q284: exact duplicated-SPAN dedup across documents
    //     (TextDedup.sharedSpanPairs) — the suffix-style family: verbatim
    //     8-token-plus overlaps embedded in otherwise-different documents,
    //     which the document-level MinHash/SimHash passes miss. k-token
    //     anchor hashes → df-bounded (h) equi-join → diagonal-run
    //     extension in one (pair, diagonal) window — never a suffix array
    //     on the driver, pair volume ≤ maxDf · anchors.
    Q("q284_shared_span_dedup", Some("""
      WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w
        FROM documents),
      a0 AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 6),
          i -> {p: i - 1,
                h: ('0x' || substring(md5(array_to_string(w[i:i+7], ' ')),
                    1, 15))::BIGINT})) AS a
        FROM tk WHERE len(w) >= 8),
      anch AS (SELECT doc_id, a.h AS h, CAST(min(a.p) AS BIGINT) AS p
        FROM a0 GROUP BY 1, 2),
      elig AS (SELECT h FROM anch GROUP BY 1
        HAVING count(*) >= 2 AND count(*) <= 16),
      ek AS (SELECT anch.doc_id, anch.h, anch.p
        FROM anch JOIN elig USING (h)),
      pr AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, x.p AS pa, y.p AS pb
        FROM ek x JOIN ek y ON y.h = x.h AND x.doc_id < y.doc_id),
      r0 AS (SELECT a_id, b_id, pa,
          pa - pb AS d,
          pa - row_number() OVER (PARTITION BY a_id, b_id, pa - pb
            ORDER BY pa) AS isl
        FROM pr),
      r1 AS (SELECT a_id, b_id, d, isl, count(*) AS run
        FROM r0 GROUP BY 1, 2, 3, 4)
      SELECT a_id, b_id, CAST(sum(run) AS BIGINT) AS n_anchors,
        count(*) AS n_spans, CAST(max(run) + 7 AS BIGINT) AS max_span_tokens
      FROM r1 GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, dir) => graft.operators.TextDedup.sharedSpanPairs(
          Db(s, dir).documents, "doc_id", "text", k = 8, maxDf = 16)
        .orderBy("a_id", "b_id")),

    // --- q289: exact token statistics (Corpus.tokenCounts) — whitespace
    //     tokens (\S+ runs) and BPE-ish tokens under the lookahead-free
    //     GPT-2-style segmentation regex, identical in Java and RE2:
    //     the "how many model tokens is this corpus" budget number as a
    //     pure map (one regex pass per row, no shuffle at any size).
    Q("q289_token_counts", Some("""
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
        CAST(len(regexp_extract_all(text,
          '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
          AS BIGINT) AS n_bpeish_tokens
      FROM documents ORDER BY doc_id"""),
      (s, dir) => graft.operators.Corpus.tokenCounts(
          Db(s, dir).documents, "doc_id", "text")
        .orderBy("doc_id")),

    // --- q290: winnowing document fingerprints
    //     (TextDedup.winnowingFingerprints) — the MOSS rolling-hash
    //     family: min anchor hash of every 4 consecutive 8-token
    //     windows; any shared 11-token run contributes a common
    //     fingerprint at ~1/4 the anchor volume. One per-document
    //     window + distinct; the compact signature corpora join on.
    Q("q290_winnowing_fingerprints", Some("""
      WITH tk AS (SELECT doc_id, string_split(text, ' ') AS wds
        FROM documents),
      a AS (SELECT doc_id, unnest(list_transform(range(1, len(wds) - 6),
          i -> {p: i - 1,
                h: ('0x' || substring(md5(array_to_string(wds[i:i+7], ' ')),
                    1, 15))::BIGINT})) AS a
        FROM tk WHERE len(wds) >= 8),
      r AS (SELECT doc_id, a.p AS p, a.h AS h,
              count(*) OVER (PARTITION BY doc_id) AS n FROM a),
      m AS (SELECT doc_id, p, n,
              min(h) OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM r)
      SELECT DISTINCT doc_id, fp FROM m WHERE p <= n - 4
      ORDER BY doc_id, fp"""),
      (s, dir) => graft.operators.TextDedup.winnowingFingerprints(
          Db(s, dir).documents, "doc_id", "text", k = 8, w = 4)
        .orderBy("doc_id", "fp")),

    // --- q292: corpus-level n-gram diversity (Corpus.ngramDiversity) —
    //     the distinct-n audit per source: total trigram occurrences vs
    //     exact distinct trigrams; a low ratio flags template-dominated
    //     slices whose repetition lives ACROSS documents (invisible to
    //     the per-document q172 score). Hash-keyed exact distinct, no
    //     collect, no window.
    Q("q292_ngram_diversity", Some("""
      WITH tk AS (SELECT source, string_split(text, ' ') AS w
        FROM documents),
      a AS (SELECT source, unnest(list_transform(range(1, len(w) - 1),
          i -> ('0x' || substring(md5(array_to_string(w[i:i+2], ' ')),
                1, 15))::BIGINT)) AS h
        FROM tk WHERE len(w) >= 3)
      SELECT source, count(*) AS n_grams,
        count(DISTINCT h) AS n_distinct,
        round(CAST(count(DISTINCT h) AS DOUBLE) / count(*), 6)
          AS distinct_ratio
      FROM a GROUP BY 1 ORDER BY 1"""),
      (s, dir) => graft.operators.Corpus.ngramDiversity(
          Db(s, dir).documents, Seq("source"), "text", n = 3)
        .orderBy("source"))
  )

}
