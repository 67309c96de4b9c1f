package graft.queries

import graft.Db
import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** Round-11 text retrieval / quality gates: full BM25 ranked search (the
  * query-time face of q92's BM25 term weighting), asymmetric containment
  * dedup (quote/excerpt detection that symmetric Jaccard misses), and
  * per-document token-entropy scoring (a repetition/diversity quality
  * signal computed as a deterministic sorted array fold — the q58 idiom:
  * map-only, zero shuffles).
  */
object TextSearch {

  // BM25 hyperparameters (Robertson & Zaragoza 2009 defaults: k1=1.2,
  // b=0.75), pre-folded into the exact double literals BOTH engines parse:
  // k1+1 = 2.2, 1−b = 0.25. The oracle writes them in e0 notation so DuckDB
  // binds DOUBLE, not DECIMAL — decimal math would diverge from Spark's
  // doubles before the 4-decimal round.

  val all: Seq[Q] = Seq(

    // --- q208: BM25 ranked search for a fixed two-term query. tf rows are
    //     filtered to the query terms BEFORE any aggregation (the inverted-
    //     index access path: work scales with posting-list length, not
    //     corpus size); corpus stats (N, avgdl) ride a broadcast 1-row
    //     aggregate. Per-term partial scores land in fixed slots and are
    //     added in a fixed order — never a float sum whose order the
    //     planner picks — so the doubles are bit-identical across engines.
    Q("q208_bm25_search", Some(s"""
      WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                     FROM documents),
      len AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY 1),
      stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*)
                  AS avgdl FROM len),
      tf AS (SELECT doc_id, w, count(*) AS tf FROM words
             WHERE w IN ('join', 'filter') GROUP BY 1, 2),
      df AS (SELECT w, count(DISTINCT doc_id) AS df FROM words
             WHERE w IN ('join', 'filter') GROUP BY 1),
      sc AS (SELECT tf.doc_id, CASE WHEN tf.w = 'join' THEN 0 ELSE 1 END AS slot,
               ln((stats.n - df.df + 0.5e0) / (df.df + 0.5e0) + 1e0) *
                 (tf.tf * 2.2e0) /
                 (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * len.dl / stats.avgdl)) AS s
             FROM tf JOIN df USING (w) JOIN len USING (doc_id)
             CROSS JOIN stats),
      agg AS (SELECT doc_id,
                coalesce(max(CASE WHEN slot = 0 THEN s END), 0) +
                coalesce(max(CASE WHEN slot = 1 THEN s END), 0) AS score
              FROM sc GROUP BY 1),
      rk AS (SELECT doc_id, round(score, 4) AS score,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rn FROM agg)
      SELECT doc_id, score FROM rk WHERE rn <= 15
      ORDER BY score DESC, doc_id"""),
      (s, dir) => {
        val terms = Seq("join", "filter")
        val docs = Db(s, dir).documents
        val words = Db.spread(docs).select(col("doc_id"),
          explode(split(col("text"), " ")).as("w"))
        // ONE aggregation pass over the exploded tokens carrying the doc
        // length AND both per-term tfs (r16, guide §2.4): the previous
        // len/tf/df formulation consumed the words subtree from FOUR
        // sibling plans, re-running the corpus scan + explode for each
        // (column pruning defeats exchange reuse — the q249/q209
        // mechanism). df per term = docs with tf > 0 and the corpus
        // stats fold into one more 1-row aggregate over this frame; the
        // per-slot score expression and its slot0+slot1 addition order
        // are textually unchanged, so the doubles are bit-identical.
        val perDoc = words.groupBy("doc_id").agg(
          count(lit(1)).as("dl"),
          count(when(col("w") === terms.head, 1)).as("tf0"),
          count(when(col("w") === terms(1), 1)).as("tf1"))
        val stats = perDoc.agg(count(lit(1)).as("n"),
          (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
          count(when(col("tf0") > 0, 1)).as("df0"),
          count(when(col("tf1") > 0, 1)).as("df1"))
        def slotScore(tf: org.apache.spark.sql.Column,
                      df: org.apache.spark.sql.Column) =
          when(tf > 0,
            log((col("n") - df + 0.5) / (df + 0.5) + 1) *
              (tf * 2.2) /
              (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
            .otherwise(lit(0.0))
        perDoc.where(col("tf0") > 0 || col("tf1") > 0)
          .crossJoin(broadcast(stats))
          .select(col("doc_id"),
            (slotScore(col("tf0"), col("df0")) +
              slotScore(col("tf1"), col("df1"))).as("score"))
          // top-k via sort+limit = TakeOrderedAndProject (distributed
          // per-partition heaps), never a single-partition global window
          .orderBy(col("score").desc, col("doc_id"))
          .limit(15)
          .select(col("doc_id"), round(col("score"), 4).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
      }),

    // --- q209: asymmetric containment dedup (TextDedup.containmentPairs) —
    //     the smaller document's distinct word-5-grams at least half
    //     contained in the larger's. The df ≤ 50 stop-phrase cap is part of
    //     the declared semantics and replayed by the oracle; threshold 0.5
    //     compares as the exact integer test inter·2 ≥ size_a. Shingles
    //     ride as their full 60-bit portable md5 hash (8-byte shuffle keys;
    //     the oracle replays the same md5 — collision-free until ~2^30
    //     distinct shingles).
    Q("q209_containment_dedup", Some("""
      WITH sh AS (SELECT DISTINCT doc_id,
               ('0x' || substring(md5(g), 1, 15))::BIGINT AS s
             FROM (
             SELECT doc_id, unnest(list_transform(
               range(1, len(string_split(text,' ')) - 3),
               i -> string_split(text,' ')[i] || ' ' ||
                    string_split(text,' ')[i+1] || ' ' ||
                    string_split(text,' ')[i+2] || ' ' ||
                    string_split(text,' ')[i+3] || ' ' ||
                    string_split(text,' ')[i+4])) AS g
             FROM documents)),
      sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
      good AS (SELECT sh.doc_id, sh.s FROM sh JOIN df USING (s)
               WHERE df.df <= 50),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
                FROM good a JOIN good b USING (s)
                WHERE a.doc_id <> b.doc_id GROUP BY 1, 2)
      SELECT p.a_id AS contained_id, p.b_id AS container_id, p.inter,
        sa.sz AS size_a, sb.sz AS size_b
      FROM pairs p JOIN sz sa ON sa.doc_id = p.a_id
      JOIN sz sb ON sb.doc_id = p.b_id
      WHERE (sa.sz < sb.sz OR (sa.sz = sb.sz AND p.a_id < p.b_id))
        AND p.inter * 2 >= sa.sz
      ORDER BY 1, 2"""),
      (s, dir) => TextDedup.containmentPairs(Db(s, dir).documents,
          "doc_id", "text", threshold = 0.5, n = 5, maxDf = 50)
        .orderBy("contained_id", "container_id")),

    // --- q211: per-document token entropy + type-token stats — the
    //     lexical-diversity quality screen (low entropy = repetitive /
    //     template text; Gopher §A1.1's cousin). Entropy is computed as
    //     ln(n) − (Σ c·ln c)/n with the fold running over the SORTED
    //     distinct tokens — a fixed evaluation order both engines replay,
    //     entirely inside codegen array lambdas: zero shuffles at any
    //     scale. O(tokens · distinct) per doc — fine at document lengths;
    //     a 100 TB run with book-length docs would pre-count tokens once.
    Q("q211_token_entropy", Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      s AS (SELECT doc_id, len(ws) AS n_tokens,
              len(list_distinct(ws)) AS n_distinct,
              list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(list_sort(list_distinct(ws)),
                  w -> CAST(len(list_filter(ws, x -> x = w)) AS DOUBLE))),
                (a, c) -> a + c * ln(c)) AS clogc
            FROM t)
      SELECT doc_id, n_tokens, n_distinct,
        round(ln(n_tokens) - clogc / n_tokens, 6) AS entropy
      FROM s ORDER BY doc_id"""),
      (s, dir) => {
        val ws = split(col("text"), " ")
        // the per-row entropy lambda is O(distinct·tokens): spread the map
        // stage instead of inheriting the single-row-group scan's one task
        Db.spread(Db(s, dir).documents).select(col("doc_id"), ws.as("ws"))
          .select(col("doc_id"), size(col("ws")).as("n_tokens"),
            size(array_distinct(col("ws"))).as("n_distinct"),
            aggregate(
              transform(sort_array(array_distinct(col("ws"))),
                w => size(filter(col("ws"), x => x === w)).cast("double")),
              lit(0.0), (a, c) => a + c * log(c)).as("clogc"))
          .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
            round(log(col("n_tokens")) - col("clogc") / col("n_tokens"), 6)
              .as("entropy"))
          .orderBy("doc_id")
      })
  )
}
