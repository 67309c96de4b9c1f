package graft.queries

import graft.Db
import graft.operators.Features
import org.apache.spark.sql.functions._

/** Round-12 ML-featurization gates: leakage-guarded target encoding,
  * rank normalization, and the signed feature-hashing trick — exact
  * integer sufficient statistics, total-ordered ranks, the portable
  * md5 hash family, each replayed bit-for-bit by the DuckDB oracle.
  */
object FeatureOps {

  val all: Seq[Q] = Seq(

    // --- q273: leave-one-out target encoding (Features.targetEncodeLoo)
    //     — each order's priority class encoded as the F-status rate of
    //     the OTHER orders in its class: (Σy − y)/(n − 1), the leakage
    //     guard that keeps a row from seeing its own label. One category
    //     aggregation broadcast-joined back.
    Q("q273_target_encode_loo", Some("""
      WITH s AS (SELECT o_orderpriority AS p, count(*) AS n,
          CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
            AS BIGINT) AS sy
        FROM orders GROUP BY 1)
      SELECT o_orderkey, o_orderpriority,
        CASE WHEN n > 1 THEN
          round(CAST(sy - (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
            AS DOUBLE) / (n - 1), 6) END AS enc
      FROM orders JOIN s ON s.p = o_orderpriority
      ORDER BY o_orderkey"""),
      (s, dir) => Features.targetEncodeLoo(Db(s, dir).orders,
          "o_orderpriority",
          when(col("o_orderstatus") === "F", 1L).otherwise(0L))
        .select("o_orderkey", "o_orderpriority", "enc")
        .orderBy("o_orderkey")),

    // --- q274: rank normalization (Features.rankNormalize) — price →
    //     percentile position within its return-flag group, (rank−1)/
    //     (n−1): the outlier-immune feature scaling. One rank window,
    //     tie-broken to a total order so the feature is partition-
    //     order-independent.
    Q("q274_rank_normalize", Some("""
      WITH v AS (SELECT l_orderkey, l_linenumber, l_returnflag,
          CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        FROM lineitem WHERE l_quantity <= 3),
      r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
              ORDER BY c, l_orderkey * 8 + l_linenumber) AS rn,
            count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM v)
      SELECT l_orderkey, l_linenumber, l_returnflag,
        CASE WHEN n = 1 THEN 0.5e0
             ELSE round(CAST(rn - 1 AS DOUBLE) / (n - 1), 6) END AS pr
      FROM r ORDER BY 1, 2"""),
      (s, dir) => Features.rankNormalize(
          Db(s, dir).lineitem.where(col("l_quantity") <= 3)
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_returnflag"),
              (Db.dec(col("l_extendedprice")) * 100).cast("long").as("c")),
          Seq("l_returnflag"), col("c"),
          col("l_orderkey") * 8 + col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "pr")
        .orderBy("l_orderkey", "l_linenumber")),

    // --- q275: signed feature hashing (Features.hashFeatures) — tokens
    //     → 256-wide sparse vectors via the portable md5 family (index =
    //     low bits, sign = next bit, cells = signed sums), reproducible
    //     in any engine — the training/serving-skew guard. Map-side
    //     explode + one (doc, index) aggregation.
    Q("q275_feature_hashing", Some("""
      WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents WHERE doc_id % 10 = 0),
      h AS (SELECT doc_id,
          ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
        FROM t WHERE tok <> '')
      SELECT doc_id, h % 256 AS idx,
        CAST(sum(CASE WHEN (h // 256) % 2 = 0 THEN 1 ELSE -1 END)
          AS BIGINT) AS weight
      FROM h GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, dir) => Features.hashFeatures(
          Db(s, dir).documents.where(col("doc_id") % 10 === 0),
          "doc_id", "text", dim = 256)
        .orderBy("doc_id", "idx"))
  )
}
