package graft.queries

import graft.Db
import graft.operators.{Eval, Features}
import org.apache.spark.sql.functions._

/** Round-12 ML-featurization gates: leakage-guarded target encoding,
  * rank normalization, and the signed feature-hashing trick — exact
  * integer sufficient statistics, total-ordered ranks, the portable
  * md5 hash family, each replayed bit-for-bit by the DuckDB oracle.
  */
object FeatureOps {

  /** ONE oracle for BOTH quality-filter gates (q286 table path, q291
    * fused dense path): the two engine plans are bit-for-bit equal by
    * construction, so a single shared SQL constant keeps any future
    * oracle fix from silently diverging the two gates' models. */
  private val qualityFilterOracle = """
      WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
      h AS (SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
            FROM t WHERE tok <> ''),
      f AS (SELECT doc_id, h % 256 AS idx,
              CAST(sum(CASE WHEN (h // 256) % 2 = 0 THEN 1 ELSE -1 END)
                AS BIGINT) AS weight
            FROM h GROUP BY 1, 2),
      w AS (SELECT idx,
              CAST(('0x' || substring(md5('w' || CAST(idx AS VARCHAR)),
                  1, 15))::BIGINT % 2001 - 1000 AS DOUBLE) / 1000 AS w
            FROM range(256) r(idx)),
      m AS (SELECT f.doc_id, count(*) AS n_feat,
              list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(list_sort(list({i: f.idx,
                  t: CAST(f.weight AS DOUBLE) * w.w})), z -> z.t)),
                (x, y) -> x + y) AS margin
            FROM f JOIN w USING (idx) GROUP BY 1)
      SELECT d.doc_id, coalesce(m.n_feat, CAST(0 AS BIGINT)) AS n_feat,
        round(coalesce(m.margin, 0e0) - 0.05e0, 6) AS score,
        CAST(CASE WHEN coalesce(m.margin, 0e0) - 0.05e0 > 0e0
             THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
      ORDER BY d.doc_id"""

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
        .orderBy("doc_id", "idx")),

    // --- q288: rank normalization at scale (Features.rankNormalizeAtScale)
    //     — q274's feature on Rank.atScalePerGroup's two-phase rank: the
    //     few-huge-groups case (5 event types; at 100 TB the per-group
    //     window is one reducer per type) ranked with every reducer
    //     sorting only its range slice. Ranks ≡ the window's row_number,
    //     so the oracle is the plain window replay; NULL values stay out
    //     of the ranking and surface pr NULL.
    Q("q288_rank_normalize_at_scale", Some("""
      WITH v AS (SELECT event_id, event_type,
          CAST(floor(value * 100) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL),
      r AS (SELECT event_id, event_type,
              row_number() OVER (PARTITION BY event_type
                ORDER BY c, event_id) AS rn,
              count(*) OVER (PARTITION BY event_type) AS n
            FROM v)
      SELECT event_id, event_type,
        CASE WHEN n = 1 THEN 0.5e0
             ELSE round(CAST(rn - 1 AS DOUBLE) / (n - 1), 6) END AS pr
      FROM r
      UNION ALL
      SELECT event_id, event_type, CAST(NULL AS DOUBLE) AS pr
      FROM events WHERE value IS NULL
      ORDER BY event_id"""),
      (s, dir) => Features.rankNormalizeAtScale(
          Db(s, dir).events.select(col("event_id"), col("event_type"),
            floor(col("value") * 100).cast("long").as("c")),
          Seq("event_type"), col("c"), col("event_id"))
        .select("event_id", "event_type", "pr")
        .orderBy("event_id")),

    // --- q286: model-based quality-filter inference (Features.linearScore)
    //     — the CCNet/fastText-style pretraining filter: every document
    //     scored by a linear classifier over its q275 hashed-feature
    //     vector (weight table md5-derived so the oracle regenerates the
    //     model in-query), margin summed in ascending-index order so both
    //     engines agree bit-for-bit, keep decided on the log-odds (no exp
    //     on either side). Map-shaped end to end: explode + (doc, idx)
    //     aggregation + a measured-size weight-table join + one per-doc
    //     fold.
    Q("q286_quality_filter", Some(qualityFilterOracle),
      (s, dir) => Features.linearScore(Db(s, dir).documents,
          "doc_id", "text", dim = 256,
          weights = Features.portableWeights(s, 256), bias = -0.05)
        .orderBy("doc_id")),

    // --- q291: the q286 filter on the DENSE single-expression path
    //     (Features.linearScoreDense / functions.LinearMargin): feature
    //     hashing + weight lookup + ascending-index fold fused into one
    //     codegen projection — zero shuffles at any corpus size, and the
    //     stream-safe (append-mode) form of quality filtering at ingest
    //     (StreamingSpec pins incremental ≡ batch). Same oracle as q286:
    //     the two engine paths are bit-for-bit equal by construction.
    Q("q291_quality_filter_dense", Some(qualityFilterOracle),
      (s, dir) => Features.linearScoreDense(Db(s, dir).documents,
          "doc_id", "text", dim = 256,
          weights = Features.portableWeightsArray(256), bias = -0.05)
        .orderBy("doc_id")),

    // --- q277: exact ROC AUC (Eval.aucExact) — Mann–Whitney rank-sum
    //     with tie halves computed as 2U in exact integers over the
    //     distinct-score axis, one final division. Two eval runs that
    //     disagree in the 6th decimal are a bug, not noise.
    Q("q277_auc", Some("""
      WITH s AS (SELECT value AS sc,
          CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL),
      g AS (SELECT sc, count(*) FILTER (WHERE y = 1) AS pos,
          count(*) FILTER (WHERE y = 0) AS neg
        FROM s GROUP BY 1),
      c AS (SELECT pos, neg,
          coalesce(sum(neg) OVER (ORDER BY sc
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        FROM g),
      a AS (SELECT CAST(sum(pos + neg) AS BIGINT) AS n,
          CAST(sum(pos) AS BIGINT) AS n_pos,
          CAST(sum(neg) AS BIGINT) AS n_neg,
          sum(CAST(pos AS HUGEINT) * (nb * 2 + neg)) AS u2
        FROM c)
      SELECT n, n_pos, n_neg,
        CASE WHEN n_pos > 0 AND n_neg > 0 THEN
          round(CAST(u2 AS DOUBLE) / (2e0 * n_pos * n_neg), 6) END AS auc
      FROM a"""),
      (s, dir) => Eval.aucExact(Db(s, dir).events, col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L))),

    // --- q278: thresholded confusion metrics (Eval.thresholdMetrics) —
    //     tp/fp/fn/tn + precision/recall/f1 at three operating points,
    //     ALL counted in one scan; 0-denominators surface NULL on both
    //     engines, never a fake score.
    Q("q278_threshold_metrics", Some {
      val ts = Seq("25.0", "50.0", "75.0")
      val counts = ts.zipWithIndex.flatMap { case (t, i) => Seq(
        s"count(*) FILTER (WHERE sc >= $t AND y = 1) AS tp$i",
        s"count(*) FILTER (WHERE sc >= $t AND y = 0) AS fp$i",
        s"count(*) FILTER (WHERE sc < $t AND y = 1) AS fn$i")
      }.mkString(", ")
      val rows = ts.zipWithIndex.map { case (t, i) =>
        s"""SELECT CAST($t AS DOUBLE) AS threshold, tp$i AS tp, fp$i AS fp,
          fn$i AS fn, n - tp$i - fp$i - fn$i AS tn,
          round(CAST(tp$i AS DOUBLE) / (tp$i + fp$i), 6) AS precision,
          round(CAST(tp$i AS DOUBLE) / (tp$i + fn$i), 6) AS recall,
          round(2e0 * CAST(tp$i AS DOUBLE) / (tp$i * 2 + fp$i + fn$i), 6)
            AS f1
        FROM c"""
      }.mkString("\n      UNION ALL\n      ")
      s"""WITH s AS (SELECT value AS sc,
          CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL),
      c AS (SELECT count(*) AS n, $counts FROM s)
      $rows
      ORDER BY threshold"""
    },
      (s, dir) => Eval.thresholdMetrics(Db(s, dir).events, col("value"),
          when(col("event_type") === "purchase", 1L).otherwise(0L),
          Seq(25.0, 50.0, 75.0))
        .orderBy("threshold")),

    // --- q279: calibration curve (Eval.calibrationCurve) — ten exact
    //     equal-count score buckets ((rank−1)·10 div n), mean predicted
    //     score vs observed positive rate per bucket: the reliability
    //     diagram behind "is the model over-confident?".
    Q("q279_calibration", Some("""
      WITH s AS (SELECT CAST(floor(value * 10000) AS BIGINT) AS m,
          CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
          event_id
        FROM events WHERE value IS NOT NULL),
      r AS (SELECT m, y, row_number() OVER (ORDER BY m, event_id) AS rn,
          count(*) OVER () AS n
        FROM s),
      b AS (SELECT ((rn - 1) * 10) // n AS bucket, m, y FROM r)
      SELECT bucket, count(*) AS n,
        CAST(coalesce(sum(y), 0) AS BIGINT) AS n_pos,
        round(CAST(sum(CAST(m AS HUGEINT)) AS DOUBLE) / count(*), 6)
          AS avg_score_micro,
        round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS pos_rate
      FROM b GROUP BY 1 ORDER BY 1"""),
      (s, dir) => Eval.calibrationCurve(Db(s, dir).events,
          floor(col("value") * 10000),
          when(col("event_type") === "purchase", 1L).otherwise(0L),
          col("event_id"), nBuckets = 10)
        .orderBy("bucket")),

    // --- q280: winsorized mean at scale (Robust.winsorizedAtScale) —
    //     q267's semantics WITHOUT the per-group data sort: equi-width
    //     bin sketch → tail-rank cut bins located on the sketch → one
    //     clamped-sum scan with the cut table broadcast. Cut values are
    //     bin edges (error ≤ one bin width); the low-cardinality-group
    //     scale path the q267 caveat calls for.
    Q("q280_winsorized_at_scale", Some("""
      WITH v AS (SELECT o_orderpriority AS pri,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        FROM orders),
      b AS (SELECT pri,
          (least(59999999, greatest(0, v - 0)) * 4096) // 60000000 AS b,
          count(*) AS n
        FROM v GROUP BY 1, 2),
      c AS (SELECT pri, b, n,
          sum(n) OVER (PARTITION BY pri ORDER BY b
            ROWS UNBOUNDED PRECEDING) AS cum,
          sum(n) OVER (PARTITION BY pri) AS nn
        FROM b),
      t AS (SELECT *, (nn * 50) // 1000 AS t FROM c),
      cuts AS (SELECT pri,
          min(CASE WHEN cum >= t + 1 THEN b END) AS lob,
          min(CASE WHEN cum >= nn - t THEN b END) AS hib
        FROM t GROUP BY 1),
      k AS (SELECT pri,
          (lob * 60000000 + 4095) // 4096 AS lo_cut,
          (hib * 60000000 + 4095) // 4096 AS hi_cut
        FROM cuts)
      SELECT v.pri AS o_orderpriority, count(*) AS n,
        max(lo_cut) AS lo_cut, max(hi_cut) AS hi_cut,
        round(CAST(sum(CAST(least(hi_cut, greatest(lo_cut, v)) AS HUGEINT))
          AS DOUBLE) / count(*), 6) AS winsorized_mean
      FROM v JOIN k ON k.pri = v.pri
      GROUP BY 1 ORDER BY 1"""),
      (s, dir) => graft.operators.Robust.winsorizedAtScale(
          Db(s, dir).orders.select(col("o_orderpriority"),
            (Db.dec(col("o_totalprice")) * 100).cast("long").as("cents")),
          Seq("o_orderpriority"), col("cents"),
          loCents = 0L, hiCents = 60000000L, nBins = 4096,
          pctPermille = 50)
        .orderBy("o_orderpriority")),

    // --- q281: per-group quantiles at scale (Robust.quantilesAtScale)
    //     — p50/p90/p99 order values per priority from the q280 bin
    //     sketch: every requested rank answered from ONE scan + one
    //     sketch window, no data sort at any group cardinality
    //     (nearest-rank, error ≤ one bin width).
    Q("q281_quantiles_at_scale", Some {
      val qs = Seq(500, 900, 990)
      val mins = qs.zipWithIndex.map { case (q, i) =>
        s"min(CASE WHEN cum >= (nn * $q + 999) // 1000 THEN b END) AS qb$i"
      }.mkString(",\n          ")
      val rows = qs.zipWithIndex.map { case (q, i) =>
        s"""SELECT pri AS o_orderpriority, $q AS q_permille, n,
          (qb$i * 60000000 + 4095) // 4096 AS q_value FROM q"""
      }.mkString("\n      UNION ALL\n      ")
      s"""WITH v AS (SELECT o_orderpriority AS pri,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        FROM orders),
      b AS (SELECT pri,
          (least(59999999, greatest(0, v - 0)) * 4096) // 60000000 AS b,
          count(*) AS n
        FROM v GROUP BY 1, 2),
      c AS (SELECT pri, b, n,
          sum(n) OVER (PARTITION BY pri ORDER BY b
            ROWS UNBOUNDED PRECEDING) AS cum,
          sum(n) OVER (PARTITION BY pri) AS nn
        FROM b),
      q AS (SELECT pri, CAST(max(nn) AS BIGINT) AS n,
          $mins
        FROM c GROUP BY 1)
      $rows
      ORDER BY o_orderpriority, q_permille"""
    },
      (s, dir) => graft.operators.Robust.quantilesAtScale(
          Db(s, dir).orders.select(col("o_orderpriority"),
            (Db.dec(col("o_totalprice")) * 100).cast("long").as("cents")),
          Seq("o_orderpriority"), col("cents"),
          loCents = 0L, hiCents = 60000000L, nBins = 4096,
          qsPermille = Seq(500, 900, 990))
        .orderBy("o_orderpriority", "q_permille")),

    // --- q283: median + MAD at scale (Robust.medianMadAtScale) — q213's
    //     robust statistics from the q280/q281 bin sketch: two sketch
    //     passes (values, then |v − med| about the sketch median), no
    //     per-group data sort at any group cardinality. med/mad are bin
    //     lower edges (nearest-rank, error ≤ one bin width; exact on
    //     bin-aligned data) — the last ranked-statistic member off the
    //     one-reducer-per-group path.
    Q("q283_median_mad_at_scale", Some("""
      WITH v AS (SELECT event_type AS g,
          CAST(floor(value * 100) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL),
      b AS (SELECT g, (least(51199, greatest(0, v - 0)) * 1024) // 51200 AS b,
          count(*) AS n
        FROM v GROUP BY 1, 2),
      c AS (SELECT g, b, n,
          sum(n) OVER (PARTITION BY g ORDER BY b ROWS UNBOUNDED PRECEDING)
            AS cum,
          sum(n) OVER (PARTITION BY g) AS nn
        FROM b),
      m AS (SELECT g, CAST(max(nn) AS BIGINT) AS n,
          min(CASE WHEN cum >= (nn * 500 + 999) // 1000 THEN b END) AS mb
        FROM c GROUP BY 1),
      med AS (SELECT g, n, 0 + (mb * 51200 + 1023) // 1024 AS med FROM m),
      dv AS (SELECT v.g, abs(v.v - med.med) AS v
             FROM v JOIN med ON med.g = v.g),
      db AS (SELECT g, (least(51199, greatest(0, v - 0)) * 1024) // 51200
            AS b, count(*) AS n
        FROM dv GROUP BY 1, 2),
      dc AS (SELECT g, b, n,
          sum(n) OVER (PARTITION BY g ORDER BY b ROWS UNBOUNDED PRECEDING)
            AS cum,
          sum(n) OVER (PARTITION BY g) AS nn
        FROM db),
      dm AS (SELECT g,
          min(CASE WHEN cum >= (nn * 500 + 999) // 1000 THEN b END) AS mb
        FROM dc GROUP BY 1)
      SELECT med.g AS event_type, med.n, med.med,
        0 + (dm.mb * 51200 + 1023) // 1024 AS mad
      FROM med JOIN dm ON dm.g = med.g
      ORDER BY 1"""),
      (s, dir) => graft.operators.Robust.medianMadAtScale(
          Db(s, dir).events.select(col("event_type"),
            floor(col("value") * 100).cast("long").as("cents")),
          Seq("event_type"), col("cents"),
          loCents = 0L, hiCents = 51200L, nBins = 1024)
        .orderBy("event_type"))
  )
}
