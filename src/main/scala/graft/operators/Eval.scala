package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation operators — the offline metrics a training pipeline
  * computes after scoring a holdout: exact AUC, thresholded confusion
  * metrics, and the calibration (reliability) curve. All counting is
  * exact integers; every float is a final closed-form expression, so a
  * SQL oracle replays the metrics bit-for-bit — two evaluation runs
  * that disagree in the 6th decimal are a pipeline bug, not noise.
  *
  * Scale shapes: [[thresholdMetrics]] is ONE scan with per-threshold
  * conditional counts (never a scan per threshold). [[aucExact]] and
  * [[calibrationCurve]] need a prefix-sum/rank over the DISTINCT score
  * axis — a global-ordered window, i.e. one reducer pass over distinct
  * scores. Model scores quantize naturally (float32 logits, fixed-
  * precision probabilities), so distinct counts stay far below row
  * counts; at the extreme, pre-quantize scores (floor(s·10⁶)) before
  * evaluating — the metrics move less than the quantization step.
  */
object Eval {

  private val D38 = "decimal(38,0)"

  /** Exact ROC AUC via the Mann–Whitney rank-sum with the standard tie
    * treatment (ties contribute half): AUC = U/(n₊·n₋) where
    * U = Σ over distinct scores of pos(s)·(negBelow(s) + neg(s)/2).
    * Computed as 2U in exact integers (no halves), divided once at the
    * end. `label` must be 0/1. Rows with a NULL score are excluded
    * (an unscored row has no rank position; NULL labels fall out of
    * both classes by the same conditional counts). Output (1 row): n,
    * n_pos, n_neg, auc (round 6; NULL when either class is absent — an
    * AUC of a one-class holdout is undefined, not 0.5). */
  def aucExact(df: DataFrame, score: Column, label: Column): DataFrame = {
    val byScore = df.select(score.as("__s"), label.cast("long").as("__y"))
      .where(col("__s").isNotNull)
      .groupBy("__s")
      .agg(count(when(col("__y") === 1, 1)).as("__pos"),
        count(when(col("__y") === 0, 1)).as("__neg"))
    val cum = byScore.withColumn("__negBelow",
      coalesce(sum(col("__neg")).over(Window.orderBy(col("__s"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    cum.agg(sum(col("__pos") + col("__neg")).as("n"),
        sum(col("__pos")).as("n_pos"),
        sum(col("__neg")).as("n_neg"),
        sum(col("__pos").cast(D38) *
          (col("__negBelow") * 2 + col("__neg"))).as("__u2"))
      .select(col("n"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Confusion metrics at each threshold (score ≥ t ⇒ predicted
    * positive), ALL thresholds counted in ONE scan — per threshold one
    * tp/fp/fn conditional-count triple inside the same aggregation,
    * unpivoted via explode (the Audit.expectations shape). precision/
    * recall/f1 are the textbook expressions; a 0-denominator yields
    * NULL on both engines (never a fake 0.0 score). Rows with a NULL
    * score or NULL label are excluded — an unscored/unlabeled row must
    * not land in tn via the n − tp − fp − fn remainder (the aucExact
    * contract). Output per threshold, ascending: threshold, tp, fp,
    * fn, tn, precision, recall, f1 (round 6). */
  def thresholdMetrics(df: DataFrame, score: Column, label: Column,
                       thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val s = df.select(score.as("__s"), label.cast("long").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val counts = s.agg(count(lit(1)).as("__n"),
      thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
        count(when(col("__s") >= t && col("__y") === 1, 1)).as(s"__tp$i"),
        count(when(col("__s") >= t && col("__y") === 0, 1)).as(s"__fp$i"),
        count(when(col("__s") < t && col("__y") === 1, 1)).as(s"__fn$i"))
      }: _*)
    counts.select(col("__n"), explode(array(
        thresholds.zipWithIndex.map { case (t, i) =>
          struct(lit(t).as("threshold"), col(s"__tp$i").as("tp"),
            col(s"__fp$i").as("fp"), col(s"__fn$i").as("fn"))
        }: _*)).as("__r"))
      .select(col("__r.threshold").as("threshold"), col("__r.tp").as("tp"),
        col("__r.fp").as("fp"), col("__r.fn").as("fn"),
        (col("__n") - col("__r.tp") - col("__r.fp") - col("__r.fn"))
          .as("tn"),
        round(col("__r.tp").cast("double") /
          (col("__r.tp") + col("__r.fp")), 6).as("precision"),
        round(col("__r.tp").cast("double") /
          (col("__r.tp") + col("__r.fn")), 6).as("recall"),
        round(lit(2.0) * col("__r.tp").cast("double") /
          (col("__r.tp") * 2 + col("__r.fp") + col("__r.fn")), 6)
          .as("f1"))
  }

  /** Calibration (reliability) curve: rows ranked by score into
    * `nBuckets` equal-count buckets by EXACT integer rank arithmetic
    * ((rank−1)·B div n — never ntile's remainder spreading ambiguity),
    * then per bucket the mean predicted score vs the observed positive
    * rate. `scoreMicro` must be the score pre-quantized to an exact
    * integer unit (e.g. floor(score·10⁶)) — score sums stay exact
    * integers, the two means are final double divisions. `tie` totally
    * orders equal scores. Rows with a NULL score are excluded (ranked
    * NULLS FIRST they would silently fill the lowest bucket).
    *
    * Scale shape — the [[aucExact]] / `Robust.quantilesAtScale`
    * discipline, NEVER a per-row global rank: one (score → count,
    * Σlabel) hash aggregation with map-side partials, a cumulative
    * window over the ≤ distinct-scores SKETCH only, and bucket
    * assignment by closed-form integer rank ranges on the cumulative
    * counts. A distinct score whose rank span stays inside one bucket
    * (all but at most nBuckets−1 of them — each of the B−1 interior
    * boundaries splits at most one score) is aggregated straight from
    * its sketch row. Only the boundary-straddling scores join back to
    * their data rows, ranked WITHIN the score by `tie` (a window
    * partitioned by score — per-score groups, never a global sort) to
    * decide which side of the boundary each row lands on — bit-for-bit
    * the same buckets as ranking every row, at sketch cost. Output
    * per bucket, ascending: bucket, n, n_pos, avg_score_micro
    * (round 6), pos_rate (round 6). */
  def calibrationCurve(df: DataFrame, scoreMicro: Column, label: Column,
                       tie: Column, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "need at least two calibration buckets")
    val rows = df.select(scoreMicro.cast("long").as("__m"),
        label.cast("long").as("__y"), tie.as("__t"))
      .where(col("__m").isNotNull)
    // distinct-score sketch: per score its row count, label sum, rows
    // BEFORE it (cumulative window over sketch rows only), and total n
    val byScore = rows.groupBy("__m")
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__p"))
    val cum = byScore
      .withColumn("__cb",
        coalesce(sum(col("__c")).over(Window.orderBy(col("__m"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy()))
      // first/last global rank of this score is __cb+1 / __cb+__c, so its
      // bucket span is [__bLo, __bHi] by the same (r−1)·B div n arithmetic
      .withColumn("__bLo", expr(s"(__cb * $nBuckets) div __n"))
      .withColumn("__bHi", expr(s"((__cb + __c - 1) * $nBuckets) div __n"))
    // scores fully inside one bucket: bucket partials straight off the
    // sketch (Σm over c equal rows = m·c, exact in DECIMAL(38,0))
    val whole = cum.where(col("__bLo") === col("__bHi"))
      .select(col("__bLo").as("bucket"), col("__c").as("__pn"),
        col("__p").as("__pp"),
        (col("__m").cast(D38) * col("__c").cast(D38)).cast(D38).as("__pm"))
    // boundary-straddling scores (≤ nBuckets−1): rank within the score by
    // tie — the only per-row window, partitioned by score, never global
    val splits = cum.where(col("__bLo") =!= col("__bHi"))
      .select(col("__m"), col("__cb"), col("__n"))
    val splitPart = rows.join(broadcast(splits), "__m")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__m")).orderBy(col("__t"))))
      // global rank of this row = __cb + __rn (all smaller scores precede)
      .withColumn("bucket",
        expr(s"((__cb + CAST(__rn AS BIGINT) - 1) * $nBuckets) div __n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("__pn"), sum(col("__y")).as("__pp"),
        sum(col("__m").cast(D38)).cast(D38).as("__pm"))
    whole.unionByName(splitPart)
      .groupBy("bucket")
      .agg(sum(col("__pn")).as("n"),
        coalesce(sum(col("__pp")), lit(0L)).as("n_pos"),
        round(sum(col("__pm")).cast("double") / sum(col("__pn")), 6)
          .as("avg_score_micro"),
        round(sum(col("__pp")).cast("double") / sum(col("__pn")), 6)
          .as("pos_rate"))
  }
}
