package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML featurization operators — the transforms a training pipeline runs
  * between the warehouse and the trainer: category target encoding,
  * rank-based score normalization, and the feature-hashing trick. All
  * three are deliberately exact/deterministic (integer sufficient
  * statistics, total-ordered ranks, the portable md5 hash family) so
  * features are reproducible run-to-run and engine-to-engine — silent
  * feature drift between a backfill and a serving job is the classic
  * training/serving-skew bug.
  *
  * The reference engine has no feature surface (pure OLAP); this is
  * beyond-parity capability in the q191/q193/q202 family.
  */
object Features {

  /** Leave-one-out target encoding: each row's category is replaced by
    * the mean target of the OTHER rows sharing it — (Σy − y)/(n − 1) —
    * the standard leakage guard (plain per-category means let a row see
    * its own label; LOO removes it without a fold split). Singleton
    * categories encode NULL (no other rows to learn from — callers
    * impute the global mean downstream, explicitly).
    *
    * `target` must be integral (0/1 labels, cents): sufficient
    * statistics are exact BIGINT sums, the encode is one final double
    * division rounded to 6. NULL targets are NOT counted: the
    * denominator is the count of OTHER NON-NULL-target rows in the
    * category (counting unlabeled rows while the sum skips them would
    * silently bias enc toward 0), and a NULL-target row — leakage-free
    * by construction, it has no label to leak — encodes the plain mean
    * of the category's labeled rows. enc is NULL exactly when no other
    * labeled row shares the category.
    *
    * One (category) hash aggregation + one join-back keyed by the
    * category. The aggregate side is category-cardinality rows and
    * carries NO pinned broadcast hint: AQE broadcasts it from its
    * MEASURED size (the Robust.winsorizedAtScale join-back discipline)
    * — real vocabularies broadcast, a high-cardinality key (user id,
    * URL) degrades to the shuffle join instead of OOMing the driver,
    * and no probe job runs at DataFrame-construction time. A NULL
    * category forms its own group (same contract as Privacy.kAnonymity)
    * — the join-back is NULL-SAFE, so null-category rows encode against
    * the other null-category rows instead of silently vanishing from
    * the feature table. Output: all input columns ++ enc. */
  def targetEncodeLoo(df: DataFrame, catCol: String, target: Column)
      : DataFrame = {
    val stats = df.groupBy(col(catCol).as("__cat"))
      .agg(sum(target.cast("long")).as("__sy"),
        count(target.cast("long")).as("__nn"))
    df.withColumn("__y", target.cast("long"))
      .join(stats, col(catCol) <=> col("__cat"))
      .withColumn("__nd",
        col("__nn") - when(col("__y").isNotNull, 1L).otherwise(0L))
      .withColumn("enc",
        when(col("__nd") > 0,
          round((col("__sy") - coalesce(col("__y"), lit(0L)))
            .cast("double") / col("__nd"), 6)))
      .drop("__y", "__cat", "__sy", "__nn", "__nd")
  }

  /** Rank-based normalization: value → its percentile position within
    * the group, pr = (rank − 1)/(n − 1) ∈ [0, 1] — the monotone,
    * outlier-immune feature scaling (z-scores chase whales; ranks
    * don't). `tie` must totally order equal values so the feature is
    * partition-order-independent; a singleton group maps to 0.5 (the
    * only defensible midpoint). A NULL value gets a NULL pr AND stays
    * out of the ranking entirely (window NULLS FIRST would otherwise
    * encode "missing" as "smallest ever seen" and shift every real
    * rank) — a missing measurement must surface as missing. One
    * exchange + sort per group (rank window) over the non-null rows,
    * exact integer ranks, one final double division rounded to 6.
    * Output: all input columns ++ pr. */
  def rankNormalize(df: DataFrame, groupCols: Seq[String], value: Column,
                    tie: Column): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df.where(value.isNotNull)
      .withColumn("__rn", row_number().over(w.orderBy(value, tie)))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("pr",
        when(col("__n") === 1, 0.5)
          .otherwise(round((col("__rn") - 1).cast("double") /
            (col("__n") - 1), 6)))
      .drop("__rn", "__n")
    ranked.unionByName(
      df.where(value.isNull).withColumn("pr", lit(null).cast("double")))
  }

  /** [[rankNormalize]] WITHOUT the one-reducer-per-group sort — same
    * contract (pr = (rank−1)/(n−1) over a caller-supplied total order,
    * singleton group → 0.5, NULL values excluded from the ranking and
    * surfaced with pr NULL), ranks computed by Rank.atScalePerGroup's
    * two-phase range-partitioned rank. The plain window is right when
    * groups are many and small; THIS is right when groups are few and
    * huge (3 return flags over 100 TB = 3 reducers on the window path).
    * The group row count n rides out of the rank's own count aggregate
    * — no second scan. Output: all input columns ++ pr. */
  def rankNormalizeAtScale(df: DataFrame, groupCols: Seq[String],
                           value: Column, tie: Column): DataFrame = {
    val ranked = Rank.atScalePerGroup(df.where(value.isNotNull),
        groupCols, Seq(value, tie), out = "__rn", totalOut = "__n")
      .withColumn("pr",
        when(col("__n") === 1, 0.5)
          .otherwise(round((col("__rn") - 1).cast("double") /
            (col("__n") - 1), 6)))
      .drop("__rn", "__n")
    ranked.unionByName(
      df.where(value.isNull).withColumn("pr", lit(null).cast("double")))
  }

  /** The feature-hashing trick: SPACE-separated tokens (split on the
    * single literal space — the corpus operators' shared tokenization;
    * pre-normalize other whitespace upstream so training and serving
    * split identically) → a fixed `dim`-wide
    * sparse vector with SIGNED collision resolution — index = h mod dim,
    * sign = ±1 from the next hash bit, cell = Σ sign (signed sums make
    * colliding tokens cancel in expectation instead of biasing up — the
    * Weinberger et al. construction). The hash is the portable md5-
    * derived 60-bit family, so the same text maps to the same vector in
    * ANY engine — the reproducibility contract feature pipelines need.
    * Map-side explode + one (id, index) hash aggregation; output rows =
    * touched cells (a fully-cancelled cell keeps its exact 0 — dropping
    * it would make the vector depend on collision luck). `dim` must be
    * a power of two ≤ 2^20 (mod and
    * sign-bit stay exact bit slices). Output: (idCol, idx, weight). */
  def hashFeatures(df: DataFrame, idCol: String, textCol: String,
                   dim: Int): DataFrame = {
    require(dim >= 2 && (dim & (dim - 1)) == 0 && dim <= (1 << 20),
      s"dim must be a power of two in [2, 2^20], got $dim")
    val bits = java.lang.Integer.numberOfTrailingZeros(dim)
    val h = TextDedup.portableHash60(col("__tok"))
    // one digest per TOKEN: spread the map stage (no-op at cluster scale)
    graft.Db.spread(df)
      .select(col(idCol), explode(split(col(textCol), " ")).as("__tok"))
      .where(col("__tok") =!= "")
      .select(col(idCol), (h % dim).as("idx"),
        when(shiftright(h, bits) % 2 === 0, 1L).otherwise(-1L)
          .as("__sign"))
      .groupBy(col(idCol), col("idx"))
      .agg(sum(col("__sign")).as("weight"))
  }

  /** Model-based quality-filter inference — the CCNet/fastText-style
    * pretraining stage: score every document with a LINEAR classifier
    * over its [[hashFeatures]] vector and keep those past the decision
    * threshold. The model arrives as a weight TABLE (idx, w) — trained
    * offline by any trainer; because the serving features are the
    * portable hash family, training and serving vectors match
    * bit-for-bit in any engine (the training/serving-skew guard this
    * family exists for).
    *
    * margin = Σ_idx cell(idx)·w(idx) summed in ASCENDING idx order
    * (sorted fold — two engines summing the same doubles in the same
    * order agree bit-for-bit, so `keep` never flips on partition order),
    * score = round(margin + bias, 6), keep = 1 iff margin + bias >
    * `threshold` — thresholding the LOG-ODDS, which equals thresholding
    * sigmoid(margin + bias) at σ(threshold) without either engine
    * evaluating exp. Feature indexes missing from the weight table
    * contribute 0 (sparse models are fine); documents with no tokens
    * score round(bias, 6) with n_feat = 0.
    *
    * Plan: one map-side explode + one (id, idx) aggregation
    * (hashFeatures), an equi-join to the ≤dim-row weight table (AQE
    * broadcasts it from measured size — no pinned hint), one per-id
    * fold over ≤dim collected cells, and a left join back to the id
    * spine — map-shaped end to end, no global exchange.
    *
    * Output: (idCol, n_feat, score, keep). */
  def linearScore(df: DataFrame, idCol: String, textCol: String, dim: Int,
                  weights: DataFrame, bias: Double,
                  threshold: Double = 0.0): DataFrame = {
    val terms = hashFeatures(df, idCol, textCol, dim)
      .join(weights.select(col("idx"), col("w")), Seq("idx"))
      .select(col(idCol), col("idx"),
        (col("weight").cast("double") * col("w")).as("__t"))
    val margins = terms.groupBy(col(idCol))
      .agg(collect_list(struct(col("idx"), col("__t"))).as("__ts"))
      .select(col(idCol), size(col("__ts")).cast("long").as("__nf"),
        aggregate(array_sort(col("__ts")), lit(0.0),
          (acc, x) => acc + x.getField("__t")).as("__m"))
    df.select(col(idCol))
      .join(margins, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nf"), lit(0L)).as("n_feat"),
        round(coalesce(col("__m"), lit(0.0)) + bias, 6).as("score"),
        when(coalesce(col("__m"), lit(0.0)) + bias > threshold, 1L)
          .otherwise(0L).as("keep"))
  }

  /** [[linearScore]]'s DENSE path: the whole inference plan — feature
    * hashing, weight lookup, ascending-index fold — fused into ONE
    * codegen expression per row (functions.LinearMargin), bit-for-bit
    * equal to the table path by construction. No explode, no join, no
    * aggregation: a pure projection, which means (a) zero shuffles at
    * any corpus size and (b) STREAM-SAFE in append mode — the quality
    * filter runs at ingest, before a document ever lands. Use the table
    * path when the model is sparse or too wide to ship as a dense
    * array; use this when it fits (dim ≤ 2^20 = 8 MB of weights riding
    * the plan as a reference object). Output: (idCol, n_feat, score,
    * keep) — identical to [[linearScore]] when the weight array covers
    * every index the table covers (a zero-filled dense array of a
    * sparse model scores identically, but n_feat here counts every
    * TOUCHED cell while the table path counts only table-MATCHED
    * cells). A NULL text scores like an empty one (n_feat 0, score =
    * bias) — same contract as the table path's left join. */
  def linearScoreDense(df: DataFrame, idCol: String, textCol: String,
                       dim: Int, weights: Array[Double], bias: Double,
                       threshold: Double = 0.0): DataFrame = {
    val lm = org.apache.spark.sql.GraftShims.column(
      graft.functions.LinearMargin(
        org.apache.spark.sql.GraftShims.expression(split(col(textCol), " ")),
        dim, weights))
    df.select(col(idCol), lm.as("__lm"))
      .select(col(idCol),
        coalesce(col("__lm.n_feat"), lit(0L)).as("n_feat"),
        round(coalesce(col("__lm.margin"), lit(0.0)) + bias, 6).as("score"),
        when(coalesce(col("__lm.margin"), lit(0.0)) + bias > threshold, 1L)
          .otherwise(0L).as("keep"))
  }

  /** [[portableWeights]] as the dense array [[linearScoreDense]] ships:
    * w(j) = (h60("w"+j) mod 2001 − 1000) / 1000, computed driver-side
    * through the SAME md5 kernel the column formula uses, so the three
    * representations (array, weight table, oracle SQL) are bit-equal. */
  def portableWeightsArray(dim: Int, salt: String = "w"): Array[Double] =
    Array.tabulate(dim) { j =>
      (graft.functions.Portable.hash60(
        (salt + j.toString).getBytes("UTF-8")) % 2001 - 1000).toDouble / 1000
    }

  /** A deterministic, ENGINE-PORTABLE weight table for [[linearScore]]:
    * w(idx) = (h60("w"+idx) mod 2001 − 1000) / 1000 ∈ [−1, 1] in exact
    * 0.001 steps — md5-derived like the hash family, so a DuckDB oracle
    * regenerates every weight in-query (no out-of-band model file). A
    * stand-in with the exact shape of a served model: the gate proves
    * the inference plumbing bit-for-bit; a real deployment passes its
    * trained table instead. */
  def portableWeights(spark: org.apache.spark.sql.SparkSession,
                      dim: Int, salt: String = "w"): DataFrame =
    spark.range(dim).select(col("id").as("idx"),
      ((TextDedup.portableHash60(concat(lit(salt), col("id").cast("string")))
        % 2001 - 1000).cast("double") / 1000).as("w"))
}
