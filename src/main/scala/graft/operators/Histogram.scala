package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable equi-width histogram: approximate quantiles as a FIRST-CLASS
  * mergeable bin table — the distribution member of the portable-sketch
  * family ([[Hll]] distincts, [[Bloom]] membership, [[Cms]] frequencies).
  * Spark's `approx_percentile` / `percentile_approx` hide a KLL-style
  * buffer inside an aggregate; here the sketch IS a DataFrame of
  * (bucket, n) over fixed [lo, hi) cent bounds, so shard/day histograms
  * union-merge by a plain sum, persist beside the data, and are verified
  * BIN-FOR-BIN by an independent engine (the q197 oracle replays every
  * bucket in DuckDB from the same integer arithmetic).
  *
  * All bucket math is exact BIGINT over integer cents
  * (floor(value·100)): bucket = (clamped offset)·nBins / (hi − lo) with
  * the offset clamped into [0, hi−lo) BEFORE the multiply — identical on
  * both engines (no floating-point boundary drift) and overflow-free for
  * ANY input value (clamp-after-multiply would wrap a corrupted extreme
  * into the wrong bucket; the oracle's BIGINT would error instead of
  * wrapping). NULL values are excluded from the sketch — a NULL is
  * "unknown", not the minimum; count them separately
  * ([[Profile.columns]]).
  *
  * 100 TB shape: one map pass + one ≤ nBins-row hash aggregation with
  * map-side partials. [[quantiles]] turns a bin table into rank-based
  * estimates with error ≤ one bin width — computed over the ≤ nBins rows
  * themselves in ONE pass, no second scan of the data.
  */
object Histogram {

  private def checkParams(loCents: Long, hiCents: Long, nBins: Int): Unit = {
    require(hiCents > loCents, s"need lo < hi, got [$loCents, $hiCents)")
    require(nBins >= 2 && nBins <= (1 << 20), s"nBins out of range: $nBins")
    require(hiCents - loCents <= Long.MaxValue / nBins,
      s"(hi - lo) * nBins must stay under 2^63: [$loCents, $hiCents) x $nBins")
  }

  /** The shared exact-BIGINT bucket expression over a cents column name:
    * clamp the offset into [0, span−1], THEN multiply — one definition for
    * [[bins]] and [[assignEquiDepth]] so the two can never drift. SQL
    * `div` keeps the division in BIGINT (`/` on longs detours through
    * double, whose rounding an independent engine need not reproduce at
    * bucket boundaries). */
  private def bucketSql(centsCol: String, loCents: Long, hiCents: Long,
                        nBins: Int): String = {
    val span = hiCents - loCents
    s"(least(CAST(${span - 1} AS BIGINT), greatest(CAST(0 AS BIGINT), " +
      s"$centsCol - $loCents)) * $nBins) div $span"
  }

  /** Bin table (bucket: long, n: long) for `value` (a numeric column,
    * binned on integer cents) over fixed bounds [loCents, hiCents).
    * Out-of-range values clamp into the first/last bucket, so non-null
    * mass is conserved; NULLs are excluded. Buckets no value fell into
    * are absent (implicit 0). */
  def bins(df: DataFrame, value: Column, loCents: Long, hiCents: Long,
           nBins: Int): DataFrame = {
    checkParams(loCents, hiCents, nBins)
    df.select(floor(value * 100).cast("long").as("__cents"))
      .where(col("__cents").isNotNull)
      .selectExpr(s"${bucketSql("__cents", loCents, hiCents, nBins)} AS bucket")
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** Merge bin tables over the same bounds: sum per bucket. */
  def merge(bins: DataFrame): DataFrame =
    bins.groupBy("bucket").agg(sum(col("n")).as("n"))

  /** Rank-based quantile estimates from a bin table: for each q in `qs`,
    * the midpoint (in cents) of the first bucket whose cumulative count
    * reaches ceil(q·N) — error bounded by one bin width. One pass over
    * the ≤ nBins bin rows (single-partition window + a ≤ |qs|-row literal
    * band join on the SKETCH, not the data — the bins lineage evaluates
    * once however many quantiles are asked). */
  def quantiles(bins: DataFrame, loCents: Long, hiCents: Long, nBins: Int,
                qs: Seq[Double]): DataFrame = {
    checkParams(loCents, hiCents, nBins)
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.size <= 100, s"at most 100 quantiles per call, got ${qs.size}")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    val cum = bins.select(col("bucket"), col("n"),
      sum("n").over(w).as("cum"), sum("n").over(
        Window.orderBy(lit(1)).rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).as("total"))
    val width = (hiCents - loCents).toDouble / nBins
    val spark = bins.sparkSession
    import spark.implicits._
    val qdf = qs.toDF("q") // ≤ 100-row literal relation: hygiene-exempt
    cum.crossJoin(qdf)
      .where(col("cum") >= ceil(col("total") * col("q")))
      .groupBy("q").agg(min(col("bucket")).as("__b"))
      .select(col("q"),
        (lit(loCents) + (col("__b") + 0.5) * width).as("est_cents"))
  }

  /** Equi-DEPTH bucket map from an equi-width bin table: bin → depth
    * bucket in [1, nBuckets], where a bin lands in the bucket of its
    * FIRST element's global rank (NTILE-style: rank r → bucket
    * ⌊(r−1)·nBuckets/N⌋+1). Exact BIGINT arithmetic on the cumulative
    * counts, so an independent engine reproduces the map bit-for-bit.
    * Bucket boundaries are approximate to one equi-width bin (a bin never
    * splits across depth buckets) — the standard sketch-based feature
    * binning trade: no global sort, error ≤ one bin width.
    *
    * The cumulative window runs on the ≤ nBins sketch rows themselves
    * (single partition by design — it is a sketch, not the data). */
  def equiDepthMap(bins: DataFrame, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"need nBuckets >= 2, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.orderBy(lit(1)).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    bins.select(col("bucket"), col("n"), sum("n").over(w).as("__cum"),
        sum("n").over(tot).as("__total"))
      .selectExpr("bucket",
        s"((__cum - n) * $nBuckets) div __total + 1 AS depth")
  }

  /** Assign every row of `df` its equi-depth bucket: bins `value` with the
    * SAME [[bucketSql]] arithmetic as [[bins]], then equi-joins the
    * broadcast ≤ nBins-row [[equiDepthMap]] — a map-side operation at any
    * data scale (the two passes over `df` — histogram build, then
    * assignment — are the canonical sketch-then-apply shape). Output:
    * `df`'s columns + depth; rows whose value is NULL keep a NULL depth
    * (the map join is left, and every non-null bucket is present in the
    * map by construction — it was built from the same rows). */
  def assignEquiDepth(df: DataFrame, value: Column, loCents: Long,
                      hiCents: Long, nBins: Int, nBuckets: Int): DataFrame = {
    checkParams(loCents, hiCents, nBins)
    val m = equiDepthMap(bins(df, value, loCents, hiCents, nBins), nBuckets)
    df.withColumn("__cents", floor(value * 100).cast("long"))
      .withColumn("bucket",
        expr(bucketSql("__cents", loCents, hiCents, nBins)))
      .join(broadcast(m), Seq("bucket"), "left")
      .drop("bucket", "__cents")
  }

  /** Population stability index between two sides of a bucketed count
    * table — THE distribution-drift alarm every feature/label pipeline
    * runs between a reference window and a current one. Input: one row
    * per (groupCols, bucket) with exact counts `na` (reference) and `nb`
    * (current); PSI(g) = Σ_buckets (pa − pb)·ln(pa/pb) over buckets
    * nonzero on BOTH sides (one-sided buckets are reported in
    * `n_onesided`, not silently folded into an infinity). The per-bucket
    * terms are the only floats, and the sum runs as a SORTED array fold
    * (collect ≤ nBins structs per group, sort by bucket, left-fold) — a
    * fixed evaluation order both engines replay, immune to partition-
    * order float drift. Output: groupCols ++ (n_onesided, psi).
    */
  def psi(bucketCounts: DataFrame, groupCols: Seq[String]): DataFrame = {
    val tot = bucketCounts.groupBy(groupCols.map(col): _*)
      .agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    val pa = col("na").cast("double") / col("ta")
    val pb = col("nb").cast("double") / col("tb")
    bucketCounts.join(tot, groupCols)
      .withColumn("__term",
        when(col("na") > 0 && col("nb") > 0, (pa - pb) * log(pa / pb)))
      .groupBy(groupCols.map(col): _*)
      .agg(count(when(col("__term").isNull, 1)).as("n_onesided"),
        count(col("__term")).as("__nt"),
        aggregate(
          transform(array_sort(collect_list(
            when(col("__term").isNotNull, struct(col("bucket"), col("__term"))))),
            x => x.getField("__term")),
          lit(0.0), (a, c) => a + c).as("__fold"))
      // NO mutually-nonzero bucket at all = the distributions are disjoint:
      // report NULL (unknown/maximal — and what the DuckDB twin's
      // NULL-propagating list fold yields), never a reassuring 0.0
      .withColumn("psi", when(col("__nt") > 0, col("__fold")))
      .drop("__nt", "__fold")
  }
}
