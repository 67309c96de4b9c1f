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
  * (floor(value·100)): bucket = clamp((cents − lo)·nBins / (hi − lo)),
  * identical on both engines — no floating-point boundary drift.
  *
  * 100 TB shape: one map pass + one ≤ nBins-row hash aggregation with
  * map-side partials. [[quantiles]] turns a bin table into rank-based
  * estimates with error ≤ one bin width — computed over the ≤ nBins rows
  * themselves, no second scan of the data.
  */
object Histogram {

  private def checkParams(loCents: Long, hiCents: Long, nBins: Int): Unit = {
    require(hiCents > loCents, s"need lo < hi, got [$loCents, $hiCents)")
    require(nBins >= 2 && nBins <= (1 << 20), s"nBins out of range: $nBins")
  }

  /** Bin table (bucket: long, n: long) for `value` (a numeric column,
    * binned on integer cents) over fixed bounds [loCents, hiCents).
    * Out-of-range values clamp into the first/last bucket, so mass is
    * conserved. Buckets no value fell into are absent (implicit 0). */
  def bins(df: DataFrame, value: Column, loCents: Long, hiCents: Long,
           nBins: Int): DataFrame = {
    checkParams(loCents, hiCents, nBins)
    val cents = floor(value * 100).cast("long")
    df.select((cents - loCents).as("__off"))
      // SQL `div` keeps the division in exact BIGINT — `/` on longs would
      // detour through double, whose rounding an independent engine need
      // not reproduce at bucket boundaries
      .selectExpr(s"least(CAST(${nBins - 1} AS BIGINT), " +
        s"greatest(CAST(0 AS BIGINT), " +
        s"(__off * $nBins) div ${hiCents - loCents})) AS bucket")
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** Merge bin tables over the same bounds: sum per bucket. */
  def merge(bins: DataFrame): DataFrame =
    bins.groupBy("bucket").agg(sum(col("n")).as("n"))

  /** Rank-based quantile estimates from a bin table: for each q in `qs`,
    * the midpoint (in cents) of the first bucket whose cumulative count
    * reaches ceil(q·N) — error bounded by one bin width. Runs entirely
    * over the ≤ nBins bin rows (single-partition window on a sketch-sized
    * input, NOT on the data). */
  def quantiles(bins: DataFrame, loCents: Long, hiCents: Long, nBins: Int,
                qs: Seq[Double]): DataFrame = {
    checkParams(loCents, hiCents, nBins)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    val cum = bins.select(col("bucket"), col("n"),
      sum("n").over(w).as("cum"), sum("n").over(
        Window.orderBy(lit(1)).rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).as("total"))
    val width = (hiCents - loCents).toDouble / nBins
    val frames = qs.map { q =>
      cum.where(col("cum") >= ceil(col("total") * q))
        .orderBy("bucket").limit(1)
        .select(lit(q).as("q"),
          (lit(loCents) + (col("bucket") + 0.5) * width).as("est_cents"))
    }
    frames.reduce(_ union _)
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
    * same arithmetic as [[bins]], then equi-joins the broadcast ≤ nBins-row
    * [[equiDepthMap]] — a map-side operation at any data scale (the two
    * passes over `df` — histogram build, then assignment — are the
    * canonical sketch-then-apply shape). Output: `df`'s columns + depth. */
  def assignEquiDepth(df: DataFrame, value: Column, loCents: Long,
                      hiCents: Long, nBins: Int, nBuckets: Int): DataFrame = {
    val m = equiDepthMap(bins(df, value, loCents, hiCents, nBins), nBuckets)
    df.withColumn("__cents", floor(value * 100).cast("long"))
      // same exact-BIGINT `div` bucket arithmetic as [[bins]]
      .withColumn("bucket", expr(
        s"least(CAST(${nBins - 1} AS BIGINT), greatest(CAST(0 AS BIGINT), " +
        s"((__cents - $loCents) * $nBins) div ${hiCents - loCents}))"))
      .join(broadcast(m), "bucket")
      .drop("bucket", "__cents")
  }
}
