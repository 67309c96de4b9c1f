package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-sufficient-statistics correlation and feature-selection
  * operators. Every count and sum is an exact integer (BIGINT sums are
  * widened to DECIMAL(38,0) where a cluster-scale row count would pass
  * 2^63), aggregated map-side-partial in ONE pass regardless of partition
  * order; the only floats are the final closed-form divisions, written in
  * a fixed evaluation order so the DuckDB oracle replays them bit-exact.
  *
  * Reference anchor: the reference exposes SUM/AVG/MIN/MAX/COUNT only
  * (/root/reference/src/expressions/aggregates/); correlation, feature
  * scoring and serial-correlation analysis are beyond-parity additions a
  * training-data pipeline needs (feature audit, vocabulary selection,
  * drift detection).
  */
object Stats {

  private val D38 = "decimal(38,0)"
  private def d38(c: Column): Column = c.cast(D38)

  /** Pairwise Pearson correlation matrix over measures that are ALREADY
    * exact integers (cents, counts — the exactness contract lives at the
    * input, as in [[Regress.olsByGroup]]). ONE full-width aggregation
    * computes every sufficient statistic (n, Σxᵢ, Σxᵢ², Σxᵢxⱼ for i<j) as
    * DECIMAL(38,0) sums — map-side partial, one shuffle to a single row —
    * then each pair's coefficient is the closed form
    *
    *   r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))
    *
    * evaluated factor-by-factor in double. m measures cost m(m+3)/2+1
    * aggregate buffers in the same pass — for the typical feature-audit
    * width (≤ 32 measures) that is one cheap scan at any scale, never a
    * per-pair pass. Output: (col_a, col_b, n, corr) for i<j in input
    * order; zero-variance columns yield null corr on both engines.
    */
  def corrMatrix(df: DataFrame, measures: Seq[(String, Column)]): DataFrame = {
    require(measures.size >= 2, "corrMatrix needs at least two measures")
    val names = measures.map(_._1)
    // NOT spread (measured r15): shuffling the full measure rows before
    // the partial aggregation cost more than the single-task decimal
    // products saved (2.2 s vs 1.2 s at sf0.1) — the aggregate collapses
    // everything map-side, so the one-task scan stage is the cheaper shape
    val base = df.select(measures.map { case (n, c) =>
      c.cast("long").as(s"__$n") }: _*)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        names.map(n => sum(d38(col(s"__$n"))).as(s"s_$n")) ++
        names.map(n =>
          sum(d38(col(s"__$n")) * d38(col(s"__$n"))).as(s"ss_$n")) ++
        names.combinations(2).map { case Seq(a, b) =>
          sum(d38(col(s"__$a")) * d38(col(s"__$b"))).as(s"sp_${a}_$b")
        }.toSeq
    val row = base.agg(aggs.head, aggs.tail: _*)
    val pairs = names.combinations(2).map { case Seq(a, b) =>
      val num = (d38(col("n")) * col(s"sp_${a}_$b") -
        col(s"s_$a") * col(s"s_$b")).cast("double")
      def varOf(m: String) = (d38(col("n")) * col(s"ss_$m") -
        col(s"s_$m") * col(s"s_$m")).cast("double")
      val den = sqrt(varOf(a)) * sqrt(varOf(b))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        round(num / when(den === 0.0, lit(null)).otherwise(den), 6)
          .as("corr"))
    }.toSeq
    row.select(col("n"), explode(array(pairs: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("n"), col("p.corr"))
  }

  /** Per-group Pearson correlation between two already-integer columns —
    * [[corrMatrix]]'s closed form with a group key, e.g. lag-k serial
    * correlation after a window-lag pairing. One aggregation, one shuffle
    * on the group key. Output: groupCols ++ (n, corr). */
  def corrByGroup(df: DataFrame, groupCols: Seq[String], x: Column,
                  y: Column): DataFrame = {
    val s = df
      .select(groupCols.map(col) :+ x.cast("long").as("__x")
        :+ y.cast("long").as("__y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(d38(col("__x"))).as("sx"), sum(d38(col("__y"))).as("sy"),
        sum(d38(col("__x")) * d38(col("__y"))).as("sxy"),
        sum(d38(col("__x")) * d38(col("__x"))).as("sxx"),
        sum(d38(col("__y")) * d38(col("__y"))).as("syy"))
    val num = (d38(col("n")) * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val den = sqrt((d38(col("n")) * col("sxx") - col("sx") * col("sx"))
        .cast("double")) *
      sqrt((d38(col("n")) * col("syy") - col("sy") * col("sy"))
        .cast("double"))
    s.select(groupCols.map(col) ++ Seq(col("n"),
      round(num / when(den === 0.0, lit(null)).otherwise(den), 6)
        .as("corr")): _*)
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group: D = max over
    * observed values of |CDF_a − CDF_b| — the distribution-drift test
    * that needs no binning choice (the complement of the PSI gate's
    * fixed buckets, [[Histogram.psi]]). Both CDFs come from exact
    * integer cumulative counts over ONE sorted (group, value) window
    * (single exchange on the group); each |diff| is one fixed-form
    * double expression and the final MAX is order-independent by
    * definition — no float-summation ordering to pin at all. Input:
    * (groupCols, side ('a'/'b'), value); output groupCols ++ (ta, tb,
    * ks). A group with an empty side yields NULL ks (0-denominator CDF →
    * NULL on both engines): the test is undefined, not "no drift". */
  def ksTwoSample(df: DataFrame, groupCols: Seq[String], side: Column,
                  value: Column): DataFrame = {
    val g = groupCols.map(col)
    val counts = df
      .select(g :+ side.as("__s") :+ value.as("__v"): _*)
      .groupBy(g :+ col("__v"): _*)
      .agg(count(when(col("__s") === "a", 1)).as("na"),
        count(when(col("__s") === "b", 1)).as("nb"))
    val tot = counts.groupBy(g: _*)
      .agg(sum("na").as("ta"), sum("nb").as("tb"))
    val w = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("ca", sum(col("na")).over(w))
      .withColumn("cb", sum(col("nb")).over(w))
      .join(tot, groupCols)
      .withColumn("__d",
        abs(col("ca").cast("double") / col("ta") -
          col("cb").cast("double") / col("tb")))
      .groupBy(g: _*)
      .agg(max(col("ta")).as("ta"), max(col("tb")).as("tb"),
        round(max(col("__d")), 6).as("ks"))
  }

  /** CUPED-adjusted experiment readout: per-arm means of a metric with
    * the variance-reduction adjustment ȳ' = ȳ_arm − θ·(x̄_arm − x̄_all),
    * where x is a pre-period covariate and θ = cov(x,y)/var(x) is pooled
    * over ALL units (the standard CUPED estimator — Deng et al., WSDM
    * 2013). Inputs are already-integer unit rows (keyCol, arm, x, y);
    * every sufficient statistic (per-arm n/Σx/Σy, pooled n/Σx/Σy/Σxy/Σx²)
    * is an exact DECIMAL(38,0) sum from TWO hash aggregations — θ and
    * the means are the only floats, each a fixed-order expression, so an
    * independent engine replays the readout bit-for-bit. Output: (arm,
    * n, mean_y, adj_mean_y) rounded to 6, one row per arm. */
  def cupedMeans(units: DataFrame, armCol: String, x: Column,
                 y: Column): DataFrame = {
    val base = units.select(col(armCol).as("arm"),
      x.cast("long").as("__x"), y.cast("long").as("__y"))
    val pooled = base.agg(count(lit(1)).as("np"),
      sum(d38(col("__x"))).as("px"), sum(d38(col("__y"))).as("py"),
      sum(d38(col("__x")) * d38(col("__y"))).as("pxy"),
      sum(d38(col("__x")) * d38(col("__x"))).as("pxx"))
    val thetaDen = (d38(col("np")) * col("pxx") - col("px") * col("px"))
      .cast("double")
    val theta = (d38(col("np")) * col("pxy") - col("px") * col("py"))
      .cast("double") /
      when(thetaDen === 0.0, lit(null)).otherwise(thetaDen)
    val xbarAll = col("px").cast("double") / col("np")
    val byArm = base.groupBy("arm").agg(count(lit(1)).as("n"),
      sum(d38(col("__x"))).as("sx"), sum(d38(col("__y"))).as("sy"))
    byArm.crossJoin(broadcast(
        pooled.select(theta.as("__theta"), xbarAll.as("__xall"))))
      .select(col("arm"), col("n"),
        round(col("sy").cast("double") / col("n"), 6).as("mean_y"),
        round(col("sy").cast("double") / col("n") -
          col("__theta") * (col("sx").cast("double") / col("n") -
            col("__xall")), 6).as("adj_mean_y"))
  }

  /** Mutual information (and marginal entropies) between two categorical
    * columns, per group — the dependence audit for categorical pairs that
    * [[corrMatrix]] (numeric) and [[chi2TopItems]] (per-item selection)
    * don't cover: "does `source` leak `lang`?" before a split ships.
    *
    *   MI = Σ_cells (c_xy/N)·ln(c_xy·N/(c_x·c_y)),
    *   H(x) = −Σ (c_x/N)·ln(c_x/N)   (nats)
    *
    * Counts are exact from three hash aggregations over the CELL table
    * (cells once, marginals from cells — never a second data scan); each
    * float sum is an array_sort-then-fold over the cell/marginal structs
    * (the q220 PSI discipline: FIXED summation order, so the result is
    * partition-order-independent and a DuckDB list_sort/list_reduce
    * replays it bit-for-bit). Cell cardinality = |x-domain|·|y-domain|
    * per group — categorical domains, so collect_list is bounded; for
    * open domains bucket first. Output: groupCols ++ (n, n_cells, mi,
    * h_x, h_y), rounded to 6. */
  def mutualInfo(df: DataFrame, groupCols: Seq[String], x: Column,
                 y: Column): DataFrame = {
    require(groupCols.nonEmpty, "mutualInfo needs at least one group column")
    val g = groupCols.map(col)
    val base = df.select(g :+ x.as("__x") :+ y.as("__y"): _*)
    val cells = base.groupBy(g :+ col("__x") :+ col("__y"): _*)
      .agg(count(lit(1)).as("cxy"))
    val mx = cells.groupBy(g :+ col("__x"): _*).agg(sum("cxy").as("cx"))
    val my = cells.groupBy(g :+ col("__y"): _*).agg(sum("cxy").as("cy"))
    val tot = cells.groupBy(g: _*).agg(sum("cxy").as("n"))
    def fold(terms: Column) = aggregate(terms, lit(0.0), (a, c) => a + c)
    val miDf = cells
      .join(mx, groupCols :+ "__x").join(my, groupCols :+ "__y")
      .join(tot, groupCols)
      .withColumn("__t",
        (col("cxy").cast("double") / col("n")) *
          log((col("cxy").cast("double") * col("n")) /
            (col("cx").cast("double") * col("cy"))))
      .groupBy(g: _*)
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_cells"),
        fold(transform(
          array_sort(collect_list(struct(col("__x"), col("__y"), col("__t")))),
          z => z.getField("__t"))).as("mi"))
    def entropy(marg: DataFrame, kc: String, cc: String, out: String) =
      marg.join(tot, groupCols)
        .withColumn("__t",
          (col(cc).cast("double") / col("n")) *
            log(col(cc).cast("double") / col("n")) * lit(-1.0))
        .groupBy(g: _*)
        .agg(fold(transform(
          array_sort(collect_list(struct(col(kc), col("__t")))),
          z => z.getField("__t"))).as(out))
    miDf
      .join(entropy(mx, "__x", "cx", "h_x"), groupCols)
      .join(entropy(my, "__y", "cy", "h_y"), groupCols)
      .select(g ++ Seq(col("n"), col("n_cells"), round(col("mi"), 6).as("mi"),
        round(col("h_x"), 6).as("h_x"), round(col("h_y"), 6).as("h_y")): _*)
  }

  /** Time-decayed counters: per group, Σ over events of 2^(−age div h) —
    * weight HALVES for every full `halflifeDays` of age (staircase
    * exponential decay; the staircase keeps every weight an EXACT power
    * of two, so there is no libm `pow` whose last-ulp could differ
    * between engines). The recency-weighted popularity/engagement
    * score. Ages are bucketed to exact integer half-life steps first
    * (one hash aggregation of exact counts — ≤ horizon distinct steps
    * per group); the decayed sum is then a SORTED-array fold over those
    * (step, count) pairs: fixed float order, each division by an exact
    * 2^step BIGINT, DuckDB-replayable bit-for-bit. Steps past 62 weigh
    * 0 (< 5·10⁻¹⁹ — below any meaningful signal, above the shift's
    * range). NEGATIVE ages (clock skew, events stamped after the
    * reference instant) clamp to step 0 — weight 1.0, same as age 0 —
    * rather than reaching shiftleft, where Spark masks a negative shift
    * count (1L << -1 = 2^63 → garbage weights) while DuckDB's `<<`
    * raises; the clamp keeps both engines on the same defined value.
    * Output: groupCols ++ (n, decayed) rounded to 6. */
  def decayedCounts(df: DataFrame, groupCols: Seq[String], ageDays: Column,
                    halflifeDays: Int): DataFrame = {
    require(halflifeDays >= 1, "halflife must be >= 1 day")
    val g = groupCols.map(col)
    df.select(g :+ ageDays.cast("long").as("__age"): _*)
      // `div`, not `/`: integral division without a double detour;
      // greatest(0, ·): the negative-age clamp documented above
      .withColumn("__step",
        expr(s"greatest(CAST(0 AS BIGINT), __age div $halflifeDays)"))
      .groupBy(g :+ col("__step"): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(g: _*)
      .agg(sum(col("__c")).as("n"),
        // SQL-text fold: the DataFrame shiftleft() only takes a literal
        // shift count, the SQL form takes the per-element step column
        round(expr(
          """aggregate(
            |  transform(array_sort(collect_list(struct(__step, __c))),
            |    z -> IF(z.__step > 62, CAST(0 AS DOUBLE),
            |            CAST(z.__c AS DOUBLE) /
            |            CAST(shiftleft(CAST(1 AS BIGINT),
            |                           CAST(z.__step AS INT)) AS DOUBLE))),
            |  CAST(0 AS DOUBLE), (a, t) -> a + t)""".stripMargin), 6)
          .as("decayed"))
  }

  /** Sample-ratio-mismatch (SRM) audit — THE first experiment health
    * check: do the observed split/arm counts match the designed
    * allocation? χ² = Σ (obsₖ − n·pₖ)² / (n·pₖ) over the declared
    * splits; a large χ² (≳ 3.84 at 1 df, ≳ 5.99 at 2) means the
    * assignment itself is broken and every downstream metric is
    * untrustworthy. Counting is one exact hash aggregation; the k
    * float terms sum as a SORTED fold (by split name — the q220
    * discipline, replayed term-for-term by a SQL oracle). Splits
    * observed in the data but not declared fail loudly (they ARE the
    * mismatch); declared-but-absent splits contribute their full
    * expected mass. Output (1 row): n, k, chi2 (round 6). */
  def srmChi2(df: DataFrame, splitCol: Column,
              expectedPermille: Seq[(String, Int)]): DataFrame = {
    require(expectedPermille.nonEmpty &&
      expectedPermille.map(_._2).sum == 1000 &&
      expectedPermille.forall(_._2 > 0),
      "expected allocation must be positive per-mille weights summing to 1000")
    // a duplicated name would fan out the full_outer join and silently
    // double-count n
    require(expectedPermille.map(_._1).distinct.size == expectedPermille.size,
      "split names must be distinct")
    val obs = df.select(splitCol.as("__s"))
      .groupBy("__s").agg(count(lit(1)).as("__c"))
    val exp = obs.sparkSession.createDataFrame(expectedPermille)
      .toDF("__s", "__p")
    // the undeclared-split guard lives INSIDE the count column so column
    // pruning can never drop it
    val joined = obs.join(exp, Seq("__s"), "full_outer")
      .select(col("__s"),
        when(col("__p").isNull,
          raise_error(concat(lit("srmChi2: undeclared split '"),
            col("__s"), lit("' observed — the assignment is broken"))))
          .otherwise(coalesce(col("__c"), lit(0L))).as("__c"),
        coalesce(col("__p"), lit(0)).as("__p"))
    joined
      .agg(sum(col("__c")).as("n"), count(lit(1)).as("k"),
        array_sort(collect_list(struct(col("__s"), col("__c"),
          col("__p")))).as("__arr"))
      .select(col("n"), col("k"),
        // n is a plain outer column here, so the fold lambda may use it
        expr(
          """round(aggregate(__arr, CAST(0 AS DOUBLE),
            |  (a, z) -> a + (CAST(z.__c AS DOUBLE) -
            |                 CAST(n * z.__p AS DOUBLE) / 1000) *
            |                (CAST(z.__c AS DOUBLE) -
            |                 CAST(n * z.__p AS DOUBLE) / 1000) /
            |                (CAST(n * z.__p AS DOUBLE) / 1000)), 6)"""
            .stripMargin).as("chi2"))
  }

  /** Exponentially-weighted moving average (EWMA) baseline per group:
    * the recursive smooth aₜ = aₜ₋₁ + (xₜ − aₜ₋₁)/alphaDen over each
    * group's series in `orderCol` order, initialized at the first
    * observation — the telemetry baseline behind "is today's count
    * anomalous?" alerts (its staircase cousin [[decayedCounts]] weights
    * EVENTS by age; this smooths a VALUE series). The recursion is
    * order-dependent by definition, so it runs as ONE sorted-array fold
    * per group (the q220 sorted-fold discipline): fixed float order,
    * every step the same two IEEE ops on both engines — with alphaDen a
    * power of two the division is exact halving, and a SQL oracle's
    * list_reduce replays the fold bit-for-bit. NaN is the
    * uninitialized-state sentinel (x = NaN inputs are the caller's bug).
    * One exchange on the group key; per-key state is its own series
    * (callers at unbounded-history scale window the series first).
    * `orderCol` must be unique per group — equal order keys would leave
    * the fold order data-dependent. Output: groupCols ++ (n_points,
    * ewma) rounded to 6. */
  def ewmaBaseline(df: DataFrame, groupCols: Seq[String], orderCol: Column,
                   value: Column, alphaDen: Int = 8): DataFrame = {
    require(alphaDen >= 2, "alphaDen must be >= 2 (alpha = 1/alphaDen <= 0.5)")
    val g = groupCols.map(col)
    df.select(g :+ orderCol.as("__o") :+ value.cast("double").as("__x"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_points"),
        round(expr(
          s"""aggregate(
             |  transform(array_sort(collect_list(struct(__o, __x))),
             |    z -> z.__x),
             |  CAST('NaN' AS DOUBLE),
             |  (a, x) -> IF(isnan(a), x, a + (x - a) / $alphaDen.0))"""
            .stripMargin), 6).as("ewma"))
  }

  /** Exact Gini coefficient per group over non-negative integer values:
    *
    *   G = (2·Σᵢ i·xᵢ) / (n·Σx) − (n+1)/n,   xᵢ sorted ascending
    *
    * — the inequality audit (how concentrated is corpus mass across
    * sources, spend across users, tokens across documents). The rank
    * weights come from ONE sorted window per group (row_number with a
    * tie column, so ties are totally ordered and both engines agree);
    * Σ i·xᵢ and Σx are exact DECIMAL(38,0) sums (i·x reaches n·max·n at
    * cluster scale), and G is a single fixed-order double expression.
    * Output: groupCols ++ (n, gini) rounded to 6; an all-zero group is
    * NULL (0-mass inequality is undefined, not zero), a single-row
    * group is 0 by the formula. */
  def giniByGroup(df: DataFrame, groupCols: Seq[String], value: Column,
                  tie: Column): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("__v"), col("__tie"))
    val ranked = df
      .select(g :+ value.cast("long").as("__v") :+ tie.as("__tie"): _*)
      .withColumn("__i", row_number().over(w))
    val s = ranked.groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(d38(col("__v"))).as("sx"),
        sum(d38(col("__i")) * d38(col("__v"))).as("six"))
    val den = (d38(col("n")) * col("sx")).cast("double")
    s.select(g ++ Seq(col("n"),
      round(
        (lit(2.0) * col("six").cast("double")) /
          when(den === 0.0, lit(null)).otherwise(den) -
          (col("n") + 1).cast("double") / col("n"), 6).as("gini")): _*)
  }

  /** χ² feature selection: score each (item, class) association from the
    * 2×2 presence contingency table, keeping the top-k items per class.
    * Input is DISTINCT (id, class, item) presence triples (each id has
    * exactly one class). With a = |ids of class with item|, tc = |ids
    * with item|, lc = |ids of class|, N = |ids|:
    *
    *   χ² = N·(a·d − b·c)² / (tc·(N−tc)·lc·(N−lc)),
    *   b = tc−a, c = lc−a, d = N−tc−lc+a
    *
    * a·d−b·c = a·N − tc·lc stays an exact BIGINT below ~3·10⁹ ids; the
    * square and the four-factor denominator are computed in double with a
    * FIXED parenthesization, so both engines emit identical bits. Scale
    * shape: one distinct on (id, item, class), two hash aggregations on
    * item / (item, class), one broadcast of the per-class totals (|classes|
    * rows), then [[graft.plans.TopK.perKey]] bounded heaps — no global
    * sort, no per-item pass. minDf prunes the long tail of singleton
    * items before the join, the same guard a 100-TB vocabulary needs.
    */
  def chi2TopItems(presence: DataFrame, idCol: String, classCol: String,
                   itemCol: String, minDf: Long, k: Int): DataFrame = {
    val pres = presence
      .select(col(idCol).as("__id"), col(classCol).as("cls"),
        col(itemCol).as("item")).distinct()
    val byItem = pres.groupBy("item")
      .agg(count(lit(1)).as("tc"))
      .where(col("tc") >= minDf)
    val byItemClass = pres.groupBy("item", "cls")
      .agg(count(lit(1)).as("a"))
    val ids = pres.select("__id", "cls").distinct()
    val byClass = ids.groupBy("cls").agg(count(lit(1)).as("lc"))
    val n = ids.groupBy().agg(count(lit(1)).as("n_total"))
    val scored = byItemClass
      .join(byItem, Seq("item"))
      .join(broadcast(byClass), Seq("cls"))
      .crossJoin(broadcast(n))
      .withColumn("det",
        col("a") * col("n_total") - col("tc") * col("lc"))
      .withColumn("__den",
        (col("tc").cast("double") *
          (col("n_total") - col("tc")).cast("double")) *
          (col("lc").cast("double") *
            (col("n_total") - col("lc")).cast("double")))
      .withColumn("chi2", round(
        (col("n_total").cast("double") *
          (col("det").cast("double") * col("det").cast("double"))) /
          when(col("__den") === 0.0, lit(null)).otherwise(col("__den")), 4))
      .select("cls", "item", "a", "chi2")
      // an item present in EVERY id (or a single-class input) has zero
      // marginal variance — uninformative, dropped on both engines
      .where(col("chi2").isNotNull)
    graft.plans.TopK.perKey(scored, Seq("cls"),
      Seq(("chi2", false), ("item", true)), k)
  }
}
