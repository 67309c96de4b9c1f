package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal warehouse operators: SCD2 history build from a changelog,
  * touch-attribution carries, and fixed-interval resampling with forward
  * fill. All three are single-shuffle window pipelines — one exchange on
  * the entity key, then sorted, streaming window evaluation — so the same
  * plan holds on a 1000-executor cluster: no self-joins, no driver
  * collects, state per key bounded by the window frame (a single carried
  * value for the IGNORE NULLS carries).
  *
  * The reference engine has no temporal surface (SkinnerDB is a read-only
  * OLAP join engine, /root/reference/src/catalog/CatalogManager.java);
  * these are beyond-parity training-pipeline operators in the q183/q184
  * (as-of / interval join) family.
  */
object Temporal {

  /** Build an SCD2 (type-2 slowly-changing-dimension) history from a
    * changelog: rows are compacted to CHANGE rows (the attribute differs
    * from the previous row of the same key), then each change opens a
    * version valid [valid_from, valid_to), with the key's latest version
    * left open (valid_to null = current).
    *
    * `tie` breaks equal timestamps deterministically (e.g. an event id) —
    * without it the compaction itself would be nondeterministic under
    * partition-order changes. Output: keyCols ++ (attr, valid_from,
    * valid_to).
    */
  def scd2(changelog: DataFrame, keyCols: Seq[String], ts: Column,
           tie: Column, attr: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ts, tie)
    val compacted = changelog
      .withColumn("__prev", lag(attr, 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= attr)
    compacted
      .withColumn("valid_from", ts)
      .withColumn("valid_to", lead(ts, 1).over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(ts, tie)))
      .select(keyCols.map(col) ++ Seq(attr.as("attr"),
        col("valid_from"), col("valid_to")): _*)
  }

  /** Carry the most recent (and the earliest) non-null `touch` value of
    * the same key STRICTLY BEFORE each row — the last-touch / first-touch
    * attribution primitive. Adds `last_touch` / `first_touch` columns;
    * rows with no prior touch get null. One window, rows frame
    * [unbounded, -1], so conversion rows never attribute to themselves.
    */
  def attributionCarry(events: DataFrame, keyCols: Seq[String], ts: Column,
                       tie: Column, touch: Column): DataFrame = {
    val frame = Window.partitionBy(keyCols.map(col): _*).orderBy(ts, tie)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(frame))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(frame))
  }

  /** Resample per-key observations onto a dense fixed-interval grid and
    * forward-fill the last observed value. `spans` must carry one row per
    * key with inclusive grid bounds (`start`, `stop`, already truncated to
    * the grid unit); `obs` at most one row per (key, slot): callers pick
    * the per-slot representative first (deterministically — see the q212
    * gate). The grid explodes `sequence(start, stop, step)` — per-key
    * memory is the span slot count, so callers bound the span, not the
    * data volume. Output: keyCols ++ (slot, filled).
    */
  def resampleFfill(spans: DataFrame, obs: DataFrame, keyCols: Seq[String],
                    step: Column, slotCol: String = "slot",
                    valueCol: String = "value"): DataFrame = {
    val grid = spans.select(keyCols.map(col) :+
      explode(sequence(col("start"), col("stop"), step)).as(slotCol): _*)
    val carry = Window.partitionBy(keyCols.map(col): _*).orderBy(col(slotCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, keyCols :+ slotCol, "left")
      .withColumn("filled", last(col(valueCol), ignoreNulls = true).over(carry))
      .select(keyCols.map(col) ++ Seq(col(slotCol), col("filled")): _*)
  }

  /** Linear-interpolation gap fill on the [[resampleFfill]] grid: every
    * EMPTY interior slot (both an earlier and a later observation exist
    * for the key) gets value
    *
    *   pv + (nv − pv) · (t − tp)/(tn − tp)
    *
    * from its nearest observed neighbors — the fill that respects trends
    * where forward-fill steps. Neighbor values ride in as exact integers
    * (cents); the time fractions are exact microsecond longs; the single
    * double expression is evaluated in one FIXED order, so a SQL twin
    * reproduces it bit-for-bit. Three IGNORE-NULLS window carries over
    * ONE (key, slot) sort — same single-exchange shape as the other
    * window pipelines here. Inputs: spans (keyCols, start, stop), obs
    * (keyCols, slotCol, valueCol integer). Output: keyCols ++ (slot, pv,
    * nv, interp) for the filled slots only. */
  def resampleInterp(spans: DataFrame, obs: DataFrame, keyCols: Seq[String],
                     step: Column, slotCol: String = "slot",
                     valueCol: String = "cents"): DataFrame = {
    val grid = spans.select(keyCols.map(col) :+
      explode(sequence(col("start"), col("stop"), step)).as(slotCol): _*)
    val base = Window.partitionBy(keyCols.map(col): _*).orderBy(col(slotCol))
    val wPrev = base.rowsBetween(Window.unboundedPreceding, -1)
    val wNext = base.rowsBetween(1, Window.unboundedFollowing)
    val us = (c: Column) => unix_micros(c.cast("timestamp"))
    // each neighbor's (value, slot) rides ONE struct carry per frame —
    // two Window passes over the shared sort, not four
    val obsStruct = when(col(valueCol).isNotNull,
      struct(col(valueCol).as("v"), col(slotCol).as("t")))
    grid.join(obs, keyCols :+ slotCol, "left")
      .withColumn("__p", last(obsStruct, ignoreNulls = true).over(wPrev))
      .withColumn("__n", first(obsStruct, ignoreNulls = true).over(wNext))
      .withColumn("pv", col("__p.v")).withColumn("pslot", col("__p.t"))
      .withColumn("nv", col("__n.v")).withColumn("nslot", col("__n.t"))
      .where(col(valueCol).isNull && col("pv").isNotNull &&
        col("nv").isNotNull)
      .withColumn("interp", round(
        col("pv").cast("double") + (col("nv") - col("pv")).cast("double") *
          ((us(col(slotCol)) - us(col("pslot"))).cast("double") /
            (us(col("nslot")) - us(col("pslot"))).cast("double")), 4))
      .select(keyCols.map(col) ++ Seq(col(slotCol), col("pv"), col("nv"),
        col("interp")): _*)
  }

  /** Debounce a keyed event stream: keep a row iff it starts a burst —
    * no prior row of the same key within `gapMicros` of it (strictly
    * greater gap survives; an exact-gap row is part of the burst). The
    * dedup-by-proximity every telemetry/clickstream pipeline applies
    * before rate features. One lag window per key; exact integer
    * microsecond arithmetic. */
  def debounce(events: DataFrame, keyCols: Seq[String], ts: Column,
               tie: Column, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ts, tie)
    events
      .withColumn("__pts", lag(ts, 1).over(w))
      .where(col("__pts").isNull ||
        (unix_micros(ts.cast("timestamp")) -
          unix_micros(col("__pts").cast("timestamp"))) > gapMicros)
      .drop("__pts")
  }

  /** Diff two keyed snapshots (at most one row per key per side, columns
    * (key, value)): every key classified added / removed / changed /
    * unchanged, with the per-key value delta. ONE full-outer hash join on
    * the key — the dataset-versioning audit between two materializations,
    * co-partitionable with the snapshots' own layout at cluster scale.
    * Output: (key, status, old_value, new_value). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
                   valueCol: String): DataFrame = {
    // presence is carried explicitly: a key present WITH a NULL value must
    // classify by key existence (like the oracle's a.key IS NULL test),
    // not by the value column's own NULL-ness
    val a = oldSnap.select(col(keyCol).as("__k"), col(valueCol).as("old_value"))
      .withColumn("__inA", lit(true))
    val b = newSnap.select(col(keyCol).as("__k"), col(valueCol).as("new_value"))
      .withColumn("__inB", lit(true))
    a.join(b, Seq("__k"), "full_outer")
      .select(col("__k").as(keyCol),
        when(col("__inA").isNull, "added")
          .when(col("__inB").isNull, "removed")
          .when(!(col("old_value") <=> col("new_value")), "changed")
          .otherwise("unchanged").as("status"),
        col("old_value"), col("new_value"))
  }

  /** Bitemporal AS-OF reconstruction: the per-key value at VALID time V
    * as KNOWN at transaction time T — the late-arriving-correction query
    * ([[scd2]] tracks one time axis; real changelogs carry two: when a
    * fact was true vs when the system learned it). One filter on both
    * axes + one max_by argmax per key under the (valid_ts, recorded_ts,
    * tie) total order — a single hash aggregation, map-side partial, at
    * any scale. Inputs: changelog (keyCols, valid_ts, recorded_ts, tie,
    * value). Output: keyCols ++ (valid_ts, recorded_ts, value) of the
    * winning version per key (keys with no version visible at (V, T)
    * are absent). */
  def bitemporalAsOf(changelog: DataFrame, keyCols: Seq[String],
                     validAt: Column, knownAt: Column): DataFrame = {
    val g = keyCols.map(col)
    changelog
      .where(col("valid_ts") <= validAt && col("recorded_ts") <= knownAt)
      .groupBy(g: _*)
      .agg(max_by(
        struct(col("valid_ts"), col("recorded_ts"), col("value")),
        struct(col("valid_ts"), col("recorded_ts"), col("tie")))
        .as("__w"))
      .select(g ++ Seq(col("__w.valid_ts"), col("__w.recorded_ts"),
        col("__w.value")): _*)
  }

  /** Clamped running balance per key: balance_t = max(0, balance_{t−1} +
    * delta_t) — inventory with stock-outs, a wallet with no overdraft.
    * This recurrence is NOT a window function (the clamp makes each step
    * depend on the clamped previous step, so no frame computes it); it
    * is the q220-family sorted-array FOLD: one hash aggregation collects
    * each key's (ts, tie, delta) series, array_sort fixes the order, and
    * a single O(n) struct-accumulator fold carries (balance, clamp
    * count, peak) — identical code in DuckDB's list_reduce, so the gate
    * compares every field. Per-key state is the series itself
    * (collect_list) — the same bounded-series contract as SCD2/q220;
    * shard long-lived keys by time first if a key's history outgrows a
    * task. Output: keyCols ++ (n_events, final_balance, n_clamps,
    * peak_balance). */
  def clampedRunningBalance(events: DataFrame, keyCols: Seq[String],
                            ts: Column, tie: Column,
                            delta: Column): DataFrame = {
    val g = keyCols.map(col)
    events
      .select(g :+ ts.as("__ts") :+ tie.as("__tie")
        :+ delta.cast("long").as("__d"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col("__ts"), col("__tie"),
          col("__d")))).as("__evs"))
      .withColumn("__acc", expr(
        """aggregate(
          |  transform(__evs, x -> x.__d),
          |  named_struct('b', CAST(0 AS BIGINT), 'c', CAST(0 AS BIGINT),
          |               'p', CAST(0 AS BIGINT)),
          |  (a, d) -> named_struct(
          |    'b', greatest(CAST(0 AS BIGINT), a.b + d),
          |    'c', a.c + IF(a.b + d < 0, CAST(1 AS BIGINT),
          |                  CAST(0 AS BIGINT)),
          |    'p', greatest(a.p, greatest(CAST(0 AS BIGINT), a.b + d))))
          |""".stripMargin))
      .select(g ++ Seq(col("n_events"),
        col("__acc.b").as("final_balance"),
        col("__acc.c").as("n_clamps"),
        col("__acc.p").as("peak_balance")): _*)
  }

  /** Linear multi-touch attribution in EXACT INTEGER millionths — the
    * fair-split companion to [[attributionCarry]]'s first/last-touch
    * models: each conversion's 1,000,000 ppm of credit is divided equally
    * among the key's touches in the preceding `horizon`, with the
    * integer-division REMAINDER assigned to the LATEST touch (ts, then
    * tie desc) so every conversion's credits sum to exactly 10^6 and the
    * per-channel totals are partition-order-independent BIGINTs — no
    * float 1/n sums whose merge order could drift. Touchless conversions
    * keep their full credit under the `directChannel` label.
    *
    * Shape: one key-equi-join of conversions against touches + the
    * horizon band filter (per-key volumes bound the pair fan-out, the
    * q183/q184 family), one per-conversion count + latest-touch argmax
    * window, one (channel) hash aggregation. Inputs: conversions
    * (keyCols, ts, tie), touches (keyCols, ts, tie, channel). Output:
    * (channel, n_touches, n_conversions, credit_ppm). */
  def linearAttribution(conversions: DataFrame, touches: DataFrame,
                        keyCols: Seq[String], horizon: String,
                        directChannel: String = "direct"): DataFrame = {
    val conv = conversions.select(keyCols.map(col)
      :+ col("ts").as("__cts") :+ col("tie").as("__cid"): _*)
    val tch = touches.select(keyCols.map(col) :+ col("ts").as("__tts")
      :+ col("tie").as("__tid") :+ col("channel"): _*)
    val paired = conv.join(tch, keyCols)
      .where(col("__tts") <= col("__cts") &&
        col("__tts") > col("__cts") - expr(s"INTERVAL $horizon"))
    val w = Window.partitionBy(keyCols.map(col) :+ col("__cid"): _*)
    val wOrd = w.orderBy(col("__tts").desc, col("__tid").desc)
    val credited = paired
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(wOrd))
      // `div`, not `/`: Column./ on longs detours through double
      .withColumn("credit_ppm",
        expr("1000000 div __n") +
          when(col("__rn") === 1,
            lit(1000000L) % col("__n")).otherwise(0L))
    val touched = credited.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(struct(keyCols.map(col) :+ col("__cid"): _*))
          .as("n_conversions"),
        sum(col("credit_ppm")).as("credit_ppm"))
    val direct = conv
      .join(paired.select(keyCols.map(col) :+ col("__cid"): _*).distinct(),
        keyCols :+ "__cid", "left_anti")
      .agg(count(lit(1)).as("n_conversions"))
      .select(lit(directChannel).as("channel"), lit(0L).as("n_touches"),
        col("n_conversions"),
        (col("n_conversions") * 1000000L).as("credit_ppm"))
      .where(col("n_conversions") > 0)
    touched.unionByName(direct)
  }

  /** Sequential pattern mining: the top-k most frequent n-step item paths
    * across per-key ordered sequences (the "what do users do in three
    * steps" view q192's single-step transition matrix can't answer).
    * One exchange on the key, n−1 LEADs over the SAME sorted window (one
    * sort, shared frame), then a hash count of the joined path strings
    * and a global top-k — the n-gram join happens inside the codegen'd
    * window projection, never as a self-join, so the shape is two
    * shuffles at any scale. `order` must make each key's sequence total
    * (append a tiebreaker id). Output: (path, n) desc. */
  def pathNgrams(df: DataFrame, keyCols: Seq[String], order: Seq[Column],
                 item: Column, n: Int, k: Int,
                 sep: String = ">"): DataFrame = {
    require(n >= 2, "pathNgrams needs n >= 2")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val steps = (0 until n).map {
      case 0 => item.as("__s0")
      case i => lead(item, i).over(w).as(s"__s$i")
    }
    df.select(steps: _*)
      // ALL steps non-null — an interior null would otherwise slip past a
      // last-step-only check and concat_ws would collapse [A, null, C]
      // into the same "A>C" as a genuinely different sequence
      .where((0 until n).map(i => col(s"__s$i").isNotNull).reduce(_ && _))
      .select(concat_ws(sep, (0 until n).map(i => col(s"__s$i")): _*)
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
  }

  /** Ordered-subsequence funnel (CEP-lite): per key, how many times does
    * the event stream complete the pattern step1 → step2 → … → stepP,
    * steps in order but NOT necessarily adjacent, matches greedy and
    * non-overlapping (each event advances at most one pattern pointer —
    * the MATCH_RECOGNIZE `A B C` skip-to-next-row semantics every funnel
    * dashboard means). Counting is ONE integer fold over the key's
    * time-ordered items with the state packed into a single BIGINT
    * (acc = completions·P + pointer; a step match is exactly acc+1 —
    * the q251 packed-scalar discipline, so a SQL oracle's list_reduce
    * replays it without struct accumulators). `tie` totally orders
    * equal timestamps. One exchange on the key; per-key state is its
    * own event sequence (the sessionization bound — a key's history
    * must fit an executor, never the whole table). Output: keyCols ++
    * (n_events, completions, stage) where stage = steps already matched
    * toward the NEXT completion. */
  def sequenceFunnel(df: DataFrame, keyCols: Seq[String], ts: Column,
                     tie: Column, item: Column,
                     pattern: Seq[String]): DataFrame = {
    require(pattern.nonEmpty, "pattern needs at least one step")
    // the steps are interpolated into a SQL expr: a quote would break the
    // literal, a backslash would be DECODED by the SQL string parser
    // (\n -> newline) and silently never match its events
    require(pattern.forall(s => !s.contains("'") && !s.contains("\\")),
      "pattern steps must not contain single quotes or backslashes")
    val g = keyCols.map(col)
    val p = pattern.size
    val arr = pattern.map(s => s"'$s'").mkString("array(", ", ", ")")
    df.select(g :+ ts.as("__ts") :+ tie.as("__tie")
        :+ item.as("__it"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col("__ts"), col("__tie"),
          col("__it")))).as("__evs"))
      .withColumn("__acc", expr(
        s"""aggregate(
           |  transform(__evs, z -> z.__it),
           |  CAST(0 AS BIGINT),
           |  (a, x) -> a + IF(x = element_at($arr,
           |                     CAST(a % $p AS INT) + 1),
           |                   CAST(1 AS BIGINT), CAST(0 AS BIGINT)))
           |""".stripMargin))
      .select(g ++ Seq(col("n_events"),
        expr(s"__acc div $p").as("completions"),
        (col("__acc") % p).as("stage")): _*)
  }
}
