package graft.queries

import graft.Db
import graft.operators.{Robust, Temporal}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 temporal-warehouse gates over the events changelog: SCD2
  * history build, first/last-touch attribution, basket co-occurrence
  * (association-rule support/confidence/lift), fixed-interval resampling
  * with forward fill, and a MAD robust-outlier screen. Every gate is a
  * single- or two-shuffle window/aggregate pipeline with an exact DuckDB
  * oracle; doubles only appear as per-row arithmetic on deterministic
  * inputs or decimal-summed money (the Db.dec discipline).
  */
object WarehouseOps {

  val all: Seq[Q] = Seq(

    // --- q206: SCD2 (type-2 slowly-changing-dimension) history build from
    //     a changelog — compact each user's purchase stream to CHANGE rows
    //     (value differs from the previous row), open a version per change,
    //     close it when the next change arrives; the latest version stays
    //     open (valid_to null = current). One exchange on user_id, two
    //     sorted window passes. The gate aggregates versions per user
    //     decile: version counts, open (current) versions, and the exact
    //     integer-microsecond duration mass of the closed ones.
    Q("q206_scd2_history", Some("""
      WITH src AS (SELECT user_id, ts, event_id, value FROM events
                   WHERE event_type = 'purchase'),
      ch AS (SELECT *, lag(value) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS pv FROM src),
      chg AS (SELECT user_id, ts, event_id, value FROM ch
              WHERE pv IS NULL OR pv <> value),
      v AS (SELECT user_id, ts AS valid_from,
              lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS valid_to
            FROM chg)
      SELECT user_id % 10 AS bucket, count(*) AS n_versions,
        count(*) FILTER (WHERE valid_to IS NULL) AS n_current,
        CAST(sum(date_diff('microsecond', valid_from, valid_to)) AS BIGINT)
          AS sum_dur_us
      FROM v GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val src = Db(s, dir).events.where(col("event_type") === "purchase")
        Temporal.scd2(src, Seq("user_id"), col("ts"), col("event_id"),
            col("value"))
          .groupBy((col("user_id") % 10).as("bucket"))
          .agg(count(lit(1)).as("n_versions"),
            count(when(col("valid_to").isNull, 1)).as("n_current"),
            // unix_micros needs TIMESTAMP; the NTZ→TZ cast is a wall-clock
            // identity because GraftSession pins the session zone to UTC
            sum(unix_micros(col("valid_to").cast("timestamp")) -
              unix_micros(col("valid_from").cast("timestamp")))
              .as("sum_dur_us"))
          .orderBy("bucket")
      }),

    // --- q207: first/last-touch attribution — every purchase credits the
    //     user's most recent (and earliest) click/view STRICTLY before it,
    //     carried by one IGNORE NULLS window over the user's event stream:
    //     no join, no per-conversion scan, one exchange on user_id however
    //     long the histories get. Revenue sums in exact decimal.
    Q("q207_attribution", Some("""
      WITH e AS (SELECT user_id, ts, event_id, event_type, value,
                   CASE WHEN event_type IN ('click','view')
                        THEN event_type END AS touch
                 FROM events),
      c AS (SELECT *,
             first_value(touch IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
             last_value(touch IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
           FROM e)
      SELECT coalesce(ft, 'none') AS first_touch,
             coalesce(lt, 'none') AS last_touch,
             count(*) AS n_conv,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM c WHERE event_type = 'purchase' GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, dir) => {
        val e = Db(s, dir).events.withColumn("touch",
          when(col("event_type").isin("click", "view"), col("event_type")))
        Temporal.attributionCarry(e, Seq("user_id"), col("ts"),
            col("event_id"), col("touch"))
          .where(col("event_type") === "purchase")
          .groupBy(coalesce(col("first_touch"), lit("none")).as("first_touch"),
            coalesce(col("last_touch"), lit("none")).as("last_touch"))
          .agg(count(lit(1)).as("n_conv"),
            sum(Db.dec(col("value"))).cast("double").as("revenue"))
          .orderBy("first_touch", "last_touch")
      }),

    // --- q210: basket co-occurrence with association-rule stats — baskets
    //     are (user, hour); for every event-type pair, co-occurrence count,
    //     confidence n_ab/n_a and lift n_ab·N/(n_a·n_b). The pair join is
    //     keyed on the basket id (user, hour) — per-basket fan-out is
    //     bounded by the type vocabulary, never an all-pairs product over
    //     rows. Doubles are single divisions of exact integers.
    Q("q210_basket_cooccurrence", Some("""
      WITH b AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS h,
                   event_type FROM events),
      nb AS (SELECT count(DISTINCT (user_id, h)) AS n FROM b),
      n1 AS (SELECT event_type, count(*) AS n FROM b GROUP BY 1),
      p AS (SELECT a.event_type AS ta, b2.event_type AS tb, count(*) AS n_ab
            FROM b a JOIN b b2 ON a.user_id = b2.user_id AND a.h = b2.h
              AND a.event_type < b2.event_type
            GROUP BY 1, 2)
      SELECT ta, tb, n_ab,
        round(CAST(n_ab AS DOUBLE) / na.n, 6) AS conf,
        round(CAST(n_ab AS DOUBLE) * nb.n / (na.n * nb2.n), 6) AS lift
      FROM p JOIN n1 na ON na.event_type = ta
      JOIN n1 nb2 ON nb2.event_type = tb CROSS JOIN nb
      ORDER BY 1, 2"""),
      (s, dir) => {
        val b = Db(s, dir).events
          .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
            col("event_type")).distinct()
        val nb = b.select("user_id", "h").distinct().agg(count(lit(1)).as("nn"))
        val n1 = b.groupBy("event_type").agg(count(lit(1)).as("n"))
        val p = b.select(col("user_id"), col("h"), col("event_type").as("ta"))
          .join(b.select(col("user_id"), col("h"), col("event_type").as("tb")),
            Seq("user_id", "h"))
          .where(col("ta") < col("tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("n_ab"))
        p.join(broadcast(n1.select(col("event_type").as("ta"), col("n").as("na"))), Seq("ta"))
          .join(broadcast(n1.select(col("event_type").as("tb"), col("n").as("nbt"))), Seq("tb"))
          .crossJoin(broadcast(nb))
          .select(col("ta"), col("tb"), col("n_ab"),
            round(col("n_ab").cast("double") / col("na"), 6).as("conf"),
            round(col("n_ab").cast("double") * col("nn") /
              (col("na") * col("nbt")), 6).as("lift"))
          .orderBy("ta", "tb")
      }),

    // --- q212: fixed-interval resampling + forward fill — each sampled
    //     user's sparse purchase observations land on a dense hourly grid
    //     spanning their full activity window; empty slots carry the last
    //     observed value forward (null before the first purchase). The
    //     per-slot representative is the latest purchase in the hour
    //     (row_number, deterministic tie-break), the grid is an exploded
    //     sequence() — per-key memory is the span length, one exchange on
    //     user_id for the carry. Filled-value mass sums in exact decimal.
    Q("q212_resample_ffill", Some("""
      WITH u AS (SELECT user_id, date_trunc('hour', min(ts)) AS start,
                   date_trunc('hour', max(ts)) AS stop
                 FROM events WHERE user_id % 25 = 0 GROUP BY 1),
      grid AS (SELECT user_id, unnest(generate_series(start, stop,
                 INTERVAL 1 HOUR)) AS slot FROM u),
      obs AS (SELECT user_id, date_trunc('hour', ts) AS slot, value,
                row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                   ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE user_id % 25 = 0 AND event_type = 'purchase'),
      o1 AS (SELECT user_id, slot, value FROM obs WHERE rn = 1),
      f AS (SELECT g.user_id, g.slot,
              last_value(o1.value IGNORE NULLS) OVER
                (PARTITION BY g.user_id ORDER BY g.slot
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
            FROM grid g LEFT JOIN o1 ON o1.user_id = g.user_id
              AND o1.slot = g.slot)
      SELECT user_id, count(*) AS n_slots, count(filled) AS n_filled,
        CAST(sum(CAST(filled AS DECIMAL(12,2))) AS DOUBLE) AS sum_filled
      FROM f GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val ev = Db(s, dir).events.where(col("user_id") % 25 === 0)
        val spans = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("start"),
            date_trunc("hour", max(col("ts"))).as("stop"))
        val obs = ev.where(col("event_type") === "purchase")
          .withColumn("slot", date_trunc("hour", col("ts")))
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id", "slot")
              .orderBy(col("ts").desc, col("event_id").desc)))
          .where(col("rn") === 1).select("user_id", "slot", "value")
        Temporal.resampleFfill(spans, obs, Seq("user_id"),
            expr("INTERVAL 1 HOUR"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_slots"), count(col("filled")).as("n_filled"),
            sum(Db.dec(col("filled"))).cast("double").as("sum_filled"))
          .orderBy("user_id")
      }),

    // --- q213: MAD robust-outlier screen — exact per-type median and
    //     median-absolute-deviation by SORT-based rank selection (Spark's
    //     exact percentile buffers whole groups in memory; a window sort
    //     spills), then count rows beyond 3 MADs. Median of an even group
    //     is the mean of the two middle values — the same positional
    //     arithmetic the oracle replays.
    Q("q213_mad_outliers", Some("""
      WITH v AS (SELECT event_type, value, event_id,
                   count(*) OVER (PARTITION BY event_type) AS n,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn
                 FROM events),
      med AS (SELECT event_type, avg(value) AS med FROM v
              WHERE rn IN ((n+1)//2, (n+2)//2) GROUP BY 1),
      d AS (SELECT e.event_type, abs(e.value - m.med) AS dev, e.event_id,
              count(*) OVER (PARTITION BY e.event_type) AS n,
              row_number() OVER (PARTITION BY e.event_type
                                 ORDER BY abs(e.value - m.med), e.event_id) AS rn
            FROM events e JOIN med m USING (event_type)),
      mad AS (SELECT event_type, avg(dev) AS mad FROM d
              WHERE rn IN ((n+1)//2, (n+2)//2) GROUP BY 1)
      SELECT e.event_type, count(*) AS n,
        count(*) FILTER (WHERE abs(e.value - m.med) > 3 * md.mad) AS n_out,
        round(max(m.med), 6) AS med, round(max(md.mad), 6) AS mad
      FROM events e JOIN med m USING (event_type) JOIN mad md USING (event_type)
      GROUP BY 1 ORDER BY 1"""),
      (s, dir) =>
        Robust.madOutliers(
            Db(s, dir).events.select("event_type", "value", "event_id"),
            Seq("event_type"), col("value"), col("event_id"), k = 3.0)
          .select(col("event_type"), col("n"), col("n_out"),
            round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"))
          .orderBy("event_type")),

    // --- q223: per-user event debounce (Temporal.debounce) — a row
    //     survives iff no prior event of the same user landed within the
    //     hour before it (burst leaders only), the dedup-by-proximity
    //     applied before rate/count features. One lag window per user,
    //     exact integer microsecond gaps; strictly-greater survives.
    Q("q223_debounce", Some("""
      WITH x AS (SELECT user_id, ts, event_id,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        FROM events),
      k AS (SELECT user_id FROM x WHERE pts IS NULL
              OR date_diff('microsecond', pts, ts) > 3600000000),
      kept AS (SELECT user_id % 10 AS bucket, count(*) AS n_kept
               FROM k GROUP BY 1),
      raw AS (SELECT user_id % 10 AS bucket, count(*) AS n_raw
              FROM events GROUP BY 1)
      SELECT bucket, n_kept, n_raw FROM kept JOIN raw USING (bucket)
      ORDER BY 1"""),
      (s, dir) => {
        val ev = Db(s, dir).events
        val kept = Temporal.debounce(ev, Seq("user_id"), col("ts"),
            col("event_id"), gapMicros = 3600000000L)
          .groupBy((col("user_id") % 10).as("bucket"))
          .agg(count(lit(1)).as("n_kept"))
        val raw = ev.groupBy((col("user_id") % 10).as("bucket"))
          .agg(count(lit(1)).as("n_raw"))
        kept.join(raw, Seq("bucket")).orderBy("bucket")
      }),

    // --- q243: linear-interpolation gap fill (Temporal.resampleInterp)
    //     — q212's hourly grid, but every empty interior slot gets the
    //     trend value between its nearest observed neighbors:
    //     pv + (nv−pv)·(t−tp)/(tn−tp), neighbors as exact cents, time
    //     fractions as exact microseconds, ONE fixed-order double
    //     expression replayed bit-for-bit by the oracle. Three
    //     IGNORE-NULLS carries over one (key, slot) sort.
    Q("q243_resample_interp", Some("""
      WITH u AS (SELECT user_id, date_trunc('hour', min(ts)) AS start,
                   date_trunc('hour', max(ts)) AS stop
                 FROM events WHERE user_id % 25 = 0 GROUP BY 1),
      grid AS (SELECT user_id, unnest(generate_series(start, stop,
                 INTERVAL 1 HOUR)) AS slot FROM u),
      obs AS (SELECT user_id, date_trunc('hour', ts) AS slot,
                CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
                row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                   ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE user_id % 25 = 0 AND event_type = 'purchase'),
      o1 AS (SELECT user_id, slot, cents FROM obs WHERE rn = 1),
      j AS (SELECT g.user_id, g.slot, o1.cents FROM grid g
            LEFT JOIN o1 ON o1.user_id = g.user_id AND o1.slot = g.slot),
      w AS (SELECT user_id, slot, cents,
              last_value(cents IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY slot
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
              last_value(CASE WHEN cents IS NOT NULL THEN slot END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY slot
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pslot,
              first_value(cents IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY slot
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
              first_value(CASE WHEN cents IS NOT NULL THEN slot END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY slot
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nslot
            FROM j)
      SELECT user_id, slot, pv, nv,
        round(CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE) *
          (CAST(epoch_us(slot) - epoch_us(pslot) AS DOUBLE) /
           CAST(epoch_us(nslot) - epoch_us(pslot) AS DOUBLE)), 4) AS interp
      FROM w
      WHERE cents IS NULL AND pv IS NOT NULL AND nv IS NOT NULL
      ORDER BY user_id, slot"""),
      (s, dir) => {
        val ev = Db(s, dir).events.where(col("user_id") % 25 === 0)
        val spans = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("start"),
            date_trunc("hour", max(col("ts"))).as("stop"))
        val obs = ev.where(col("event_type") === "purchase")
          .withColumn("slot", date_trunc("hour", col("ts")))
          .withColumn("cents", (Db.dec(col("value")) * 100).cast("long"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id", "slot")
              .orderBy(col("ts").desc, col("event_id").desc)))
          .where(col("rn") === 1).select("user_id", "slot", "cents")
        Temporal.resampleInterp(spans, obs, Seq("user_id"),
            expr("INTERVAL 1 HOUR"))
          .orderBy("user_id", "slot")
      })
  )
}
