package graft.queries

import graft.Db
import org.apache.spark.sql.functions._

/** Event-table analytics — batch expression of the streaming surface
  * (SURVEY §2.8: the reference has no streaming at all). The same windowed
  * aggregations run incrementally under Structured Streaming in
  * graft.streaming.EventStreams; these batch twins are the oracle-checkable
  * versions.
  */
object Events {

  val all: Seq[Q] = Seq(
    // --- tumbling-window aggregation (batch twin of a streaming window agg)
    Q("q40_events_hourly", Some("""
      SELECT date_trunc('hour', ts) AS hour, event_type,
        count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY hour, event_type ORDER BY hour, event_type"""),
      (s, dir) => Db(s, dir).events
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
        .orderBy("hour", "event_type")),

    // --- per-user leaderboard over a filtered event type
    Q("q41_events_top_users", Some("""
      SELECT user_id, count(*) AS n_purchases,
        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
      ORDER BY total_spent DESC, user_id LIMIT 20"""),
      (s, dir) => Db(s, dir).events
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total_spent"))
        .orderBy(col("total_spent").desc, col("user_id"))
        .limit(20)),

    // --- semi-structured JSON extraction from the props column
    Q("q42_events_json", Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      FROM events ORDER BY event_id LIMIT 500"""),
      (s, dir) => Db(s, dir).events
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .orderBy("event_id").limit(500)),

    // --- sessionization: gaps-and-islands with a 30-minute inactivity gap
    //     (window-function formulation; streaming twin uses state timeouts)
    Q("q43_events_sessions", Some("""
      WITH marked AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                 OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    > INTERVAL 30 MINUTE
               THEN 1 ELSE 0 END AS new_session
        FROM events),
      sess AS (
        SELECT user_id, ts,
          CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM marked)
      SELECT user_id, session_id, count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val cum = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val prev = lag(col("ts"), 1).over(byUser)
        Db(s, dir).events
          .withColumn("new_session",
            when(prev.isNull || col("ts") - prev > expr("INTERVAL 30 MINUTE"), 1).otherwise(0))
          .withColumn("session_id", sum(col("new_session")).over(cum))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min("ts").as("session_start"), max("ts").as("session_end"))
          .orderBy("user_id", "session_id")
      }),

    // --- q94: daily cohort retention — users cohorted by first-active day,
    //     distinct-active counts for the cohort day and the three following
    //     days (the classic product-analytics matrix)
    Q("q94_cohort_retention", Some("""
      WITH firstw AS (
        SELECT user_id, date_trunc('day', min(ts)) AS cohort
        FROM events GROUP BY 1),
      act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS w FROM events)
      SELECT cohort,
        CAST(count(DISTINCT CASE WHEN w = cohort THEN act.user_id END) AS BIGINT) AS w0,
        CAST(count(DISTINCT CASE WHEN w = cohort + INTERVAL 1 DAY THEN act.user_id END) AS BIGINT) AS w1,
        CAST(count(DISTINCT CASE WHEN w = cohort + INTERVAL 2 DAY THEN act.user_id END) AS BIGINT) AS w2,
        CAST(count(DISTINCT CASE WHEN w = cohort + INTERVAL 3 DAY THEN act.user_id END) AS BIGINT) AS w3
      FROM firstw JOIN act ON firstw.user_id = act.user_id
      GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val ev = Db(s, dir).events
        val firstw = ev.groupBy("user_id")
          .agg(date_trunc("day", min(col("ts"))).as("cohort"))
        val act = ev.select(col("user_id"),
          date_trunc("day", col("ts")).as("w")).distinct()
        def wk(k: Int) = countDistinct(
          when(col("w") === col("cohort") + expr(s"INTERVAL $k DAY"),
            col("user_id"))).as(s"w$k")
        firstw.join(act, "user_id")
          .groupBy("cohort")
          .agg(wk(0), wk(1), wk(2), wk(3))
          .orderBy("cohort")
      }),

    // --- q183: as-of join (operators/AsOfJoin) — every event tagged with
    //     the user's most recent purchase at or before it (the attribution
    //     join). One union + per-key window, never an inequality join; the
    //     DuckDB oracle is its native ASOF JOIN, tie-broken identically by
    //     the per-(user, ts) max-payload dedup.
    Q("q183_asof_join", Some("""
      WITH p AS (
        SELECT user_id, ts AS pts, max(event_id) AS purchase_id
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT e.event_id, e.user_id, p.purchase_id
      FROM events e ASOF LEFT JOIN p
        ON e.user_id = p.user_id AND e.ts >= p.pts
      ORDER BY e.event_id"""),
      (s, dir) => {
        val ev = Db(s, dir).events
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"),
            col("event_id").as("purchase_id"))
        graft.operators.AsOfJoin.asOf(
            ev.select("event_id", "user_id", "ts"), purchases,
            keys = Seq("user_id"), leftTs = "ts", rightTs = "pts")
          .select("event_id", "user_id", "purchase_id")
          .orderBy("event_id")
      }),

    // --- q184: interval-containment range join (operators/IntervalJoin) —
    //     purchases landing within 10 minutes after each error event for
    //     the same user (incident-impact attribution). Grid-bucketed
    //     equi-join on (user, time-cell); the oracle replays the naive
    //     BETWEEN formulation DuckDB can afford at this scale.
    Q("q184_interval_join", Some("""
      WITH err AS (
        SELECT event_id AS err_id, user_id, ts AS st,
               ts + INTERVAL 10 MINUTE AS en
        FROM events WHERE event_type = 'error'),
      pur AS (SELECT user_id, ts AS pts, event_id AS pid
              FROM events WHERE event_type = 'purchase')
      SELECT err_id, count(p.pid) AS n_purchases
      FROM err LEFT JOIN pur p
        ON p.user_id = err.user_id AND p.pts >= err.st AND p.pts <= err.en
      GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val ev = Db(s, dir).events
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id"),
            col("ts").as("st"),
            (col("ts") + expr("INTERVAL 10 MINUTE")).as("en"))
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"),
            col("event_id").as("pid"))
        val pairs = graft.operators.IntervalJoin.containmentJoin(
          err, pur, keys = Seq("user_id"), startCol = "st", endCol = "en",
          probeTs = "pts", bucketMicros = 600L * 1000 * 1000)
        err.join(pairs.groupBy("err_id").agg(count(col("pid")).as("n")),
            Seq("err_id"), "left")
          .select(col("err_id"),
            coalesce(col("n"), lit(0L)).as("n_purchases"))
          .orderBy("err_id")
      }),

    // --- q187: sequential funnel — users completing view -> click ->
    //     purchase IN ORDER, each step within 7 days of the first view.
    //     Three chained per-user min-aggregations + joins (no sequence
    //     self-join, no window over all events): each stage is one hash
    //     aggregation keyed on user, so the plan is three shuffles of the
    //     per-step event subsets however long the history.
    Q("q187_funnel", Some("""
      WITH v AS (SELECT user_id, min(ts) AS vt FROM events
                 WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > v.vt
              AND e.ts <= v.vt + INTERVAL 7 DAY GROUP BY 1),
      p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e
            JOIN v USING (user_id) JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > c.ct
              AND e.ts <= v.vt + INTERVAL 7 DAY GROUP BY 1)
      SELECT v.user_id, v.vt, c.ct, p.pt
      FROM v JOIN c USING (user_id) JOIN p USING (user_id)
      ORDER BY v.user_id"""),
      (s, dir) => {
        val ev = Db(s, dir).events
        val lim = expr("INTERVAL 7 DAY")
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("vt"))
        val c = ev.filter(col("event_type") === "click").join(v, "user_id")
          .where(col("ts") > col("vt") && col("ts") <= col("vt") + lim)
          .groupBy("user_id").agg(min("ts").as("ct"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(v, "user_id").join(c, "user_id")
          .where(col("ts") > col("ct") && col("ts") <= col("vt") + lim)
          .groupBy("user_id").agg(min("ts").as("pt"))
        v.join(c, "user_id").join(p, "user_id")
          .select("user_id", "vt", "ct", "pt").orderBy("user_id")
      }),

    // --- q188: rolling time-range features — per event, the user's event
    //     count and exact-decimal value sum over the trailing hour
    //     (range-framed window on epoch micros; per-user partitions, so no
    //     single-partition sort at any history length — the feature-
    //     engineering twin of sessionization).
    Q("q188_rolling_features", Some("""
      SELECT event_id,
        count(*) OVER w AS n_1h,
        CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts").cast("timestamp")))
          .rangeBetween(-3600L * 1000 * 1000, Window.currentRow)
        Db(s, dir).events
          .select(col("event_id"),
            count(lit(1)).over(w).as("n_1h"),
            sum(col("value").cast("decimal(12,2)")).over(w)
              .cast("double").as("sum_1h"))
          .orderBy("event_id")
      })
  )
}
