package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-window aggregations over the `events` table (SURVEY.md §2 Layer B
  * "Streaming"). These use the exact same `window`/`session_window`
  * expressions Structured Streaming uses, run here in batch mode so the
  * driver's DuckDB oracle can check them; `graft.streaming.Streams` runs the
  * same shapes incrementally with watermarks (MemoryStream-tested, per the
  * contract's streaming exclusion from oracleSql).
  */
object EventWindows {

  /** Tumbling window: 1-day buckets per event type. */
  val q32 = GraftQuery(
    "q32_tumbling_window",
    "Tumbling 1-day window count/sum per event_type (batch form of the streaming agg)",
    (s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("total_value"))
        .select(col("window.start").cast("timestamp_ntz").as("window_start"), col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start", "event_type"),
    Some("""
      SELECT time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS window_start,
             event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY window_start, event_type
      ORDER BY window_start, event_type"""))

  /** Sliding window: 1-day length, 12-hour slide → each event lands in two
    * overlapping buckets (epoch-aligned grids, exactly as Structured
    * Streaming assigns them). */
  val q33 = GraftQuery(
    "q33_sliding_window",
    "Sliding window (1 day / 12 h): overlapping bucket counts per event_type",
    (s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 day", "12 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("timestamp_ntz").as("window_start"), col("event_type"), col("n"))
        .orderBy("window_start", "event_type"),
    Some("""
      WITH assigned AS (
        SELECT time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS window_start, event_type
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP), INTERVAL '12 hours') AS window_start, event_type
        FROM events)
      SELECT window_start, event_type, count(*) AS n
      FROM assigned
      GROUP BY window_start, event_type
      ORDER BY window_start, event_type"""))

  /** Session window: per-user sessions with a 30-minute inactivity gap.
    * Oracle is the classic gaps-and-islands rewrite: a session breaks when
    * the gap to the previous event is >= the timeout (Spark session windows
    * are [start, last+gap) half-open). */
  val q34 = GraftQuery(
    "q34_session_window",
    "Per-user session windows (30-minute gap): session start, size, value sum",
    (s, dir) =>
      events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(dec2(col("value"))).cast("double").as("session_value"))
        .select(col("session_window.start").cast("timestamp_ntz").as("session_start"), col("user_id"),
          col("n_events"), col("session_value"))
        .orderBy("user_id", "session_start"),
    Some("""
      WITH o AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 1
                    WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                         >= INTERVAL '30 minutes' THEN 1
                    ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      g AS (
        SELECT user_id, ts, value,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM o)
      SELECT min(ts) AS session_start, user_id,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS session_value
      FROM g
      GROUP BY user_id, grp
      ORDER BY user_id, session_start"""))

  /** Deterministic dedup: first event per (user_id, event_type) — the batch
    * form of streaming dropDuplicates-within-watermark (made deterministic
    * with an explicit total order, unlike bare dropDuplicates). */
  val q35 = GraftQuery(
    "q35_dedup_first_event",
    "Keep earliest event per (user_id, event_type) — deterministic dedup",
    (s, dir) => {
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts").cast("timestamp_ntz").as("ts"))
        .orderBy("user_id", "event_type")
    },
    Some("""
      SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS rn
            FROM events)
      WHERE rn = 1
      ORDER BY user_id, event_type"""))

  /** Time-series regularization: resample the per-type event series onto a
    * complete hourly spine (generated, exploded — no driver loop), left
    * join the actual hourly aggregates, and carry the last observation
    * forward across the gaps (`last(_, ignoreNulls)` over an unbounded
    * preceding frame). THE preprocessing step before any windowed feature
    * or forecasting job: at 100 TB the spine is generated per partition
    * key, the join is a shuffle on (type, hour), and LOCF is one window
    * pass — no per-gap iteration anywhere. */
  val q69 = GraftQuery(
    "q69_gap_fill_locf",
    "hourly spine + gap fill + last-observation-carried-forward per event_type",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
      val hourly = ev
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("hour_value"))
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      val spine = bounds
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
        .crossJoin(ev.select("event_type").distinct())
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, Seq("event_type", "hour"), "left_outer")
        .select(col("event_type"),
          col("hour").cast("timestamp_ntz").as("hour"),
          coalesce(col("n"), lit(0L)).as("n"),
          last(col("hour_value"), ignoreNulls = true).over(w).as("locf_value"))
        .orderBy("event_type", "hour")
    },
    Some("""
      WITH hourly AS (
        SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS hour_value
        FROM events GROUP BY 1, 2),
      bounds AS (
        SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS lo,
               date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS hi
        FROM events),
      spine AS (
        SELECT t.event_type, g.hour
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
              FROM bounds) g)
      SELECT s.event_type, s.hour,
             COALESCE(h.n, 0) AS n,
             last_value(h.hour_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.hour
               ROWS UNBOUNDED PRECEDING) AS locf_value
      FROM spine s LEFT JOIN hourly h USING (event_type, hour)
      ORDER BY event_type, hour"""))

  /** Sequential funnel: how many users progressed view → click → purchase
    * IN ORDER (each stage strictly after the previous one's first hit).
    * Three per-user min-aggregates chained by time conditions — each stage
    * is one shuffle on user_id and the stage tables shrink monotonically;
    * no per-user event-history sort anywhere, which is what keeps the
    * funnel O(events) at 100 TB. */
  val q70 = GraftQuery(
    "q70_funnel",
    "Ordered view->click->purchase funnel: users reaching each stage (strictly sequential)",
    (s, dir) => {
      val ev = events(s, dir).select("user_id", "event_type", "ts")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      val stages = Seq(("1_view", v), ("2_click", c), ("3_purchase", p))
      stages.map { case (name, df) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
      }.reduce(_.unionByName(_)).orderBy("stage")
    },
    Some("""
      WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
                 FROM events WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t1
            GROUP BY 1),
      p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
            FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t2
            GROUP BY 1)
      SELECT stage, n_users FROM (
        SELECT '1_view' AS stage, count(*) AS n_users FROM v
        UNION ALL SELECT '2_click', count(*) FROM c
        UNION ALL SELECT '3_purchase', count(*) FROM p)
      ORDER BY stage"""))

  /** Cohort retention: users grouped by first-seen week, activity counted
    * per week offset — the (cohort × age) retention triangle. Two shuffles
    * total (first-seen agg, distinct activity), then a join and one count
    * per cell. The analytics-engine staple for any event corpus. */
  val q71 = GraftQuery(
    "q71_retention_cohorts",
    "Weekly cohort retention triangle: first-seen week x week offset -> distinct users",
    (s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
      val active = ev.distinct()
      active.join(cohort, "user_id")
        .select(col("cohort_week"),
          (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_n"))
        .groupBy("cohort_week", "week_n")
        .agg(count(lit(1)).as("n_users"))
        .select(col("cohort_week").cast("timestamp_ntz").as("cohort_week"),
          col("week_n"), col("n_users"))
        .orderBy("cohort_week", "week_n")
    },
    Some("""
      WITH ev AS (SELECT user_id,
                         date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
                  FROM events),
      cohort AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1),
      active AS (SELECT DISTINCT user_id, week FROM ev)
      SELECT cohort_week,
             CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_n,
             count(*) AS n_users
      FROM active JOIN cohort USING (user_id)
      GROUP BY cohort_week, week_n
      ORDER BY cohort_week, week_n"""))

  /** Time-weighted average over IRREGULAR samples — the metric that plain
    * avg() gets wrong the moment observations aren't equally spaced (a
    * sensor reading held for 50 minutes must weigh 50× one held for a
    * minute — TWAP in finance, duty-cycle in telemetry). Each reading's
    * weight is its holding interval (lead(ts) − ts, last reading weightless
    * by convention); one lead() window per user = one shuffle, then a plain
    * weighted-sum aggregate. ENTIRELY integer arithmetic — cents × micros
    * summed exactly, TWAP emitted in cents via integer floor division —
    * because a double divide + round(4) sat exactly on a .5 boundary at
    * sf0.1 and Spark (HALF_UP) and DuckDB (binary) rounded it apart; no
    * float ever touches the result now. */
  val q83 = GraftQuery(
    "q83_time_weighted_avg",
    "Time-weighted average per user over irregular event samples (interval-weighted, TWAP shape)",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          (dec2(col("value")) * 100).cast("long").as("cents"))
        .withColumn("held_us",
          (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))))
        .filter(col("held_us").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("held_us")).as("observed_us"),
          expr("sum(cents * held_us) DIV sum(held_us)").as("twap_cents"))
        .orderBy("user_id")
    },
    Some("""
      WITH o AS (
        SELECT user_id,
               CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
               epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id))
                 - epoch_us(CAST(ts AS TIMESTAMP)) AS held_us
        FROM events)
      SELECT user_id, count(*) AS n_intervals,
             CAST(sum(held_us) AS BIGINT) AS observed_us,
             CAST(sum(cents * held_us) // sum(held_us) AS BIGINT) AS twap_cents
      FROM o
      WHERE held_us IS NOT NULL
      GROUP BY user_id
      ORDER BY user_id"""))

  /** Equi-width histogram via width_bucket — the profiling visualization
    * primitive (q66 profiles nulls/distincts; this profiles the value
    * DISTRIBUTION): 10 fixed bins over the declared domain plus the two
    * out-of-range gutters width_bucket defines (bin 0 and n+1). One
    * map-side-combined groupBy on (event_type, bin); bin edges are
    * data-independent so the same report composes across corpus shards by
    * addition — the mergeable-histogram property monitoring needs. */
  val q84 = GraftQuery(
    "q84_value_histogram",
    "10-bin equi-width histogram of value per event_type (width_bucket, mergeable bins)",
    (s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          width_bucket(dec2(col("value")).cast("double"),
            lit(0.0), lit(500.0), lit(10)).as("bin"))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bin"),
    Some("""
      -- DuckDB has no width_bucket: its exact semantics spelled out
      -- (bin 0 below the domain, 1..10 inside at width 50, 11 at/above max)
      WITH v AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(14,2)) AS DOUBLE) AS x
                 FROM events)
      SELECT event_type,
             CASE WHEN x < 0.0 THEN 0
                  WHEN x >= 500.0 THEN 11
                  ELSE CAST(floor(x / 50.0) AS BIGINT) + 1 END AS bin,
             count(*) AS n
      FROM v
      GROUP BY event_type, bin
      ORDER BY event_type, bin"""))

  /** Rolling engagement — DAU / WAU(7d) / MAU(30d) distinct users as of
    * each day. COUNT(DISTINCT) cannot ride a range window, so the scale
    * idiom is explode-dedup: reduce events to distinct (user, day) pairs
    * FIRST (the only pass over raw events), then fan each pair out to the
    * n window-end days it supports, dedup (user, window-day), and count.
    * Shuffle volume is distinct-user-days × window length in 16-byte
    * rows — independent of raw event count, which is what survives 100 TB
    * of events (the alternative per-day × range self-join is the ORACLE
    * here, fine at fixture scale, quadratic in days at none). Reported
    * days are the observed activity days (inner join with DAU). */
  val q86 = GraftQuery(
    "q86_active_users",
    "DAU / WAU(7d) / MAU(30d) distinct users per day via explode-dedup rolling windows",
    (s, dir) => {
      val ud = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      def rolling(n: Int, name: String) = ud
        .select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), n - 1))).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as(name))
      ud.groupBy("day").agg(count(lit(1)).as("dau"))
        .join(rolling(7, "wau"), Seq("day"))
        .join(rolling(30, "mau"), Seq("day"))
        .select(col("day"), col("dau"), col("wau"), col("mau"))
        .orderBy("day")
    },
    Some("""
      WITH ud AS (SELECT DISTINCT user_id,
                         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
                  FROM events),
      dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day)
      SELECT d.day, d.dau,
             (SELECT count(DISTINCT u.user_id) FROM ud u
              WHERE u.day <= d.day AND u.day >= d.day - INTERVAL '6 days') AS wau,
             (SELECT count(DISTINCT u.user_id) FROM ud u
              WHERE u.day <= d.day AND u.day >= d.day - INTERVAL '29 days') AS mau
      FROM dau d
      ORDER BY d.day"""))

  /** Ordered event-chain matching (CEP-lite — the pattern-match shape of
    * MATCH_RECOGNIZE / FlinkCEP, batch form): for every CLICK, the chain
    * is complete iff the nearest VIEW at-or-before it is within 1 day
    * AND the first PURCHASE strictly after it is within 1 day (bounds
    * sized to the fixture's ~2-day inter-event gaps; the operator is the
    * same at any horizon) — q70's
    * funnel counts users who EVER did all steps; this matches each
    * instance under per-step time bounds. One sorted window pass per user
    * produces both neighbors (last/first over preceding-exclusive /
    * following-exclusive row frames of the SAME ordering — q87's
    * union-merge discipline without the union, since all three roles live
    * in one stream); tie-breaks are the lexicographic (ts, event_id) sort
    * both engines replay, gaps are integer epoch-micros. No self-join,
    * no per-event fan-out → the shuffle is one per-user sort. */
  val q89 = GraftQuery(
    "q89_event_chains",
    "CEP-lite chain match: view ≤1d before click, first purchase ≤1d after — one window pass",
    (s, dir) => {
      val vTolUs = 24L * 3600 * 1000000L
      val pTolUs = 24L * 3600 * 1000000L
      val e = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("tu", unix_micros(col("ts")))
      val base = Window.partitionBy("user_id").orderBy(col("tu"), col("event_id"))
      val wb = base.rowsBetween(Window.unboundedPreceding, -1)
      val wf = base.rowsBetween(1, Window.unboundedFollowing)
      e
        .withColumn("pv", last(when(col("event_type") === "view",
          struct(col("tu"), col("event_id"))), ignoreNulls = true).over(wb))
        .withColumn("np", first(when(col("event_type") === "purchase",
          struct(col("tu"), col("event_id"))), ignoreNulls = true).over(wf))
        .filter(col("event_type") === "click" &&
          col("pv").isNotNull && col("tu") - col("pv.tu") <= vTolUs &&
          col("np").isNotNull && col("np.tu") - col("tu") <= pTolUs)
        .select(col("event_id").as("click_id"), col("user_id"),
          col("pv.event_id").as("view_id"), col("np.event_id").as("purchase_id"))
        .orderBy("click_id")
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, event_type,
                        epoch_us(CAST(ts AS TIMESTAMP)) AS tu
                 FROM events),
      c AS (SELECT event_id AS click_id, user_id, tu FROM e
            WHERE event_type = 'click'),
      pv AS (SELECT click_id, view_id FROM (
               SELECT c.click_id, v.event_id AS view_id,
                      row_number() OVER (PARTITION BY c.click_id
                        ORDER BY v.tu DESC, v.event_id DESC) AS rn
               FROM c JOIN e v ON v.user_id = c.user_id
                 AND v.event_type = 'view'
                 AND (v.tu < c.tu OR (v.tu = c.tu AND v.event_id < c.click_id))
                 AND c.tu - v.tu <= CAST(24 AS BIGINT) * 3600 * 1000000)
             WHERE rn = 1),
      np AS (SELECT click_id, purchase_id FROM (
               SELECT c.click_id, p.event_id AS purchase_id,
                      row_number() OVER (PARTITION BY c.click_id
                        ORDER BY p.tu ASC, p.event_id ASC) AS rn
               FROM c JOIN e p ON p.user_id = c.user_id
                 AND p.event_type = 'purchase'
                 AND (p.tu > c.tu OR (p.tu = c.tu AND p.event_id > c.click_id))
                 AND p.tu - c.tu <= CAST(24 AS BIGINT) * 3600 * 1000000)
             WHERE rn = 1)
      SELECT c.click_id, c.user_id, pv.view_id, np.purchase_id
      FROM c JOIN pv USING (click_id) JOIN np USING (click_id)
      ORDER BY click_id"""))

  /** Marketing attribution (first-touch AND last-touch models): every
    * PURCHASE credits its revenue to a non-purchase touch within a 7-day
    * lookback — `lt` = the latest such touch, `ft` = the earliest INSIDE the
    * horizon. A rows-frame can express `lt` (q89's pattern) but not `ft`:
    * "first event satisfying tu >= cur−tol" depends on the CURRENT row, which
    * a frame aggregate can't see. The scale idiom is a RANGE frame over a
    * collision-free surrogate clock u = epoch_micros·4096 + event_id mod 4096
    * (micros ~1.8e15 → u < 7.4e18, no Long overflow; unique because
    * event_ids are unique per fixture and micros collisions would need equal
    * low bits too — and even then both engines replay the identical frame).
    * Both models come out of ONE per-user sort — no self-join, no per-event
    * fan-out; the final rollup is a ~10-row aggregate. Revenue sums in
    * DECIMAL(14,2) (the q83 lesson: never hash-compare float sums). */
  val q91 = GraftQuery(
    "q91_attribution",
    "First/last-touch revenue attribution within a 7-day lookback — one range-frame window pass",
    (s, dir) => {
      val tolU = 7L * 86400L * 1000000L * 4096L
      val e = events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          (unix_micros(col("ts")) * 4096L + col("event_id") % 4096L).as("u"))
      val w = Window.partitionBy("user_id").orderBy("u").rangeBetween(-tolU, -1)
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      val p = e
        .withColumn("lt", last(touch, ignoreNulls = true).over(w))
        .withColumn("ft", first(touch, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
      p.select(lit("last_touch").as("model"),
          coalesce(col("lt"), lit("direct")).as("channel"), col("value"))
        .unionAll(p.select(lit("first_touch").as("model"),
          coalesce(col("ft"), lit("direct")).as("channel"), col("value")))
        .groupBy("model", "channel")
        .agg(count(lit(1)).as("n_purchases"),
          sum(dec2(col("value"))).cast("double").as("revenue"))
        .orderBy("model", "channel")
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, event_type, value,
                        epoch_us(CAST(ts AS TIMESTAMP)) * 4096
                          + event_id % 4096 AS u
                 FROM events),
      t AS (SELECT *,
              last_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY u
                      RANGE BETWEEN 2477260800000000 PRECEDING
                            AND 1 PRECEDING) AS lt,
              first_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY u
                      RANGE BETWEEN 2477260800000000 PRECEDING
                            AND 1 PRECEDING) AS ft
            FROM e),
      p AS (SELECT * FROM t WHERE event_type = 'purchase'),
      m AS (SELECT 'last_touch' AS model, coalesce(lt, 'direct') AS channel,
                   value FROM p
            UNION ALL
            SELECT 'first_touch', coalesce(ft, 'direct'), value FROM p)
      SELECT model, channel, count(*) AS n_purchases,
             CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      FROM m GROUP BY model, channel ORDER BY model, channel"""))

  /** Rolling z-score anomaly screen — the monitoring tier of the event
    * pipeline: each event judged against ITS OWN user's trailing 30-day
    * history (frame excludes the current row — the test statistic must not
    * contaminate the baseline), flagged when |z| > 2 with ≥ 5 priors.
    * Same surrogate-clock range frame as q91; the three moments (count,
    * sum, sum of squares) come out of ONE window pass. Cross-engine float
    * discipline: the moment sums are DECIMAL-exact, and z is derived from
    * them with an identical expression tree, so both engines produce the
    * same IEEE doubles — the hash compares rounded z but the FLAG
    * comparison |z| > 2 is also deterministic because its inputs are. */
  val q92 = GraftQuery(
    "q92_rolling_zscore",
    "Per-user rolling z-score (30-day trailing baseline, current row excluded): |z| > 2 outliers",
    (s, dir) => {
      val tolU = 30L * 86400L * 1000000L * 4096L
      val e = events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          (unix_micros(col("ts")) * 4096L + col("event_id") % 4096L).as("u"))
        .withColumn("v", dec2(col("value")))
      val w = Window.partitionBy("user_id").orderBy("u").rangeBetween(-tolU, -1)
      e.withColumn("n_prior", count(col("v")).over(w))
        .withColumn("s1", sum(col("v")).over(w))
        .withColumn("s2", sum(col("v") * col("v")).over(w))
        .filter(col("n_prior") >= 5)
        .withColumn("mean", col("s1").cast("double") / col("n_prior"))
        .withColumn("varr",
          greatest(col("s2").cast("double") / col("n_prior")
            - col("mean") * col("mean"), lit(0.0)))
        .filter(col("varr") > 0.0)
        .withColumn("z", (col("value") - col("mean")) / sqrt(col("varr")))
        .filter(abs(col("z")) > 2.0)
        .select(col("event_id"), col("user_id"), col("value"),
          col("n_prior"), round(col("z"), 4).as("z"))
        .orderBy("event_id")
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, value,
                        CAST(value AS DECIMAL(14,2)) AS v,
                        epoch_us(CAST(ts AS TIMESTAMP)) * 4096
                          + event_id % 4096 AS u
                 FROM events),
      t AS (SELECT *,
              count(v) OVER w AS n_prior,
              sum(v) OVER w AS s1,
              sum(v * v) OVER w AS s2
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY u
              RANGE BETWEEN 10616832000000000 PRECEDING AND 1 PRECEDING)),
      m AS (SELECT *, CAST(s1 AS DOUBLE) / n_prior AS mean,
                   greatest(CAST(s2 AS DOUBLE) / n_prior
                     - (CAST(s1 AS DOUBLE) / n_prior)
                       * (CAST(s1 AS DOUBLE) / n_prior), 0.0) AS varr
            FROM t WHERE n_prior >= 5)
      SELECT event_id, user_id, value, n_prior,
             round((value - mean) / sqrt(varr), 4) AS z
      FROM m
      WHERE varr > 0.0 AND abs((value - mean) / sqrt(varr)) > 2.0
      ORDER BY event_id"""))

  /** Inter-arrival profile — the capacity-planning / anomaly-baseline
    * report behind every streaming SLA: per event type, the distribution
    * of gaps between a user's consecutive events (attributed to the LATER
    * event's type — "how long since this user's previous activity when a
    * purchase happens"). Gaps are integer epoch-micros from one per-user
    * sorted window pass (lag with (ts, event_id) tie-break, q18's
    * discipline); exact interpolated percentiles over those integers are
    * rational → identical cross-engine (q42's idiom), converted to seconds
    * only at the rounded output. One shuffle on user_id for the lag, one
    * bounded agg on the ~5-key event_type space. */
  val q96 = GraftQuery(
    "q96_interarrival",
    "Per-event-type inter-arrival gap profile: n, median/p90/max gap seconds",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"),
          (unix_micros(col("ts")) - unix_micros(col("prev"))).as("gap_us"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          round(expr("percentile(gap_us, 0.5)") / 1000000, 4).as("median_gap_s"),
          round(expr("percentile(gap_us, 0.9)") / 1000000, 4).as("p90_gap_s"),
          round(max(col("gap_us")) / 1000000.0, 4).as("max_gap_s"))
        .orderBy("event_type")
    },
    Some("""
      WITH g AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP))
                 - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER (
                     PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))
                 AS gap_us
        FROM events)
      SELECT event_type, count(*) AS n_gaps,
             round(quantile_cont(gap_us, 0.5) / 1000000, 4) AS median_gap_s,
             round(quantile_cont(gap_us, 0.9) / 1000000, 4) AS p90_gap_s,
             round(max(gap_us) / 1000000.0, 4) AS max_gap_s
      FROM g
      WHERE gap_us IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Calendar gap-fill + day-over-day deltas — the scaffold join every
    * time-series report needs before trend math is trustworthy: a daily
    * count series SKIPS days with zero events, so lag()-based deltas
    * silently compare non-adjacent days and monitoring misses the outage
    * day entirely (the zero row IS the signal). Scaffold = full
    * [min_day, max_day] range × event_type, built row-local from one
    * 1-row bounds agg (sequence + explode — no driver loop); daily
    * counts left-join onto it, absent days coalesce to 0, deltas lag
    * over the filled series. Shape at 100 TB: the fact table aggregates
    * ONCE to |days|×|types| rows; scaffold, join, and window all run on
    * that tiny frame — broadcast join, bounded window partitions. */
  val q102 = GraftQuery(
    "q102_gap_fill",
    "Calendar scaffold gap-fill: zero rows for eventless days + day-over-day deltas",
    (s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("ts").cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val scaffold = daily
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
        .crossJoin(broadcast(events(s, dir).select("event_type").distinct()))
      val w = Window.partitionBy("event_type").orderBy("day")
      scaffold.join(daily, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"))
        .withColumn("delta", col("n") - lag(col("n"), 1).over(w))
        .orderBy("day", "event_type")
    },
    Some("""
      WITH c AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                        event_type, count(*) AS n
                 FROM events GROUP BY day, event_type),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
      days AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                        CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
               FROM b),
      scaffold AS (SELECT day, event_type
                   FROM days CROSS JOIN (SELECT DISTINCT event_type FROM events)),
      f AS (SELECT s.day, s.event_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n
            FROM scaffold s LEFT JOIN c ON s.day = c.day
                                       AND s.event_type = c.event_type)
      SELECT day, event_type, n,
             n - lag(n) OVER (PARTITION BY event_type ORDER BY day) AS delta
      FROM f
      ORDER BY day, event_type"""))

  /** Peak interval concurrency via the classic sweep-line: each event opens
    * a half-open 15-minute activity window [ts, ts+15m); the per-user peak
    * is the maximum number of simultaneously-open windows (= the user's
    * worst burst). The sweep emits +1 at each start and -1 at each end,
    * collapses deltas per distinct boundary instant (half-open semantics
    * mean closes and opens at the same instant net out BEFORE the running
    * count is read, and within one instant the count is monotone per sign,
    * so the per-instant net is tie-order-free), then takes a running sum per
    * user — max of that running sum is the peak, and a lexicographic
    * struct-max (peak, -epoch) pulls the EARLIEST instant the peak is
    * reached in the same single aggregation. No self-join and no per-pair
    * fan-out (q11's band join materializes pairs; this never does): the
    * whole operator is a union, two hash aggregations, and one per-user
    * window sort — per-key cost is O(k log k) in the user's own event
    * count, so the shape survives any corpus scale where q11-style pairing
    * would square. */
  val q107 = GraftQuery(
    "q107_peak_concurrency",
    "Sweep-line peak overlap: max simultaneously-open 15-min event windows per user",
    (s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("ts"))
      val deltas = e.select(col("user_id"), col("ts").as("t"), lit(1L).as("d"))
        .unionAll(e.select(col("user_id"),
          (col("ts") + expr("INTERVAL 15 MINUTES")).as("t"), lit(-1L).as("d")))
        .groupBy("user_id", "t").agg(sum(col("d")).as("net"))
      val w = Window.partitionBy("user_id").orderBy("t")
      deltas
        .withColumn("open", sum(col("net")).over(w))
        .withColumn("ntu", -unix_micros(col("t")))
        .groupBy("user_id")
        .agg(max(struct(col("open").as("p"), col("ntu").as("nt"))).as("m"))
        .select(col("user_id"), col("m.p").as("peak"),
          timestamp_micros(-col("m.nt")).cast("timestamp_ntz").as("peak_at"))
        .orderBy("user_id")
    },
    Some("""
      WITH d AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS t, 1 AS d FROM events
        UNION ALL
        SELECT user_id, CAST(ts AS TIMESTAMP) + INTERVAL 15 MINUTE, -1 FROM events),
      n AS (SELECT user_id, t, sum(d) AS net FROM d GROUP BY user_id, t),
      r AS (SELECT user_id, t,
                   sum(net) OVER (PARTITION BY user_id ORDER BY t) AS open
            FROM n),
      p AS (SELECT user_id, CAST(max(open) AS BIGINT) AS peak FROM r GROUP BY user_id)
      SELECT p.user_id, p.peak, min(r.t) AS peak_at
      FROM p JOIN r ON r.user_id = p.user_id AND r.open = p.peak
      GROUP BY p.user_id, p.peak
      ORDER BY p.user_id"""))

  /** Interval coalescing (gaps-and-islands merge) — the complement of
    * q34's session windows: q34 *groups events* by inactivity gaps; this
    * merges *intervals of cover* into their maximal union, the primitive
    * behind uptime/SLA cover math, ad-exposure dedup, and on-call overlap
    * ("how much wall-clock was covered, counting overlaps once"). Each
    * event opens a half-open 6-hour cover interval [ts, ts+6h); per user,
    * overlapping or touching intervals fuse into islands. One sorted
    * window pass does it: an interval starts a new island iff its start
    * exceeds the running max end of everything before it (ROWS … 1
    * PRECEDING so the current row's own end is excluded), island id =
    * running count of those flags, then a per-island min/max and a
    * per-user rollup. All boundary math is integer epoch-micros (exact
    * cross-engine); seconds appear only via integer division at the
    * output. Scale shape: one shuffle on user_id, per-key cost
    * O(k log k) in the user's own events — no self-join, no per-pair
    * fan-out, so it survives hot keys that would square q11's band join.
    * Generalizes the reference's run-history elapsed reporting
    * (gluettalax.py:330,656) from per-run durations to deduplicated
    * cover time. */
  val q118 = GraftQuery(
    "q118_interval_coalesce",
    "Merge overlapping 6-h cover intervals per user: islands, covered/longest seconds",
    (s, dir) => {
      val iv = events(s, dir).select(col("user_id"),
        unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) + 21600000000L).as("en"))
      val w = Window.partitionBy("user_id").orderBy("st", "en")
      val isl = iv
        .withColumn("pm", max(col("en")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("ni",
          when(col("pm").isNull || col("st") > col("pm"), 1L).otherwise(0L))
        .withColumn("island", sum(col("ni")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "island")
        .agg(min(col("st")).as("ist"), max(col("en")).as("ien"))
      isl.groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          expr("sum(ien - ist) div 1000000").as("covered_sec"),
          expr("max(ien - ist) div 1000000").as("longest_sec"))
        .orderBy("user_id")
    },
    Some("""
      WITH iv AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS st,
               epoch_us(CAST(ts AS TIMESTAMP)) + 21600000000 AS en
        FROM events),
      m AS (SELECT user_id, st, en,
                   max(en) OVER (PARTITION BY user_id ORDER BY st, en
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS pm
            FROM iv),
      f AS (SELECT user_id, st, en,
                   CASE WHEN pm IS NULL OR st > pm THEN 1 ELSE 0 END AS ni
            FROM m),
      g AS (SELECT user_id, st, en,
                   sum(ni) OVER (PARTITION BY user_id ORDER BY st, en
                                 ROWS UNBOUNDED PRECEDING) AS island
            FROM f),
      isl AS (SELECT user_id, island, min(st) AS ist, max(en) AS ien
              FROM g GROUP BY user_id, island)
      SELECT user_id, count(*) AS n_islands,
             CAST(sum(ien - ist) // 1000000 AS BIGINT) AS covered_sec,
             CAST(max(ien - ist) // 1000000 AS BIGINT) AS longest_sec
      FROM isl GROUP BY user_id
      ORDER BY user_id"""))

  /** Period-over-period comparison, CALENDAR-aligned: q102's lag() gives
    * "previous row", which silently lies across gaps — MoM/YoY must align
    * by calendar arithmetic (month = add_months(month, −1/−12)), i.e. a
    * self-join on the offset key, null where the comparison month doesn't
    * exist. Runs on the monthly aggregate (fact scanned once; the
    * comparison joins touch |months| rows). Basis-point changes are
    * computed sign-split (|Δ|·10⁴ div prev, negated for drops) because
    * integer division of NEGATIVES diverges between engines (Spark `div`
    * truncates toward zero, DuckDB `//` floors) — the only safe form is
    * division of non-negatives, an oracle-parity rule worth encoding
    * once. */
  val q130 = GraftQuery(
    "q130_period_over_period",
    "Calendar-aligned MoM + YoY revenue comparison (offset self-joins, sign-split bp)",
    (s, dir) => {
      val monthly = table(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").as("cents"))
      def bp(prev: String) = expr(
        s"""CASE WHEN $prev IS NULL THEN NULL
                 WHEN cents >= $prev THEN ((cents - $prev) * 10000) div $prev
                 ELSE -((($prev - cents) * 10000) div $prev) END""")
      val mom = monthly.select(col("month").as("m1"), col("cents").as("prev_m"))
      val yoy = monthly.select(col("month").as("m12"), col("cents").as("prev_y"))
      monthly
        .join(mom, col("m1") === add_months(col("month"), -1), "left")
        .join(yoy, col("m12") === add_months(col("month"), -12), "left")
        .select(col("month"),
          (col("cents").cast("double") / 100).as("revenue"),
          bp("prev_m").as("mom_bp"),
          bp("prev_y").as("yoy_bp"))
        .orderBy("month")
    },
    Some("""
      WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY month)
      SELECT c.month, CAST(c.cents AS DOUBLE) / 100 AS revenue,
             CASE WHEN m.cents IS NULL THEN NULL
                  WHEN c.cents >= m.cents
                    THEN CAST((c.cents - m.cents) * 10000 // m.cents AS BIGINT)
                  ELSE -CAST((m.cents - c.cents) * 10000 // m.cents AS BIGINT)
             END AS mom_bp,
             CASE WHEN y.cents IS NULL THEN NULL
                  WHEN c.cents >= y.cents
                    THEN CAST((c.cents - y.cents) * 10000 // y.cents AS BIGINT)
                  ELSE -CAST((y.cents - c.cents) * 10000 // y.cents AS BIGINT)
             END AS yoy_bp
      FROM monthly c
      LEFT JOIN monthly m ON m.month = c.month - INTERVAL 1 MONTH
      LEFT JOIN monthly y ON y.month = c.month - INTERVAL 12 MONTH
      ORDER BY c.month"""))

  /** Gaps-and-islands in its canonical form — consecutive-day activity
    * streaks (the DAU-streak / achievement metric every engagement pipeline
    * computes): per user, distinct active days collapse to integer day
    * indexes, and `day_idx - row_number()` is constant exactly along a run
    * of consecutive days (Itzik Ben-Gan's islands identity), so a plain
    * groupBy on that difference labels maximal streaks with NO self-join
    * and NO iteration — two narrow window passes over (user, day) rows.
    * Scale: the shuffle carries one row per user-day (corpus-bounded,
    * ~activity-compressed), the windows partition by user_id (thousands of
    * independent partitions), and the output is a streak-length histogram —
    * bounded by the calendar, not the corpus. */
  val q132 = GraftQuery(
    "q132_activity_streaks",
    "Consecutive-day streak histogram via the islands identity (day_idx - row_number)",
    (s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("day_idx")
      val days = events(s, dir)
        .select(col("user_id"), datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("day_idx"))
        .distinct()
      val streaks = days
        .withColumn("island", col("day_idx") - row_number().over(byUser))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("streak_len"))
      streaks
        .groupBy("streak_len")
        .agg(count(lit(1)).as("n_streaks"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("streak_len")
    },
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx
        FROM events),
      isl AS (
        SELECT user_id,
               day_idx - row_number() OVER (PARTITION BY user_id ORDER BY day_idx) AS island
        FROM days),
      streaks AS (
        SELECT user_id, island, count(*) AS streak_len
        FROM isl GROUP BY user_id, island)
      SELECT streak_len, count(*) AS n_streaks, count(DISTINCT user_id) AS n_users
      FROM streaks GROUP BY streak_len ORDER BY streak_len"""))

  /** Batch sessionization with a DATA-DEPENDENT gap threshold — the shape
    * `session_window` (q34/st3) cannot express: a purchase keeps the
    * session alive for 24 h, anything else for 6 h, so the cut decision
    * reads the PREVIOUS row's type and timestamp (lag) and session ids are
    * a running sum of cut flags. One window pass to flag cuts, one to
    * number sessions, one groupBy per session, then a bounded histogram by
    * session size — the standard scale shape for per-entity sessionization
    * (each user's timeline is one partition; no joins). Durations aggregate
    * as exact integer microseconds and divide once at the end, so the
    * result is independent of partial-sum order. */
  val q135 = GraftQuery(
    "q135_adaptive_sessions",
    "Variable-gap sessionization (purchase extends TTL) + session-size histogram",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cut = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("ttl_s",
          when(col("prev_type") === "purchase", lit(86400L)).otherwise(lit(21600L)))
        .withColumn("is_cut",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > col("ttl_s") * 1000000L, 1L)
            .otherwise(0L))
      val sessions = cut
        .withColumn("session_id", sum(col("is_cut")).over(w))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("has_purchase"))
      sessions
        .groupBy("n_events")
        .agg(count(lit(1)).as("n_sessions"),
          round(sum(col("dur_us")).cast("double") / (count(lit(1)) * 1000000L), 4).as("avg_dur_s"),
          sum(col("has_purchase")).as("n_with_purchase"))
        .orderBy("n_events")
    },
    Some("""
      WITH cut AS (
        SELECT user_id, event_id, ts, event_type,
               lag(ts) OVER w AS prev_ts,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      flagged AS (
        SELECT *,
               CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) >
                            CAST(CASE WHEN prev_type = 'purchase' THEN 86400 ELSE 21600 END AS BIGINT) * 1000000
                    THEN 1 ELSE 0 END AS is_cut
        FROM cut),
      numbered AS (
        SELECT *, sum(is_cut) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged),
      sessions AS (
        SELECT user_id, session_id, count(*) AS n_events,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
        FROM numbered GROUP BY user_id, session_id)
      SELECT n_events, count(*) AS n_sessions,
             round(CAST(sum(dur_us) AS DOUBLE) / (count(*) * 1000000), 4) AS avg_dur_s,
             CAST(sum(has_purchase) AS BIGINT) AS n_with_purchase
      FROM sessions GROUP BY n_events ORDER BY n_events"""))

  /** OHLC downsampling — the time-series resample every metrics store runs
    * (candlestick bars / per-window first-last-extremes): open and close
    * are ARGMIN/ARGMAX-by-time, computed with the struct-min trick —
    * `min(struct(ts, event_id, value))` rides the ONE hash aggregate with
    * map-side partials (struct comparison is lexicographic, event_id
    * breaks same-microsecond ties), so the whole bar table is a single
    * shuffle keyed by (day, type) with NO window pass and NO second scan.
    * The oracle replays the textbook two-window row_number formulation,
    * proving the single-agg fusion (q113/q119's discipline). Volume sums
    * in exact integer cents; open/high/low/close are raw stored doubles
    * (no arithmetic → bit-identical cross-engine). */
  val q137 = GraftQuery(
    "q137_ohlc_bars",
    "Daily OHLC bars per event type via struct-argmin in one aggregate pass",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("ts").cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("ts"), col("event_id"), col("value"))).getField("value").as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(struct(col("ts"), col("event_id"), col("value"))).getField("value").as("close"),
          expr("sum(CAST(round(value * 100) AS BIGINT))").as("volume_cents"))
        .orderBy("day", "event_type"),
    Some("""
      WITH r AS (
        SELECT CAST(ts AS DATE) AS day, event_type, value,
               row_number() OVER (PARTITION BY CAST(ts AS DATE), event_type
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY CAST(ts AS DATE), event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events)
      SELECT day, event_type, count(*) AS n,
             max(CASE WHEN rn_a = 1 THEN value END) AS open,
             max(value) AS high,
             min(value) AS low,
             max(CASE WHEN rn_d = 1 THEN value END) AS close,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS volume_cents
      FROM r
      GROUP BY day, event_type
      ORDER BY day, event_type"""))

  /** Seasonal-naive forecast backtest — the mandatory baseline before any
    * time-series model ships ("would copying last week have done as well?"):
    * forecast(day d) = observed(day d−7), evaluated as MAE over the days
    * with a 7-day-older twin inside the fixed [2024-01-01, 2024-01-30]
    * analysis window. The 100 TB posture: aggregate FIRST (one shuffle to
    * daily grain), gap-fill on the tiny calendar spine (|days|×|types| rows
    * — missing days are real zeros, and skipping them silently drops the
    * forecast's worst errors), then self-join the ROLLUP on (type, d−7),
    * a dimension-sized join that never touches the fact table again. All
    * errors are integer counts; MAE is the single final division. */
  val q149 = GraftQuery(
    "q149_seasonal_backtest",
    "Seasonal-naive (lag-7) daily-count forecast backtest: MAE per event type, zero-filled spine",
    (s, dir) => {
      val types = events(s, dir).select(col("event_type")).distinct()
      val spine = s.range(1)
        .select(explode(expr(
          "sequence(DATE'2024-01-01', DATE'2024-01-30', interval 1 day)"))
          .as("day"))
        .crossJoin(broadcast(types))
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val filled = spine.join(daily, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"),
          coalesce(col("c"), lit(0L)).as("c"))
      val cur = filled.as("cur")
      val prev = filled.as("prev")
      cur.join(prev,
          col("cur.event_type") === col("prev.event_type") &&
            col("cur.day") === date_add(col("prev.day"), 7))
        .groupBy(col("cur.event_type").as("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("cur.c") - col("prev.c"))).as("total_abs_err"))
        .withColumn("mae",
          col("total_abs_err").cast("double") / col("n_days"))
        .orderBy("event_type")
    },
    Some("""
      WITH spine AS (
        SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                           DATE '2024-01-30',
                                           INTERVAL 1 DAY)) AS DATE) AS day,
               event_type
        FROM (SELECT DISTINCT event_type FROM events)),
      daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS c
        FROM events GROUP BY 1, 2),
      filled AS (
        SELECT s.day, s.event_type, coalesce(d.c, 0) AS c
        FROM spine s LEFT JOIN daily d
          ON s.day = d.day AND s.event_type = d.event_type)
      SELECT cur.event_type AS event_type,
             count(*) AS n_days,
             CAST(sum(abs(cur.c - prev.c)) AS BIGINT) AS total_abs_err,
             CAST(sum(abs(cur.c - prev.c)) AS DOUBLE) / count(*) AS mae
      FROM filled cur JOIN filled prev
        ON cur.event_type = prev.event_type
       AND cur.day = prev.day + INTERVAL 7 DAY
      GROUP BY cur.event_type
      ORDER BY cur.event_type"""))

  /** Pearson chi-square independence audit (event type × user cohort) in
    * EXACT integer arithmetic — the statistical test behind every A/B
    * readout and drift alarm, made hash-checkable: per contingency cell,
    * chi2's (o−e)²/e term is the rational (o·n − r·c)² / (r·c·n), and its
    * basis-point value is computed by split division ((num div den)·10⁴ +
    * (num mod den)·10⁴ div den — overflow-safe: the remainder, not the
    * numerator, is what multiplies by 10⁴) so no float ever appears and
    * partition order can't move the answer. The cell table is
    * |types|×|cohorts| rows — ONE fact shuffle builds it; marginals are
    * windows over that bounded frame, and the ALL row (total chi2, the
    * test statistic) re-aggregates the cells with no second scan. */
  val q150 = GraftQuery(
    "q150_chi_square_independence",
    "Chi-square independence of event type × user cohort, exact integer basis points per cell",
    (s, dir) => {
      val cells = events(s, dir)
        .select(col("event_type"), pmod(col("user_id"), lit(3L)).as("cohort"))
        .groupBy("event_type", "cohort")
        .agg(count(lit(1)).as("o"))
      val wAll = Window.partitionBy()
      val scored = cells
        .withColumn("r", sum("o").over(Window.partitionBy("event_type")))
        .withColumn("c", sum("o").over(Window.partitionBy("cohort")))
        .withColumn("n", sum("o").over(wAll))
        .withColumn("num", expr("(o * n - r * c) * (o * n - r * c)"))
        .withColumn("den", expr("r * c * n"))
        .withColumn("contrib_bp", expr(
          "(num div den) * 10000 + ((num % den) * 10000) div den"))
        .select("event_type", "cohort", "o", "r", "c", "contrib_bp")
      val total = scored.agg(
        sum("contrib_bp").as("contrib_bp"), sum("o").as("o"))
        .select(lit("ALL").as("event_type"), lit(-1L).as("cohort"),
          col("o"), col("o").as("r"), col("o").as("c"), col("contrib_bp"))
      scored.unionByName(total).orderBy("event_type", "cohort")
    },
    Some("""
      WITH cells AS (
        SELECT event_type, user_id % 3 AS cohort, count(*) AS o
        FROM events GROUP BY 1, 2),
      scored AS (
        SELECT event_type, cohort, o,
               sum(o) OVER (PARTITION BY event_type) AS r,
               sum(o) OVER (PARTITION BY cohort) AS c,
               sum(o) OVER () AS n
        FROM cells),
      bp AS (
        SELECT event_type, cohort, o,
               CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
               CAST(((o*n - r*c)*(o*n - r*c) // (r*c*n)) * 10000
                 + (((o*n - r*c)*(o*n - r*c)) % (r*c*n)) * 10000 // (r*c*n)
                 AS BIGINT) AS contrib_bp
        FROM scored)
      SELECT event_type, cohort, o, r, c, contrib_bp FROM bp
      UNION ALL
      SELECT 'ALL', -1, CAST(sum(o) AS BIGINT), CAST(sum(o) AS BIGINT),
             CAST(sum(o) AS BIGINT), CAST(sum(contrib_bp) AS BIGINT) FROM bp
      ORDER BY event_type, cohort"""))

  /** DEBOUNCE / cooldown thinning — rate limiting, notification
    * suppression, retry collapse: keep an event only if ≥30 min have
    * passed since the last KEPT event of that user. This is genuinely
    * sequential state (whether an event survives depends on which earlier
    * events survived — NOT expressible as windows or `session_window`:
    * gap-sessions reset on every event, the cooldown clock resets only on
    * kept ones), so it is the legitimate home of the per-partition
    * imperative tier: repartition by user, secondary-sort within
    * partitions on (user, ts, id), then a single forward pass carrying
    * O(1) state (current user, last kept timestamp) — the classic
    * secondary-sort pattern, one shuffle, no per-group memory
    * materialization, any per-user history length streams through. The
    * DuckDB oracle replays the greedy chain via a recursive CTE with a
    * LATERAL next-kept probe — equal hashes prove the sequential
    * semantics, not just a resemblance. Micros kept integer end-to-end. */
  val q154 = GraftQuery(
    "q154_debounce",
    "Cooldown debounce (30 min since last KEPT event per user): secondary-sort O(1)-state pass",
    (s, dir) => {
      import s.implicits._
      val cooldownUs = 1800L * 1000000L
      events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"))
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "ts_us", "event_id")
        .as[(Long, Long, Long)]
        .mapPartitions { it =>
          var curUser = Long.MinValue
          var lastKept = Long.MinValue
          it.flatMap { case (u, t, eid) =>
            if (u != curUser) { curUser = u; lastKept = t; Some((u, t, eid)) }
            else if (t - lastKept >= cooldownUs) { lastKept = t; Some((u, t, eid)) }
            else None
          }
        }
        .toDF("user_id", "ts_us", "event_id")
        .orderBy("user_id", "ts_us", "event_id")
    },
    Some("""
      WITH RECURSIVE ordered AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events),
      keep AS (
        SELECT user_id, ts_us, event_id, rn FROM ordered WHERE rn = 1
        UNION ALL
        SELECT nxt.user_id, nxt.ts_us, nxt.event_id, nxt.rn
        FROM keep k, LATERAL (
          SELECT o.user_id, o.ts_us, o.event_id, o.rn
          FROM ordered o
          WHERE o.user_id = k.user_id
            AND o.ts_us >= k.ts_us + CAST(1800 AS BIGINT) * 1000000
          ORDER BY o.rn LIMIT 1) nxt)
      SELECT user_id, ts_us, event_id
      FROM keep
      ORDER BY user_id, ts_us, event_id"""))

  /** FIFO queue matching — double-entry pairing (payments↔invoices,
    * fills↔orders, acks↔requests) done relationally: per user the k-th
    * click pairs with the k-th view. The naive mental model is a
    * sequential queue walk; the closed form is two per-user rank windows
    * and an equi-join on (user, k) — FIFO order is exactly arrival-index
    * equality, so the "queue" never materializes and the whole thing is
    * one co-partitioned exchange. A pair only COUNTS when the view
    * precedes its click (arrival-index pairing can cross in time when
    * clicks outpace views — those surface in n_crossed, the audit column
    * a reconciliation report needs). Wait time aggregates in exact
    * integer micros. */
  val q157 = GraftQuery(
    "q157_fifo_matching",
    "FIFO view↔click pairing per user via rank equi-join: matched/crossed counts + exact waits",
    (s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
      val wArr = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      def ranked(tpe: String, pre: String) = ev
        .filter(col("event_type") === tpe)
        .withColumn("k", row_number().over(wArr))
        .select(col("user_id"), col("k"),
          col("ts_us").as(s"${pre}_ts"))
      val pairs = ranked("view", "v").join(ranked("click", "c"),
        Seq("user_id", "k"))
      val pairStats = pairs.groupBy("user_id")
        .agg(count(lit(1)).as("n_paired"),
          sum(when(col("v_ts") <= col("c_ts"), 1L).otherwise(0L))
            .as("n_matched"),
          sum(when(col("v_ts") > col("c_ts"), 1L).otherwise(0L))
            .as("n_crossed"),
          sum(when(col("v_ts") <= col("c_ts"), col("c_ts") - col("v_ts"))
            .otherwise(lit(0L))).as("total_wait_us"))
      val perUser = ev.groupBy("user_id")
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("n_views"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("n_clicks"))
        .filter(col("n_views") > 0 || col("n_clicks") > 0)
      perUser.join(pairStats, Seq("user_id"), "left")
        .select(col("user_id"), col("n_views"), col("n_clicks"),
          coalesce(col("n_matched"), lit(0L)).as("n_matched"),
          coalesce(col("n_crossed"), lit(0L)).as("n_crossed"),
          coalesce(col("total_wait_us"), lit(0L)).as("total_wait_us"))
        .orderBy("user_id")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        FROM events),
      v AS (SELECT user_id, ts_us AS v_ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id) AS k
            FROM ev WHERE event_type = 'view'),
      c AS (SELECT user_id, ts_us AS c_ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id) AS k
            FROM ev WHERE event_type = 'click'),
      pairs AS (SELECT v.user_id, v.v_ts, c.c_ts
                FROM v JOIN c ON v.user_id = c.user_id AND v.k = c.k),
      ps AS (SELECT user_id,
                    CAST(sum(CASE WHEN v_ts <= c_ts THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_matched,
                    CAST(sum(CASE WHEN v_ts > c_ts THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_crossed,
                    CAST(sum(CASE WHEN v_ts <= c_ts THEN c_ts - v_ts
                             ELSE 0 END) AS BIGINT) AS total_wait_us
             FROM pairs GROUP BY user_id),
      pu AS (SELECT user_id,
                    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_views,
                    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_clicks
             FROM ev GROUP BY user_id
             HAVING n_views > 0 OR n_clicks > 0)
      SELECT pu.user_id, pu.n_views, pu.n_clicks,
             coalesce(ps.n_matched, 0) AS n_matched,
             coalesce(ps.n_crossed, 0) AS n_crossed,
             coalesce(ps.total_wait_us, 0) AS total_wait_us
      FROM pu LEFT JOIN ps ON pu.user_id = ps.user_id
      ORDER BY pu.user_id"""))

  /** Sliding-window DISTINCT via mergeable bitmaps — trailing-7-day
    * distinct actives (DAU7/WAU/MAU), the metric whose naive form can't
    * scale: COUNT(DISTINCT) does not partial-aggregate, so per-window
    * distinct over raw events re-shuffles the fact once per window (or
    * Expands 7×). The warehouse answer (q108's chunked 63-bit bitmaps
    * composed with sliding windows): ONE event scan builds per-(day, type,
    * chunk) bitmaps — tiny mergeable state, days×types×(users/63) rows —
    * then every sliding window derives by OR-ing 7 daily bitmaps and
    * popcounting, NEVER touching events again; appending tomorrow's
    * dailies is the incremental production form. Each daily bitmap
    * replicates to the ≤7 window-ends it serves (q147's explode-to-bins
    * on the time axis). Oracle replays the naive BETWEEN-join distinct —
    * equal hashes prove the bitmap algebra. */
  val q159 = GraftQuery(
    "q159_sliding_distinct_bitmap",
    "Trailing-7-day distinct users per type from OR-merged daily bitmaps; events scanned once",
    (s, dir) => {
      val daily = events(s, dir)
        .select(to_date(col("ts")).as("d"), col("event_type"),
          expr("user_id div 63L").as("chunk"),
          expr("shiftleft(1L, CAST(user_id % 63 AS INT))").as("bit"))
        .groupBy("d", "event_type", "chunk")
        .agg(expr("bit_or(bit)").as("bits"))
      daily
        .withColumn("i", explode(sequence(lit(0), lit(6))))
        .withColumn("wday", date_add(col("d"), col("i")))
        .filter(col("wday") <= lit("2024-01-30").cast("date"))
        .groupBy("wday", "event_type", "chunk")
        .agg(expr("bit_or(bits)").as("m"))
        .groupBy("wday", "event_type")
        .agg(sum(expr("bit_count(m)")).cast("long").as("dau7"))
        .orderBy("wday", "event_type")
    },
    Some("""
      WITH days AS (
        SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                           DATE '2024-01-30',
                                           INTERVAL 1 DAY)) AS DATE) AS wday),
      e AS (SELECT CAST(ts AS DATE) AS d, event_type, user_id FROM events)
      SELECT wday, event_type,
             count(DISTINCT user_id) AS dau7
      FROM days JOIN e ON e.d BETWEEN wday - 6 AND wday
      GROUP BY wday, event_type
      ORDER BY wday, event_type"""))

  /** Exponentially weighted moving average made EXACT — the time-series
    * smoother whose float form is irreproducible at scale (Σ αᵏxᵢ depends
    * on summation order): with decay α = 1/2 over a trailing 8-event
    * frame, every weight is a power of two, so the weighted sum is pure
    * integer arithmetic (Σ cᵢ·2^(i−1), denominator 2^m − 1) and the
    * smoothed value is one integer division. The frame rides a per-user
    * ordered window (collect over ROWS 7 PRECEDING — frame order is the
    * window order, deterministic under the event_id tiebreak), the fold
    * is a codegen'd HOF, and the whole thing is one user-partitioned
    * exchange. Bounded to 20 users so the dump stays small; the operator
    * itself is corpus-wide. */
  val q163 = GraftQuery(
    "q163_exact_ewma",
    "Integer-exact EWMA (α=1/2, trailing 8 events) per user: power-of-two weights, one division",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(-7, 0)
      events(s, dir)
        .filter(col("user_id") < 20)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("arr", collect_list("cents").over(w))
        .withColumn("num", expr(
          """aggregate(transform(sequence(1, size(arr)),
               i -> element_at(arr, i) * shiftleft(1L, CAST(i - 1 AS INT))),
             0L, (a, x) -> a + x)"""))
        .withColumn("den", expr("shiftleft(1L, size(arr)) - 1"))
        .select(col("user_id"), col("event_id"),
          col("cents"), col("num"), col("den"),
          expr("num div den").as("ewma_cents"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE user_id < 20),
      framed AS (
        SELECT user_id, event_id, cents,
               list(cents) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
                 AS arr
        FROM e),
      folded AS (
        SELECT user_id, event_id, cents,
               CAST(list_sum(list_transform(arr,
                 (x, i) -> x * (CAST(1 AS BIGINT) << (i - 1)))) AS BIGINT)
                 AS num,
               CAST((CAST(1 AS BIGINT) << len(arr)) - 1 AS BIGINT) AS den
        FROM framed)
      SELECT user_id, event_id, cents, num, den, num // den AS ewma_cents
      FROM folded
      ORDER BY user_id, event_id"""))

  /** A/B experiment READOUT end to end — the composition a growth team
    * actually ships (the d16-funnel discipline applied to experimentation):
    * deterministic hash-split arms (user_id parity — in production a salted
    * hash of the unit id, same idea), per-user funnel conversion = q70's
    * chained-min rule (a view strictly before a purchase), per-arm
    * conversion in basis points, and the 2×2 chi-square on (arm ×
    * converted) in q150's exact split-division integer bp — the
    * significance number the readout exists for, repeated on both rows so
    * the report is self-contained. One fact scan builds the per-user
    * frame; everything after is arm-sized. */
  val q167 = GraftQuery(
    "q167_ab_experiment_readout",
    "A/B readout: hash-split arms, funnel conversion per arm, exact 2×2 chi-square in bp",
    (s, dir) => {
      val perUser = events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", unix_micros(col("ts"))))
            .as("first_view"),
          max(when(col("event_type") === "purchase", unix_micros(col("ts"))))
            .as("last_purchase"))
        .select(pmod(col("user_id"), lit(2L)).as("arm"),
          (col("first_view").isNotNull && col("last_purchase").isNotNull &&
            col("first_view") < col("last_purchase")).cast("long").as("conv"))
      val arms = perUser.groupBy("arm")
        .agg(count(lit(1)).as("n_users"), sum("conv").as("n_converted"))
        .withColumn("conv_bp", expr("n_converted * 10000 div n_users"))
        // 2-row frame, eagerly pinned: the chi-square below derives its
        // 2×2 cells FROM this rollup — the fact is scanned exactly once
        .localCheckpoint(true)
      // 2×2 chi-square over (arm × converted): cells unfold from the arm
      // rollup (converted = n_converted; not = n_users − n_converted)
      val cells = arms.select(col("arm"), explode(expr(
          """array(struct(1L AS conv, n_converted AS o),
                   struct(0L AS conv, n_users - n_converted AS o))"""))
          .as("cell"))
        .select(col("arm"), col("cell.conv").as("conv"), col("cell.o").as("o"))
        // empty cells drop, as in the oracle's GROUP BY form (an all-
        // converters arm contributes no conv=0 cell, and a zero marginal
        // would divide by zero)
        .filter(col("o") > 0)
        .withColumn("r", sum("o").over(Window.partitionBy("arm")))
        .withColumn("c", sum("o").over(Window.partitionBy("conv")))
        .withColumn("n", sum("o").over(Window.partitionBy()))
        .withColumn("num", expr("(o * n - r * c) * (o * n - r * c)"))
        .withColumn("den", expr("r * c * n"))
        .withColumn("bp", expr(
          "(num div den) * 10000 + ((num % den) * 10000) div den"))
      val chi2 = cells.agg(sum("bp").as("chi2_bp"))
      arms.crossJoin(broadcast(chi2))
        .select("arm", "n_users", "n_converted", "conv_bp", "chi2_bp")
        .orderBy("arm")
    },
    Some("""
      WITH pu AS (
        SELECT user_id % 2 AS arm,
               CASE WHEN min(CASE WHEN event_type = 'view'
                                  THEN epoch_us(ts) END) IS NOT NULL
                     AND max(CASE WHEN event_type = 'purchase'
                                  THEN epoch_us(ts) END) IS NOT NULL
                     AND min(CASE WHEN event_type = 'view'
                                  THEN epoch_us(ts) END)
                         < max(CASE WHEN event_type = 'purchase'
                                    THEN epoch_us(ts) END)
                    THEN 1 ELSE 0 END AS conv
        FROM events GROUP BY user_id),
      arms AS (
        SELECT arm, count(*) AS n_users,
               CAST(sum(conv) AS BIGINT) AS n_converted
        FROM pu GROUP BY arm),
      cells AS (
        SELECT arm, conv, count(*) AS o FROM pu GROUP BY arm, conv),
      marg AS (
        SELECT arm, conv, o,
               sum(o) OVER (PARTITION BY arm) AS r,
               sum(o) OVER (PARTITION BY conv) AS c,
               sum(o) OVER () AS n
        FROM cells),
      chi AS (
        SELECT CAST(sum(((o*n - r*c)*(o*n - r*c) // (r*c*n)) * 10000
                 + (((o*n - r*c)*(o*n - r*c)) % (r*c*n)) * 10000 // (r*c*n))
               AS BIGINT) AS chi2_bp
        FROM marg)
      SELECT arm, n_users, n_converted,
             n_converted * 10000 // n_users AS conv_bp,
             chi.chi2_bp
      FROM arms, chi
      ORDER BY arm"""))

  /** Trending LEADERBOARD with rank movement — the product-analytics
    * report behind every "top movers" widget: per day, rank event types
    * by their trailing-7-day count, keep the top 3, and attach each
    * entry's rank shift vs the previous day's leaderboard (new entrants
    * null). Same scale skeleton as q159: ONE event scan to daily counts,
    * each daily count replicated to the ≤7 window-ends it serves (the
    * explode-to-bins trick on time), windows re-derive from the daily
    * rollup with no fact re-read; ranking and the day-over-day self-join
    * run on the |days|×|types| frame. Deterministic ties by type name. */
  val q169 = GraftQuery(
    "q169_trending_leaderboard",
    "Top-3 trailing-7d leaderboard per day with rank movement vs previous day",
    (s, dir) => {
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val win7 = daily
        .withColumn("i", explode(sequence(lit(0), lit(6))))
        .withColumn("wday", date_add(col("d"), col("i")))
        .filter(col("wday") <= lit("2024-01-30").cast("date"))
        .groupBy("wday", "event_type")
        .agg(sum("c").as("c7"))
      val wRank = Window.partitionBy("wday")
        .orderBy(desc("c7"), col("event_type"))
      // |days|×|types| frame, eagerly pinned: the board joins a shifted
      // copy of ITSELF — without the pin both sides re-run the fact scan
      val ranked = win7.withColumn("rank", row_number().over(wRank))
        .localCheckpoint(true)
      val top = ranked.filter(col("rank") <= 3)
      val prev = ranked.select(date_add(col("wday"), 1).as("wday"),
        col("event_type"), col("rank").as("prev_rank"))
      top.join(prev, Seq("wday", "event_type"), "left")
        .select(col("wday"), col("rank").cast("long").as("rank"),
          col("event_type"), col("c7"),
          (col("prev_rank") - col("rank")).cast("long").as("rank_gain"))
        .orderBy("wday", "rank")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS c
        FROM events GROUP BY 1, 2),
      win7 AS (
        SELECT CAST(d + CAST(i AS INTEGER) AS DATE) AS wday, event_type,
               CAST(sum(c) AS BIGINT) AS c7
        FROM daily, unnest(range(0, 7)) t(i)
        WHERE d + CAST(i AS INTEGER) <= DATE '2024-01-30'
        GROUP BY 1, 2),
      ranked AS (
        SELECT wday, event_type, c7,
               row_number() OVER (PARTITION BY wday
                                  ORDER BY c7 DESC, event_type) AS rank
        FROM win7)
      SELECT t.wday, CAST(t.rank AS BIGINT) AS rank, t.event_type, t.c7,
             CAST(p.rank - t.rank AS BIGINT) AS rank_gain
      FROM ranked t
      LEFT JOIN ranked p
        ON p.event_type = t.event_type AND p.wday = t.wday - 1
      WHERE t.rank <= 3
      ORDER BY t.wday, t.rank"""))

  /** First-order MARKOV transition matrix over the event stream — the
    * model behind next-action prediction, funnel-drop diagnosis, and
    * bot-vs-human behavioral fingerprinting: for each user, order events
    * by (ts, event_id) and count each (event_type → next event_type)
    * step, then row-normalize to transition probabilities in integer bp.
    * Scale shape: ONE events scan; the lead() window rides a single
    * user-hash exchange (the same exchange every per-user entry pays —
    * at 100 TB this is the minimal shuffle for any sequential-order
    * computation); the pair rollup and its row-marginal window run on
    * the |types|² frame, which is tiny and independent of corpus size.
    * End-of-stream steps (a user's last event) have no successor and are
    * excluded — the matrix is over OBSERVED transitions, so rows sum to
    * exactly n_from. Tie order within a timestamp is pinned by event_id,
    * making the pairing bit-stable across engines and partitionings. */
  val q175 = GraftQuery(
    "q175_event_transition_matrix",
    "First-order event_type transition matrix per user order, probabilities in bp",
    (s, dir) => {
      val wUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val steps = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(wUser))
        .filter(col("next_type").isNotNull)
      val cells = steps.groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      cells
        .withColumn("n_from", sum("n").over(Window.partitionBy("from_type")))
        .withColumn("p_bp", expr("n * 10000 div n_from"))
        .select("from_type", "to_type", "n", "n_from", "p_bp")
        .orderBy("from_type", "to_type")
    },
    Some("""
      WITH steps AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events),
      cells AS (
        SELECT from_type, to_type, count(*) AS n
        FROM steps WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type)
      SELECT from_type, to_type, n,
             CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
             n * 10000 // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
               AS p_bp
      FROM cells
      ORDER BY from_type, to_type"""))

  /** Sample AUTOCORRELATION of the daily-revenue series at lags 1..7 —
    * the seasonality detector behind q149's seasonal-naive choice (a
    * strong lag-7 ACF is WHY weekly naive beats plain naive) and the
    * first diagnostic in any forecasting pipeline. Exactness discipline:
    * the series is the per-day cents rollup; deviations center on the
    * FLOOR mean (m = S div n — a rational mean would leave BIGINT), and
    * the lag products/denominator accumulate in DECIMAL(38,0) so the
    * ~1e19-cents² sums stay exact where BIGINT would wrap; the final
    * ratio lands in bp via sign-split integral division (the q130 rule —
    * negative ACF would round toward zero differently otherwise).
    * Scale shape: ONE orders scan to the |days| rollup (pinned — seven
    * lag columns derive from it, not from seven re-scans); the lag
    * alignment is a lead() over the day-ordered rollup frame (|days|
    * rows, trivially a single partition at any corpus scale since it is
    * a per-day AGGREGATE, not the fact table). Lag-l numerator uses the
    * n−l observed pairs; the denominator is the full-series sum of
    * squared deviations (the standard biased-ACF normalization, shared
    * across lags so the curve is comparable). */
  val q176 = GraftQuery(
    "q176_daily_revenue_acf",
    "Integer-exact autocorrelation of daily order revenue at lags 1..7, in bp",
    (s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        .localCheckpoint(true)
      val stats = daily.agg(sum("cents").as("ss"), count(lit(1)).as("nn"))
      val dev = daily.crossJoin(broadcast(stats))
        .select(col("d"), (col("cents") - expr("ss div nn")).as("dev"))
      val wd = Window.orderBy("d")
      val lagged = dev.select(Seq(col("d"), col("dev")) ++
        (1 to 7).map(l => lead(col("dev"), l).over(wd).as(s"dev_$l")): _*)
      val den = lagged.agg(
        sum(expr("CAST(dev AS DECIMAL(38,0)) * CAST(dev AS DECIMAL(38,0))"))
          .as("den")).localCheckpoint(true)
      val perLag = lagged.select(col("dev"),
        explode(array((1 to 7).map(l =>
          struct(lit(l).cast("long").as("lag"), col(s"dev_$l").as("devl"))): _*))
          .as("p"))
        .select(col("p.lag").as("lag"), col("dev"), col("p.devl").as("devl"))
        .filter(col("devl").isNotNull)
        .groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("CAST(dev AS DECIMAL(38,0)) * CAST(devl AS DECIMAL(38,0))"))
            .as("num"))
      perLag.crossJoin(broadcast(den))
        .withColumn("acf_bp", expr(
          """CASE WHEN num >= 0
               THEN CAST((num * 10000) div den AS BIGINT)
               ELSE -CAST(((-num) * 10000) div den AS BIGINT) END"""))
        .select("lag", "n_pairs", "acf_bp")
        .orderBy("lag")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1),
      st AS (SELECT CAST(sum(cents) AS BIGINT) AS ss,
                    count(*) AS nn FROM daily),
      dev AS (
        SELECT d, cents - (st.ss // st.nn) AS dev FROM daily, st),
      lagged AS (
        SELECT dev,
               lead(dev, 1) OVER w AS dev_1, lead(dev, 2) OVER w AS dev_2,
               lead(dev, 3) OVER w AS dev_3, lead(dev, 4) OVER w AS dev_4,
               lead(dev, 5) OVER w AS dev_5, lead(dev, 6) OVER w AS dev_6,
               lead(dev, 7) OVER w AS dev_7
        FROM dev WINDOW w AS (ORDER BY d)),
      den AS (
        SELECT sum(CAST(dev AS HUGEINT) * CAST(dev AS HUGEINT)) AS den
        FROM lagged),
      pairs AS (
        SELECT l.lag, lg.dev,
               CASE l.lag WHEN 1 THEN lg.dev_1 WHEN 2 THEN lg.dev_2
                          WHEN 3 THEN lg.dev_3 WHEN 4 THEN lg.dev_4
                          WHEN 5 THEN lg.dev_5 WHEN 6 THEN lg.dev_6
                          ELSE lg.dev_7 END AS devl
        FROM lagged lg, (SELECT CAST(range AS BIGINT) AS lag
                         FROM range(1, 8)) l),
      perlag AS (
        SELECT lag, count(*) AS n_pairs,
               sum(CAST(dev AS HUGEINT) * CAST(devl AS HUGEINT)) AS num
        FROM pairs WHERE devl IS NOT NULL
        GROUP BY lag)
      SELECT lag, n_pairs,
             CASE WHEN num >= 0
               THEN CAST((num * 10000) // den.den AS BIGINT)
               ELSE -CAST(((-num) * 10000) // den.den AS BIGINT) END AS acf_bp
      FROM perlag, den
      ORDER BY lag"""))

  /** CUSUM change-point scan over the daily-revenue series — the
    * classic Page cumulative-sum detector: deviations from the global
    * floor mean accumulate, and a sustained level shift shows up as the
    * extreme of the cumulative path (a mean-stable series random-walks
    * near zero; a shifted regime trends). Reports the top-5 days by
    * |CUSUM| — the candidate change points — with the signed path value
    * and each day's own deviation. All arithmetic is BIGINT cents (the
    * path peaks at ~|days|·|dev| ≈ 1e12, far inside the BIGINT range at
    * any plausible day count); ties on |CUSUM| break by earliest day.
    * Scale shape: same as q176 — ONE orders scan to the pinned |days|
    * rollup; the running sum and the top-k both live on that tiny
    * aggregate frame, and the top-5 is a k-row sort-limit, not a global
    * sort of the fact. */
  val q177 = GraftQuery(
    "q177_cusum_change_points",
    "CUSUM change-point scan on daily revenue: top-5 |cumulative deviation| days",
    (s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        .localCheckpoint(true)
      val stats = daily.agg(sum("cents").as("ss"), count(lit(1)).as("nn"))
      val wPath = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.crossJoin(broadcast(stats))
        .select(col("d"), (col("cents") - expr("ss div nn")).as("dev"))
        .withColumn("cusum", sum("dev").over(wPath))
        .orderBy(abs(col("cusum")).desc, col("d"))
        .limit(5)
        .withColumn("rk", row_number().over(
          Window.orderBy(abs(col("cusum")).desc, col("d"))))
        .select(col("rk").cast("long").as("rk"), col("d"),
          col("cusum"), col("dev"))
        .orderBy("rk")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1),
      st AS (SELECT CAST(sum(cents) AS BIGINT) AS ss,
                    count(*) AS nn FROM daily),
      path AS (
        SELECT d, cents - (st.ss // st.nn) AS dev,
               CAST(sum(cents - (st.ss // st.nn))
                    OVER (ORDER BY d) AS BIGINT) AS cusum
        FROM daily, st)
      SELECT CAST(row_number() OVER (ORDER BY abs(cusum) DESC, d) AS BIGINT)
               AS rk,
             d, cusum, dev
      FROM path
      ORDER BY abs(cusum) DESC, d
      LIMIT 5"""))

  /** CONVERSION-LATENCY distribution — the follow-up question to q70's
    * funnel counts: not "how many users converted" but "how LONG did
    * conversion take", as a banded histogram of first-view → first
    * subsequent purchase latency. Single-scan shape: ONE events pass
    * aggregates per user BOTH the first view time and the (bounded,
    * purchase-only) list of purchase times; the "first purchase AFTER
    * the first view" then resolves row-locally with a HOF filter +
    * array_min — no q70-style second fact scan and self-join, at the
    * cost of per-user state bounded by that user's PURCHASE count (tiny
    * — carrying only the filtered event type is what keeps the list
    * safe at 100 TB). Latencies are exact integer micros → minutes via
    * floor division; bands are a fixed CASE ladder, and the rollup
    * emits count plus integer min/avg/max minutes per band. */
  val q179 = GraftQuery(
    "q179_conversion_latency",
    "First-view to first-purchase latency histogram: fixed bands, integer minutes",
    (s, dir) => {
      val perUser = events(s, dir)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", unix_micros(col("ts"))))
            .as("t1"),
          collect_list(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("pts"))
        .filter(col("t1").isNotNull)
        .withColumn("t2", array_min(expr("filter(pts, t -> t > t1)")))
        .filter(col("t2").isNotNull)
        .withColumn("lat_min", expr("(t2 - t1) div 60000000"))
      perUser
        .withColumn("band", expr(
          """CASE WHEN lat_min < 60        THEN '1_under_1h'
                  WHEN lat_min < 1440      THEN '2_under_1d'
                  WHEN lat_min < 10080     THEN '3_under_1w'
                  ELSE '4_over_1w' END"""))
        .groupBy("band")
        .agg(count(lit(1)).as("n_users"),
          min("lat_min").as("min_min"),
          expr("sum(lat_min) div count(*)").as("avg_min"),
          max("lat_min").as("max_min"))
        .orderBy("band")
    },
    Some("""
      WITH pu AS (
        SELECT user_id,
               min(epoch_us(ts)) FILTER (event_type = 'view') AS t1,
               list(epoch_us(ts)) FILTER (event_type = 'purchase') AS pts
        FROM events GROUP BY user_id),
      lat AS (
        SELECT (list_min(list_filter(pts, t -> t > t1)) - t1) // 60000000
                 AS lat_min
        FROM pu
        WHERE t1 IS NOT NULL
          AND list_min(list_filter(pts, t -> t > t1)) IS NOT NULL),
      banded AS (
        SELECT lat_min,
               CASE WHEN lat_min < 60    THEN '1_under_1h'
                    WHEN lat_min < 1440  THEN '2_under_1d'
                    WHEN lat_min < 10080 THEN '3_under_1w'
                    ELSE '4_over_1w' END AS band
        FROM lat)
      SELECT band, count(*) AS n_users,
             CAST(min(lat_min) AS BIGINT) AS min_min,
             CAST(sum(lat_min) AS BIGINT) // count(*) AS avg_min,
             CAST(max(lat_min) AS BIGINT) AS max_min
      FROM banded
      GROUP BY band
      ORDER BY band"""))

  /** OLS TREND of the daily-revenue series — the closed-form least-squares
    * line every forecast and capacity plan starts from, done integer-exact:
    * slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) and the matching intercept
    * (Σx²Σy − ΣxΣxy)/den, emitted in MILLI-dollars via sign-split integral
    * division (q130 rule); R² = cov²·10⁴ / (varx·vary) in bp. The series
    * is daily DOLLARS (cents div 100 after the rollup — the coarsening
    * keeps cov² ≈ 1e30 safely inside DECIMAL(38,0) where a cents series
    * squared-covariance would brush the 10³⁸ precision wall), x is the
    * day index from the first day. Scale shape: ONE orders scan to the
    * pinned |days| rollup; the five regression sums are a single
    * aggregate over that tiny frame and the closed form is a 1-row
    * projection — nothing about the fit touches the fact twice. */
  val q180 = GraftQuery(
    "q180_revenue_trend_ols",
    "Closed-form OLS trend of daily revenue: slope/intercept in milli-dollars, R2 in bp",
    (s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        .localCheckpoint(true)
      val first = daily.agg(min("d").as("d0"))
      val xy = daily.crossJoin(broadcast(first))
        .select(datediff(col("d"), col("d0")).cast("long").as("x"),
          expr("cents div 100").as("y"))
      val sums = xy.agg(count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))")).as("syy"))
      sums.select(col("n"),
        expr("""CASE WHEN n * sxy - sx * sy >= 0
                  THEN CAST((n * sxy - sx * sy) * 1000
                            div (n * sxx - sx * sx) AS BIGINT)
                  ELSE -CAST((sx * sy - n * sxy) * 1000
                             div (n * sxx - sx * sx) AS BIGINT) END""")
          .as("slope_milli"),
        expr("""CASE WHEN sxx * sy - sx * sxy >= 0
                  THEN CAST((sxx * sy - sx * sxy) * 1000
                            div (n * sxx - sx * sx) div n AS BIGINT)
                  ELSE -CAST((sx * sxy - sxx * sy) * 1000
                             div (n * sxx - sx * sx) div n AS BIGINT) END""")
          .as("intercept_milli"),
        expr("""CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) * 10000
                     div ((n * sxx - sx * sx) * (n * syy - sy * sy))
                AS BIGINT)""").as("r2_bp"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1),
      xy AS (
        SELECT CAST(d - (SELECT min(d) FROM daily) AS BIGINT) AS x,
               cents // 100 AS y
        FROM daily),
      sums AS (
        SELECT count(*) AS n,
               sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
               sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
               sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
        FROM xy)
      SELECT n,
             CASE WHEN n * sxy - sx * sy >= 0
               THEN CAST((n * sxy - sx * sy) * 1000
                         // (n * sxx - sx * sx) AS BIGINT)
               ELSE -CAST((sx * sy - n * sxy) * 1000
                          // (n * sxx - sx * sx) AS BIGINT) END AS slope_milli,
             CASE WHEN sxx * sy - sx * sxy >= 0
               THEN CAST((sxx * sy - sx * sxy) * 1000
                         // (n * sxx - sx * sx) // n AS BIGINT)
               ELSE -CAST((sx * sxy - sxx * sy) * 1000
                          // (n * sxx - sx * sx) // n AS BIGINT)
               END AS intercept_milli,
             CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) * 10000
                  // ((n * sxx - sx * sx) * (n * syy - sy * sy))
                  AS BIGINT) AS r2_bp
      FROM sums"""))

  /** ROLLING EXACT MEDIAN — the robust twin of q92's rolling z-score:
    * a mean-based band swings with every outlier it is supposed to
    * flag; the trailing-7-day MEDIAN band does not. Exactness comes
    * from smallness: each day's window holds ≤ 7 daily totals, so the
    * median is element (n+1) div 2 of the sorted window array (lower
    * median — integer, no interpolation), and deviation lands in
    * sign-split bp. Scale shape: ONE orders scan to the |days| rollup;
    * each daily total replicates to the ≤ 7 window-ends it serves (the
    * q169 explode-to-bins trick — time windows NEVER need a window
    * function over the fact), the per-wday collect is a ≤ 7-element
    * array, and everything downstream is |days|-sized. */
  val q183 = GraftQuery(
    "q183_rolling_median_band",
    "Trailing-7-day exact median of daily revenue + sign-split deviation bp per day",
    (s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        .localCheckpoint(true)
      val lastDay = daily.agg(max("d").as("dmax"))
      val window7 = daily
        .withColumn("i", explode(sequence(lit(0), lit(6))))
        .withColumn("wday", date_add(col("d"), col("i")))
        .crossJoin(broadcast(lastDay))
        .filter(col("wday") <= col("dmax"))
        .groupBy("wday")
        .agg(sort_array(collect_list("cents")).as("win"))
        .withColumn("n_win", size(col("win")).cast("long"))
        .withColumn("median_cents",
          expr("element_at(win, CAST((n_win + 1) div 2 AS INT))"))
      daily.join(window7, col("d") === col("wday"))
        .withColumn("dev_bp", expr(
          """CASE WHEN cents >= median_cents
               THEN (cents - median_cents) * 10000 div median_cents
               ELSE -((median_cents - cents) * 10000 div median_cents) END"""))
        .select("d", "cents", "n_win", "median_cents", "dev_bp")
        .orderBy("d")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1),
      win AS (
        SELECT CAST(d + CAST(i AS INTEGER) AS DATE) AS wday,
               list(cents ORDER BY cents) AS w
        FROM daily, UNNEST(range(0, 7)) t(i)
        WHERE d + CAST(i AS INTEGER) <= (SELECT max(d) FROM daily)
        GROUP BY 1),
      med AS (
        SELECT wday, CAST(len(w) AS BIGINT) AS n_win,
               w[CAST((len(w) + 1) // 2 AS INTEGER)] AS median_cents
        FROM win)
      SELECT daily.d, daily.cents, med.n_win, med.median_cents,
             CASE WHEN daily.cents >= med.median_cents
               THEN (daily.cents - med.median_cents) * 10000
                    // med.median_cents
               ELSE -((med.median_cents - daily.cents) * 10000
                      // med.median_cents) END AS dev_bp
      FROM daily JOIN med ON daily.d = med.wday
      ORDER BY daily.d"""))

  /** DYNAMIC pivot — q148 pivots onto an explicit, hard-coded column set;
    * real BI tools don't know the set and must DISCOVER it first. The
    * production-correct two-phase shape: phase 1 collects the distinct
    * pivot values (a bounded DIMENSION pull — 5 event types here; the
    * same bounded-model-state posture as the ANN centroid pulls, never a
    * fact collect), phase 2 pivots the daily rollup onto exactly that
    * sorted list, so the output schema is data-driven yet deterministic.
    * Spark's pivot with an explicit value list skips the expensive
    * internal distinct job a blind pivot() would run — discovery happens
    * ONCE on the rollup, not per pivot. One events scan to the (day,
    * type) rollup; the pivot is a |days|-row reshape. */
  val q184 = GraftQuery(
    "q184_dynamic_pivot",
    "Two-phase dynamic pivot: discover event types, pivot daily counts onto them",
    (s, dir) => {
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val types = daily.select("event_type").distinct()
        .orderBy("event_type").collect().map(_.getString(0)).toSeq
      val wide = daily.groupBy("d")
        .pivot("event_type", types).sum("n")
      types.foldLeft(wide)((df, t) =>
          df.withColumnRenamed(t, s"n_$t")
            .withColumn(s"n_$t", coalesce(col(s"n_$t"), lit(0L))))
        .withColumn("n_total",
          types.map(t => col(s"n_$t")).reduce(_ + _))
        .orderBy("d")
    },
    Some("""
      SELECT CAST(ts AS DATE) AS d,
             CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0)
               AS BIGINT) AS n_click,
             CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0)
               AS BIGINT) AS n_error,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
               AS BIGINT) AS n_purchase,
             CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN 1 END), 0)
               AS BIGINT) AS n_signup,
             CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0)
               AS BIGINT) AS n_view,
             count(*) AS n_total
      FROM events
      GROUP BY 1
      ORDER BY d"""))

  /** REVENUE BRIDGE — the finance-review decomposition of a
    * month-over-month revenue move into its three exact components:
    * volume effect (Δn at the old average order value), price effect
    * (old volume at the new-vs-old AOV), and the joint term, with
    * ΔR = volume + price + joint holding EXACTLY because the joint
    * term is defined as the remainder (it absorbs both the interaction
    * and the integer floors — the reconciliation discipline that lets
    * the bridge be audited to the micro-dollar instead of "roughly
    * explaining" the move). AOV is a rational (R/n) never materialized:
    * each effect is a single integral division in micro-dollars,
    * sign-split (q130). One orders scan to the |months| rollup; the
    * bridge is a lag window over that tiny frame. */
  val q201 = GraftQuery(
    "q201_revenue_bridge",
    "MoM revenue bridge: volume/price/joint effects in micro-dollars, exact reconciliation",
    (s, dir) => {
      val monthly = table(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        .withColumn("r", expr("cents div 100"))
        .localCheckpoint(true)
      val w = Window.orderBy("m")
      monthly
        .withColumn("n1", lag("n", 1).over(w))
        .withColumn("r1", lag("r", 1).over(w))
        .filter(col("n1").isNotNull)
        .withColumn("delta_micro", expr("(r - r1) * 1000000"))
        .withColumn("vol_micro", expr(
          """CASE WHEN n >= n1
               THEN ((n - n1) * r1 * 1000000) div n1
               ELSE -(((n1 - n) * r1 * 1000000) div n1) END"""))
        .withColumn("price_micro", expr(
          "(n1 * r * 1000000) div n - r1 * 1000000"))
        .withColumn("joint_micro",
          expr("delta_micro - vol_micro - price_micro"))
        .select("m", "n", "r", "delta_micro", "vol_micro", "price_micro",
          "joint_micro")
        .orderBy("m")
    },
    Some("""
      WITH monthly AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS m, count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 // 100 AS r
        FROM orders GROUP BY 1),
      lagged AS (
        SELECT m, n, r,
               lag(n) OVER (ORDER BY m) AS n1,
               lag(r) OVER (ORDER BY m) AS r1
        FROM monthly)
      SELECT m, n, r,
             (r - r1) * 1000000 AS delta_micro,
             CASE WHEN n >= n1
               THEN ((n - n1) * r1 * 1000000) // n1
               ELSE -(((n1 - n) * r1 * 1000000) // n1) END AS vol_micro,
             (n1 * r * 1000000) // n - r1 * 1000000 AS price_micro,
             (r - r1) * 1000000
               - (CASE WHEN n >= n1
                    THEN ((n - n1) * r1 * 1000000) // n1
                    ELSE -(((n1 - n) * r1 * 1000000) // n1) END)
               - ((n1 * r * 1000000) // n - r1 * 1000000) AS joint_micro
      FROM lagged
      WHERE n1 IS NOT NULL
      ORDER BY m"""))

  /** FRAME-DIRECTION spectrum — the two window-frame directions the
    * registry's trailing-heavy entries never pinned: the LEADING frame
    * (next-7-days sum — the demand-visibility number every supply plan
    * reads) and the SUFFIX frame (remaining-to-date total — the
    * "backlog burn-down" denominator), computed alongside the familiar
    * trailing frame so all three directions ride ONE day-ordered window
    * family over the pinned daily rollup. remaining_share_bp divides
    * suffix by the grand total in integer bp. One orders scan; every
    * frame is |days|-sized work. */
  val q203 = GraftQuery(
    "q203_frame_spectrum",
    "Trailing-7, leading-7, and suffix sums on one day-ordered window + remaining share bp",
    (s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        .localCheckpoint(true)
      val w = Window.orderBy("d")
      daily
        .withColumn("trail7",
          sum("cents").over(w.rowsBetween(-6, 0)))
        .withColumn("lead7",
          sum("cents").over(w.rowsBetween(0, 6)))
        .withColumn("suffix",
          sum("cents").over(w.rowsBetween(Window.currentRow,
            Window.unboundedFollowing)))
        .withColumn("total",
          sum("cents").over(Window.partitionBy()))
        .withColumn("remaining_share_bp", expr("suffix * 10000 div total"))
        .select("d", "cents", "trail7", "lead7", "suffix",
          "remaining_share_bp")
        .orderBy("d")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1)
      SELECT d, cents,
             CAST(sum(cents) OVER (ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS trail7,
             CAST(sum(cents) OVER (ORDER BY d
               ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS BIGINT)
               AS lead7,
             CAST(sum(cents) OVER (ORDER BY d
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
               AS suffix,
             CAST(sum(cents) OVER (ORDER BY d
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
               * 10000 // CAST(sum(cents) OVER () AS BIGINT)
               AS remaining_share_bp
      FROM daily
      ORDER BY d"""))

  /** COHORT LTV curve — q71 counts who comes back; this prices it: per
    * signup cohort (first-seen week) and age (weeks since), the
    * CUMULATIVE purchase value per cohort member in micro-cents — the
    * curve whose asymptote is customer lifetime value and whose slope
    * decay times payback. Cumulative sums ride a window over the
    * (cohort × age) rollup; the per-member division is one integral op
    * at the surface (cohort size fixed at birth — the denominator never
    * moves, which is what makes LTV curves comparable across cohorts).
    * One events scan to first-seen + purchases (the q71 join shape);
    * everything after is |cohorts × ages|-sized. */
  val q206 = GraftQuery(
    "q206_cohort_ltv",
    "Cumulative value per cohort member by age week, micro-cents (the LTV curve)",
    (s, dir) => {
      val ev = events(s, dir)
      val cohort = ev.groupBy("user_id")
        .agg(min(expr("CAST(date_trunc('WEEK', ts) AS DATE)")).as("cw"))
      val csize = cohort.groupBy("cw").agg(count(lit(1)).as("n_users"))
      val spend = ev.filter(col("event_type") === "purchase")
        .join(cohort, Seq("user_id"))
        .withColumn("age_w", expr(
          "datediff(CAST(date_trunc('WEEK', ts) AS DATE), cw) div 7"))
        .groupBy("cw", "age_w")
        .agg(sum((dec2(col("value")) * 100).cast("long")).as("cents"))
      val wCum = Window.partitionBy("cw").orderBy("age_w")
      spend
        .withColumn("cum_cents", sum("cents").over(
          wCum.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(csize), Seq("cw"))
        .withColumn("ltv_micro_per_user",
          expr("cum_cents * 10000 div n_users"))
        .select(col("cw"), col("age_w").cast("long").as("age_w"),
          col("n_users"), col("cents"), col("cum_cents"),
          col("ltv_micro_per_user"))
        .orderBy("cw", "age_w")
    },
    Some("""
      WITH cohort AS (
        SELECT user_id,
               min(CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE))
                 AS cw
        FROM events GROUP BY user_id),
      csize AS (SELECT cw, count(*) AS n_users FROM cohort GROUP BY cw),
      spend AS (
        SELECT c.cw,
               (CAST(date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS DATE)
                - c.cw) // 7 AS age_w,
               CAST(sum(CAST(CAST(e.value AS DECIMAL(14,2)) * 100
                 AS BIGINT)) AS BIGINT) AS cents
        FROM events e JOIN cohort c USING (user_id)
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2)
      SELECT s.cw, CAST(s.age_w AS BIGINT) AS age_w, z.n_users, s.cents,
             CAST(sum(s.cents) OVER (PARTITION BY s.cw ORDER BY s.age_w
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
             CAST(sum(s.cents) OVER (PARTITION BY s.cw ORDER BY s.age_w
               ROWS UNBOUNDED PRECEDING) AS BIGINT) * 10000 // z.n_users
               AS ltv_micro_per_user
      FROM spend s JOIN csize z USING (cw)
      ORDER BY cw, age_w"""))

  /** REPURCHASE SURVIVAL curve — q179 histograms view→purchase latency;
    * this one measures LOYALTY: of users with at least two purchases,
    * what fraction repurchased within k days of their FIRST purchase,
    * for k = 1..14 — the discrete survival curve whose complement is
    * churn hazard. The gap computes once per user (first purchase →
    * second purchase via one ranked window), then the curve is the
    * gap distribution swept by a 14-row grid — no per-k re-scan.
    * Integer day gaps, share in bp. */
  val q207 = GraftQuery(
    "q207_repurchase_survival",
    "Fraction of repeat buyers whose 2nd purchase lands within k days, k = 1..14, in bp",
    (s, dir) => {
      val wP = Window.partitionBy("user_id").orderBy("us", "event_id")
      val gaps = events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"))
        .withColumn("rn", row_number().over(wP))
        .filter(col("rn") <= 2)
        .groupBy("user_id")
        .agg(count(lit(1)).as("k"),
          min(when(col("rn") === 1, col("us"))).as("t1"),
          min(when(col("rn") === 2, col("us"))).as("t2"))
        .filter(col("k") === 2)
        .withColumn("gap_days", expr(
          "(t2 - t1) div (CAST(86400 AS BIGINT) * 1000000)"))
        .localCheckpoint(true)
      val totals = gaps.agg(count(lit(1)).as("n_repeat"))
      gaps.withColumn("kday", explode(expr("sequence(1L, 14L)")))
        .filter(col("gap_days") < col("kday"))
        .groupBy("kday")
        .agg(count(lit(1)).as("n_within"))
        .crossJoin(broadcast(totals))
        .withColumn("share_bp", expr("n_within * 10000 div n_repeat"))
        .select(col("kday").as("k_days"), col("n_within"),
          col("n_repeat"), col("share_bp"))
        .orderBy("k_days")
    },
    Some("""
      WITH p AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'),
      gaps AS (
        SELECT user_id,
               (min(CASE WHEN rn = 2 THEN us END)
                - min(CASE WHEN rn = 1 THEN us END))
                 // (CAST(86400 AS BIGINT) * 1000000) AS gap_days
        FROM p WHERE rn <= 2
        GROUP BY user_id
        HAVING count(*) = 2),
      tot AS (SELECT count(*) AS n_repeat FROM gaps)
      SELECT CAST(k AS BIGINT) AS k_days,
             count(*) AS n_within, tot.n_repeat,
             count(*) * 10000 // tot.n_repeat AS share_bp
      FROM gaps, tot, (SELECT unnest(range(1, 15)) AS k)
      WHERE gap_days < k
      GROUP BY k, tot.n_repeat
      ORDER BY k_days"""))

  /** BATCH-INCREMENTAL SESSION STITCHING — the d10/q77 incremental
    * posture applied to sessionization: a daily pipeline must NOT
    * re-sessionize all history to absorb one new batch; it re-reads only
    * the increment plus the OPEN sessions (sessions whose end is within
    * one gap of the cutoff — the only ones a future event can legally
    * extend, since any event ≥ T0 is > 30 min past every other session's
    * end). The stitch: each open session becomes one SEED pseudo-event at
    * its end; the increment plus seeds re-sessionizes under the same
    * 30-min gap rule; a result session containing a seed merges with its
    * base session (start/count carried through the seed), the rest are
    * born new; closed sessions pass through untouched. The entry PROVES
    * incremental ≡ full: the oracle sessionizes the entire events table
    * from scratch and the driver hash-compares. At 100 TB the increment
    * pass scans |batch| + |active users| rows instead of the corpus —
    * sessionization becomes append-cost, the same contract st8's
    * streaming state keeps per key, here checkpointed as a table. */
  val q214 = GraftQuery(
    "q214_incremental_sessions",
    "Session stitching across a batch boundary: increment + open-session seeds ≡ full recompute",
    (s, dir) => {
      val t0 = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
      val ev = events(s, dir)
        .select(col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
      def sessionize(e: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy("user_id").orderBy("ts")
        e.withColumn("prev", lag("ts", 1).over(w))
          .withColumn("brk", when(col("prev").isNull ||
            col("ts") > col("prev") + expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
          .withColumn("sid", sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      }
      // "previous run": sessions over history only
      val baseSessions = sessionize(ev.filter(col("ts") < t0))
        .groupBy("user_id", "sid")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"))
      val open = baseSessions
        .filter(col("session_end") >= t0 - expr("INTERVAL 30 MINUTES"))
      val closed = baseSessions
        .filter(col("session_end") < t0 - expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
      // "new batch": increment + one seed row per open session
      val seeds = open.select(col("user_id"), col("session_end").as("ts"),
        lit(1L).as("is_seed"), col("session_start").as("base_start"),
        col("n_events").as("base_n"))
      val inc = ev.filter(col("ts") >= t0)
        .select(col("user_id"), col("ts"), lit(0L).as("is_seed"),
          lit(null).cast("timestamp_ntz").as("base_start"),
          lit(null).cast("long").as("base_n"))
      val stitched = sessionize(inc.unionByName(seeds))
        .groupBy("user_id", "sid")
        .agg(min("ts").as("new_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_rows"),
          max(when(col("is_seed") === 1L, col("base_start"))).as("base_start"),
          max(when(col("is_seed") === 1L, col("base_n"))).as("base_n"))
        .select(col("user_id"),
          coalesce(col("base_start"), col("new_start")).as("session_start"),
          col("session_end"),
          (col("n_rows") - when(col("base_n").isNotNull, 1L).otherwise(0L) +
            coalesce(col("base_n"), lit(0L))).as("n_events"))
      closed.unionByName(stitched)
        .orderBy("user_id", "session_start")
    },
    Some("""
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      g AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM g)
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events
      FROM s
      GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  /** LINEAR INTERPOLATION GAP-FILL — the time-series repair q102's
    * calendar fill stops short of: q102 materializes the missing days,
    * this VALUES them. Sensor/metric pipelines interpolate interior gaps
    * linearly (prev + slope·distance) and carry the last observation for
    * trailing gaps (no right anchor exists); every day is labeled
    * observed/interpolated/carried so downstream consumers can weight or
    * drop filled points. Missing days are planted deterministically
    * (day % 5 = 0 withheld — the m14 planting convention, so the oracle
    * knows the truth). Integer-exact lerp in cents with SIGN-SPLIT
    * division (Spark `div` truncates toward zero, DuckDB `//` floors —
    * on a falling segment they disagree; splitting on direction keeps
    * the division non-negative, the q130 discipline). One calendar
    * explode per type + two window passes — no self-joins; at 100 TB
    * the gap-fill costs what the q102 calendar fill costs. */
  val q218 = GraftQuery(
    "q218_linear_interpolation",
    "Interior gaps lerp between anchors, trailing gaps carry forward — integer cents, labeled",
    (s, dir) => {
      val observed = events(s, dir)
        .withColumn("d", dayofmonth(col("ts")).cast("long"))
        .filter(col("d") % 5 =!= 0) // withhold every 5th day
        .groupBy(col("event_type"), col("d"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      val calendar = observed.select("event_type").distinct()
        .select(col("event_type"),
          explode(sequence(lit(1L), lit(30L))).as("d"))
      val wPrev = Window.partitionBy("event_type").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy("event_type").orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      calendar.join(observed, Seq("event_type", "d"), "left_outer")
        .withColumn("pc", last(col("cents"), ignoreNulls = true).over(wPrev))
        .withColumn("pd", last(when(col("cents").isNotNull, col("d")),
          ignoreNulls = true).over(wPrev))
        .withColumn("nc", first(col("cents"), ignoreNulls = true).over(wNext))
        .withColumn("nd", first(when(col("cents").isNotNull, col("d")),
          ignoreNulls = true).over(wNext))
        .select(col("event_type"), col("d"),
          when(col("cents").isNotNull, col("cents"))
            .when(col("nc").isNull, col("pc")) // trailing gap: carry
            .otherwise(expr("""CASE WHEN nc >= pc
                THEN pc + (nc - pc) * (d - pd) div (nd - pd)
                ELSE pc - (pc - nc) * (d - pd) div (nd - pd) END"""))
            .as("cents_filled"),
          when(col("cents").isNotNull, lit("observed"))
            .when(col("nc").isNull, lit("carried"))
            .otherwise(lit("interpolated")).as("fill"))
        .orderBy("event_type", "d")
    },
    Some("""
      WITH observed AS (
        SELECT event_type, CAST(day(CAST(ts AS TIMESTAMP)) AS BIGINT) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        WHERE day(CAST(ts AS TIMESTAMP)) % 5 <> 0
        GROUP BY 1, 2),
      cal AS (
        SELECT t.event_type, CAST(g.d AS BIGINT) AS d
        FROM (SELECT DISTINCT event_type FROM observed) t,
             UNNEST(range(1, 31)) AS g(d)),
      anchored AS (
        SELECT c.event_type, c.d, o.cents,
               last_value(o.cents IGNORE NULLS) OVER wp AS pc,
               last_value(CASE WHEN o.cents IS NOT NULL THEN c.d END
                 IGNORE NULLS) OVER wp AS pd,
               first_value(o.cents IGNORE NULLS) OVER wn AS nc,
               first_value(CASE WHEN o.cents IS NOT NULL THEN c.d END
                 IGNORE NULLS) OVER wn AS nd
        FROM cal c LEFT JOIN observed o USING (event_type, d)
        WINDOW
          wp AS (PARTITION BY c.event_type ORDER BY c.d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wn AS (PARTITION BY c.event_type ORDER BY c.d
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT event_type, d,
             CASE WHEN cents IS NOT NULL THEN cents
                  WHEN nc IS NULL THEN pc
                  WHEN nc >= pc THEN pc + (nc - pc) * (d - pd) // (nd - pd)
                  ELSE pc - (pc - nc) * (d - pd) // (nd - pd) END
               AS cents_filled,
             CASE WHEN cents IS NOT NULL THEN 'observed'
                  WHEN nc IS NULL THEN 'carried'
                  ELSE 'interpolated' END AS fill
      FROM anchored
      ORDER BY event_type, d"""))

  /** CLICKSTREAM PATH MINING — "which 3-step journeys dominate": per
    * user, the event-type sequence in (ts, event_id) order collapses to
    * its sliding trigrams and the corpus-wide trigram counts rank the
    * top journeys — the navigation-path report behind funnel DESIGN
    * (q70/q89 check a KNOWN pattern; q229 discovers which patterns are
    * worth checking). Scale shape: one user_id exchange builds each
    * user's ordered type array (collect_list over a sorted window — the
    * sequence is the unit of analysis, and per-user history is the
    * bounded dimension here), trigram formation is row-local zip_with
    * over two slices (t60's pairing trick extended to 3), and the only
    * other exchange is the Zipf-bounded trigram count; top-10 rides
    * TakeOrderedAndProject. Distinct-user counts per path separate "one
    * bot looped 500 times" from "everyone does this". */
  val q229 = GraftQuery(
    "q229_event_path_trigrams",
    "Top-10 3-step event-type journeys: corpus counts + distinct users per path",
    (s, dir) => {
      val ordered = events(s, dir)
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      val seqs = ordered
        .groupBy("user_id")
        .agg(expr("sort_array(collect_list(struct(rn, event_type)))").as("st"))
        .select(col("user_id"), expr("transform(st, x -> x.event_type)").as("l"))
      val tri = seqs.select(col("user_id"), explode(expr(
          "zip_with(slice(l, 1, size(l) - 2), " +
            "zip_with(slice(l, 2, size(l) - 2), slice(l, 3, size(l) - 2), " +
            "(y, z) -> struct(y AS b, z AS c)), " +
            "(x, p) -> concat(x, ' > ', p.b, ' > ', p.c))")).as("path"))
      tri.groupBy("path")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_occurrences").desc, col("path"))
        .limit(10)
    },
    Some("""
      WITH ordered AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events),
      seqs AS (
        SELECT user_id, list(event_type ORDER BY rn) AS l
        FROM ordered GROUP BY user_id),
      tri AS (
        SELECT user_id,
               l[i] || ' > ' || l[i + 1] || ' > ' || l[i + 2] AS path
        FROM (SELECT user_id, l,
                     unnest(generate_series(1, len(l) - 2)) AS i
              FROM seqs))
      SELECT path, count(*) AS n_occurrences,
             count(DISTINCT user_id) AS n_users
      FROM tri
      GROUP BY path
      ORDER BY n_occurrences DESC, path
      LIMIT 10"""))

  /** INTERVAL-OVERLAP PAIR DETECTION (double booking) — q107 counts how
    * many intervals are simultaneously open and q118 merges them; this
    * finds WHICH pairs collide, the conflict-listing shape behind booking
    * systems, shift scheduling, and change-window collision checks. The
    * naive form is a per-key quadratic θ-join (s1 ≤ e2 AND s2 ≤ e1 is not
    * an equi-condition); the scalable form buckets TIME: cell length ≥
    * max interval duration, so every interval touches ≤ 2 cells; both
    * sides explode to their touched cells and join on (key, cell) — pure
    * equi-join. Exactly-once reporting WITHOUT a distinct pass is the
    * computational-geometry trick: a pair may meet in up to 2 shared
    * cells, so it is reported only in the cell containing max(s1, s2) —
    * a unique cell per pair — with oka < okb killing the mirror (q235's
    * accounting, extended from points to extents). Intervals are
    * synthesized deterministically from a bounded orders slice (start =
    * orderdate, duration = orderkey % 21 days < the 21-day cell;
    * resource = custkey % 25); the DuckDB oracle is the per-resource
    * quadratic form, so equal hashes prove the bucketed join finds every
    * collision exactly once. At 100 TB: cells bound the blow-up at 2×,
    * the join partitions on (resource, cell), and a long interval just
    * means a coarser cell. */
  val q238 = GraftQuery(
    "q238_interval_overlap_pairs",
    "Per-resource overlapping order-interval pairs via time-cell equi-join, reported exactly once",
    (s, dir) => {
      val iv = table(s, dir, "orders")
        .filter(col("o_custkey") < 300)
        .select(expr("CAST(o_custkey % 25 AS BIGINT)").as("res"),
          col("o_orderkey").cast("long").as("ok"),
          unix_date(to_date(col("o_orderdate"))).cast("long").as("st"))
        .withColumn("en", col("st") + expr("ok % 21"))
      val exploded = iv.select(col("res"), col("ok"), col("st"), col("en"),
        explode(expr("sequence(st div 21, en div 21)")).as("cell"))
      val a = exploded.select(col("res"), col("cell"),
        col("ok").as("oka"), col("st").as("sa"), col("en").as("ea"))
      val b = exploded.select(col("res"), col("cell"),
        col("ok").as("okb"), col("st").as("sb"), col("en").as("eb"))
      a.join(b, Seq("res", "cell"))
        .filter(col("oka") < col("okb") &&
          col("sa") <= col("eb") && col("sb") <= col("ea") &&
          col("cell") === expr("greatest(sa, sb) div 21"))
        .select(col("res"), col("oka"), col("okb"),
          (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb")) + 1)
            .as("overlap_days"))
        .orderBy("res", "oka", "okb")
    },
    Some("""
      WITH iv AS (
        SELECT CAST(o_custkey % 25 AS BIGINT) AS res,
               CAST(o_orderkey AS BIGINT) AS ok,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                 AS st,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                 + CAST(o_orderkey AS BIGINT) % 21 AS en
        FROM orders WHERE o_custkey < 300)
      SELECT a.res, a.ok AS oka, b.ok AS okb,
             CAST(least(a.en, b.en) - greatest(a.st, b.st) + 1 AS BIGINT)
               AS overlap_days
      FROM iv a JOIN iv b
        ON a.res = b.res AND a.ok < b.ok
       AND a.st <= b.en AND b.st <= a.en
      ORDER BY a.res, oka, okb"""))

  /** CUPED VARIANCE REDUCTION — the modern experimentation readout
    * (Deng/Xu/Kohavi/Walker, WSDM 2013) layered on q167's A/B split:
    * raw between-user variance drowns small treatment effects, so each
    * user's experiment-period metric y is adjusted by their PRE-period
    * covariate x: y_adj = y − θ(x − x̄), θ = cov(x,y)/var(x) estimated
    * POOLED across arms (pre-period data is independent of assignment,
    * so the adjustment cannot bias the contrast — the method's whole
    * point). Dataflow: one pass to per-user (x, y) cent sums split at
    * the period boundary, one aggregate to per-arm moment sums
    * (Σx, Σy, Σx², Σy², Σxy — all exact integers), pooled θ and x̄ from
    * the summed arm rows (a broadcast one-row parameter frame, never a
    * second fact scan), then per-arm means/variances in closed form from
    * the same sums — var(y_adj) = var(y) − 2θcov + θ²var(x). Integer
    * sums make every double derivation bit-identical cross-engine; the
    * variance-reduction bp column is the value proposition made
    * hash-checkable. */
  val q239 = GraftQuery(
    "q239_cuped_readout",
    "A/B readout with CUPED pre-period adjustment: pooled theta, per-arm adjusted means, variance reduction bp",
    (s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id").cast("long").as("u"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
          (col("ts") < lit("2024-01-16").cast("timestamp")).as("pre"))
      val perUser = ev.groupBy("u")
        .agg(sum(when(col("pre"), col("cents")).otherwise(0L)).as("x"),
          sum(when(!col("pre"), col("cents")).otherwise(0L)).as("y"))
        .withColumn("arm", expr("u % 2"))
      val armSums = perUser.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"),
          sum(expr("x * y")).as("sxy"))
      val pooled = armSums.agg(sum("n").as("pn"), sum("sx").as("psx"),
          sum("sy").as("psy"), sum("sxx").as("psxx"), sum("sxy").as("psxy"))
        .select(
          expr("(CAST(pn AS DOUBLE) * psxy - CAST(psx AS DOUBLE) * psy)"
            + " / (CAST(pn AS DOUBLE) * psxx - CAST(psx AS DOUBLE) * psx)")
            .as("theta"),
          expr("CAST(psx AS DOUBLE) / pn").as("xbar"))
      armSums.crossJoin(broadcast(pooled))
        .withColumn("mean_y", expr("CAST(sy AS DOUBLE) / n"))
        .withColumn("mean_x", expr("CAST(sx AS DOUBLE) / n"))
        .withColumn("var_y", expr(
          "CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)"))
        .withColumn("var_x", expr(
          "CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)"))
        .withColumn("cov_xy", expr(
          "CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)"))
        .select(col("arm"), col("n"),
          round(col("mean_y"), 4).as("mean_y"),
          round(expr("mean_y - theta * (mean_x - xbar)"), 4).as("mean_y_adj"),
          round(col("var_y"), 4).as("var_y"),
          round(expr("var_y - 2 * theta * cov_xy + theta * theta * var_x"), 4)
            .as("var_y_adj"),
          floor(expr(
            "(1 - (var_y - 2 * theta * cov_xy + theta * theta * var_x) / var_y) * 10000"))
            .cast("long").as("var_reduction_bp"),
          round(col("theta"), 6).as("theta"))
        .orderBy("arm")
    },
    Some("""
      WITH ev AS (
        SELECT user_id AS u, CAST(round(value * 100) AS BIGINT) AS cents,
               ts < TIMESTAMP '2024-01-16' AS pre
        FROM events),
      per_user AS (
        SELECT u,
               CAST(sum(CASE WHEN pre THEN cents ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN NOT pre THEN cents ELSE 0 END) AS BIGINT) AS y,
               u % 2 AS arm
        FROM ev GROUP BY u),
      arm_sums AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM per_user GROUP BY arm),
      pooled AS (
        SELECT (CAST(sum(n) AS DOUBLE) * sum(sxy)
                  - CAST(sum(sx) AS DOUBLE) * sum(sy))
               / (CAST(sum(n) AS DOUBLE) * sum(sxx)
                  - CAST(sum(sx) AS DOUBLE) * sum(sx)) AS theta,
               CAST(sum(sx) AS DOUBLE) / sum(n) AS xbar
        FROM arm_sums),
      m AS (
        SELECT a.arm, a.n,
               CAST(a.sy AS DOUBLE) / a.n AS mean_y,
               CAST(a.sx AS DOUBLE) / a.n AS mean_x,
               CAST(a.syy AS DOUBLE) / a.n
                 - (CAST(a.sy AS DOUBLE) / a.n) * (CAST(a.sy AS DOUBLE) / a.n)
                 AS var_y,
               CAST(a.sxx AS DOUBLE) / a.n
                 - (CAST(a.sx AS DOUBLE) / a.n) * (CAST(a.sx AS DOUBLE) / a.n)
                 AS var_x,
               CAST(a.sxy AS DOUBLE) / a.n
                 - (CAST(a.sx AS DOUBLE) / a.n) * (CAST(a.sy AS DOUBLE) / a.n)
                 AS cov_xy,
               p.theta, p.xbar
        FROM arm_sums a CROSS JOIN pooled p)
      SELECT arm, n, round(mean_y, 4) AS mean_y,
             round(mean_y - theta * (mean_x - xbar), 4) AS mean_y_adj,
             round(var_y, 4) AS var_y,
             round(var_y - 2 * theta * cov_xy + theta * theta * var_x, 4)
               AS var_y_adj,
             CAST(floor((1 - (var_y - 2 * theta * cov_xy
               + theta * theta * var_x) / var_y) * 10000) AS BIGINT)
               AS var_reduction_bp,
             round(theta, 6) AS theta
      FROM m
      ORDER BY arm"""))

  /** NATIVE WINDOW FUNCTION (AggregateWindowFunction seam) — q252 runs
    * sessionization through graft.expressions.SessionId, a custom
    * DECLARATIVE window function with the same internal contract as
    * row_number/rank: a two-long state machine evaluated in ONE
    * WindowExec pass, where the SQL idiom (q135's lag + cumsum) needs
    * two window passes over the same exchange. The per-user session
    * report (event/session counts, largest session) hash-checks against
    * the DuckDB oracle's lag+cumsum replay — equal hashes prove the
    * custom function's fold semantics exactly; PlanSpec pins the
    * function in the Window node and that the plan carries ONE Window,
    * not the idiom's two. Completes the Catalyst extension matrix:
    * scalar codegen Expression, Generator, TypedImperativeAggregate,
    * physical operators, optimizer rules — and now the window seam. */
  val q252 = GraftQuery(
    "q252_native_window_function",
    "Custom AggregateWindowFunction sessionizer: one window pass == the lag+cumsum idiom",
    (s, dir) => {
      import org.apache.spark.sql.GraftColumnBridge
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.catalyst.expressions.{Ascending, Literal,
        SortOrder, UnspecifiedFrame, WindowExpression, WindowSpecDefinition}
      val ev = events(s, dir).select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("tsm"))
      // the public Column.over round-trips through the Connect column-node
      // layer, which drops a custom window function's OVER — build the
      // catalyst WindowExpression directly (the frame comes from the
      // function's own AggregateWindowFunction default)
      val sid = GraftColumnBridge.column(WindowExpression(
        graft.expressions.SessionId(
          UnresolvedAttribute("tsm"), Literal(1800L * 1000000L)),
        WindowSpecDefinition(
          Seq(UnresolvedAttribute("user_id")),
          Seq(SortOrder(UnresolvedAttribute("tsm"), Ascending),
            SortOrder(UnresolvedAttribute("event_id"), Ascending)),
          UnspecifiedFrame)))
      val sessions = ev.withColumn("sid", sid)
        .groupBy("user_id", "sid").agg(count(lit(1)).as("n"))
      sessions.groupBy("user_id")
        .agg(sum("n").as("n_events"), max("sid").as("n_sessions"),
          max("n").as("largest_session"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS tsm FROM events),
      flagged AS (
        SELECT user_id, tsm, event_id,
               CASE WHEN lag(tsm) OVER w IS NULL
                      OR tsm - lag(tsm) OVER w
                         > CAST(1800 AS BIGINT) * 1000000
                    THEN 1 ELSE 0 END AS nf
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id)),
      sess AS (
        SELECT user_id,
               sum(nf) OVER (PARTITION BY user_id ORDER BY tsm, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged),
      per_session AS (
        SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n
        FROM sess GROUP BY user_id, sid)
      SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
             CAST(max(sid) AS BIGINT) AS n_sessions,
             CAST(max(n) AS BIGINT) AS largest_session
      FROM per_session
      GROUP BY user_id
      ORDER BY user_id"""))

  val all: Seq[GraftQuery] = Seq(q32, q33, q34, q35, q69, q70, q71, q83, q84,
    q86, q89, q91, q92, q96, q102, q107, q118, q130, q132, q135, q137, q149,
    q150, q154, q157, q159, q163, q167, q169, q175, q176, q177, q179,
    q180, q183, q184, q201, q203, q206,
    q207, q214, q218, q229, q238, q239, q252)
}
