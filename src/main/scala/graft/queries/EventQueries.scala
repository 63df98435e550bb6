package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Exact._

/** Batch-checkable equivalents of the streaming surface (SURVEY.md §2.10):
  * tumbling event-time windows, gap-based sessionization, dedup-to-latest.
  * The same transforms run under Structured Streaming (graft.streaming);
  * here they are oracle-checked against DuckDB on the static events table.
  */
object EventQueries extends QueryPack {

  // ---- tumbling window counts; Spark window() and DuckDB time_bucket are
  //      both epoch-aligned for whole-minute widths ----
  private val tumbling = OracleQuery(
    "e_tumbling_10min",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("window.start").as("bucket_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy(col("bucket_start"), col("event_type")),
    Some(s"""SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket_start,
      event_type, COUNT(*) AS n, ${DSUM("value")} AS total_value
    FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type"""))

  // ---- sliding window counts (10-min window, 5-min slide): each event
  //      lands in exactly window/slide = 2 epoch-aligned windows, so the
  //      oracle reproduces Spark's window(ts, w, s) by unnesting the two
  //      shifted 5-minute buckets. Batch twin of
  //      streaming.EventStreams.slidingCounts ----
  private val sliding = OracleQuery(
    "e_sliding_10min_5min",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy(col("window_start"), col("event_type")),
    Some(s"""SELECT ws AS window_start, event_type, COUNT(*) AS n,
      ${DSUM("value")} AS total_value
    FROM (
      SELECT event_type, value,
        unnest([time_bucket(INTERVAL '5 minutes', ts),
                time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS ws
      FROM events)
    GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  // ---- ordered conversion funnel (view → click → purchase): per user, the
  //      first view, the first click strictly after it, and the first
  //      purchase strictly after that — the classic product-analytics
  //      funnel with step ordering enforced (a purchase before the click
  //      does not count). Three bounded per-user aggregations, each a
  //      broadcast-joinable user-level relation ----
  private val conversionFunnel = OracleQuery(
    "e_conversion_funnel",
    (s, d) => {
      val e = Tables.events(s, d)
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .orderBy(col("user_id"))
    },
    Some("""WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
    FROM v LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    ORDER BY v.user_id"""))

  // ---- weekly cohort retention: users grouped by their first-activity
  //      week; for each (cohort, week offset), how many distinct cohort
  //      members were active — the classic retention triangle. date_trunc
  //      weeks are ISO-Monday-aligned in both engines; offsets from exact
  //      day arithmetic ----
  private val cohortRetention = OracleQuery(
    "e_cohort_retention",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      e.join(cohort, "user_id")
        .groupBy(col("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("long").as("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_wk"), col("week_offset"))
    },
    Some("""WITH e AS (
      SELECT user_id, date_trunc('week', ts) AS wk FROM events
    ), cohort AS (
      SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id
    )
    SELECT c.cohort_wk,
      CAST(date_diff('day', c.cohort_wk, e.wk) / 7 AS BIGINT) AS week_offset,
      COUNT(DISTINCT e.user_id) AS n_active
    FROM e JOIN cohort c ON e.user_id = c.user_id
    GROUP BY 1, 2 ORDER BY cohort_wk, week_offset"""))

  // ---- gap-based sessionization (30-min inactivity gap): the batch analog
  //      of session_window; lag + running flag-sum assigns session ids ----
  private val sessions = OracleQuery(
    "e_sessionize_30min_gap",
    (s, d) => {
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val runs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byTs))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (col("ts") - col("prev_ts")) > expr("INTERVAL '30' MINUTE"), 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(runs))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""WITH flagged AS (
      SELECT user_id, event_id, ts,
        CASE WHEN LAG(ts, 1) OVER w IS NULL
               OR ts - LAG(ts, 1) OVER w > INTERVAL '30 minutes'
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, event_id, ts,
        CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
      MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM numbered GROUP BY user_id, session_id
    ORDER BY user_id, session_id"""))

  // ---- dedup to latest row per key (streaming dropDuplicates analog) ----
  private val latestPerUser = OracleQuery(
    "e_latest_event_per_user",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, event_id, ts, event_type FROM (
      SELECT user_id, event_id, ts, event_type,
        ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1 ORDER BY user_id"""))

  // ---- per-type stats ----
  private val typeStats = OracleQuery(
    "e_event_type_stats",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("total_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type")),
    Some(s"""SELECT event_type, COUNT(*) AS n, ${DSUM("value")} AS total_value,
      MIN(value) AS min_value, MAX(value) AS max_value,
      COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---- as-of join (graft.operators.AsofJoin): for each purchase, the most
  //      recent view at-or-before it per user. DuckDB checks it with its
  //      native ASOF LEFT JOIN; the engine's union-scan form costs one
  //      shuffle + one sort. Right side deduped to one row per (user, ts)
  //      so the match is well-defined in both engines ----
  private val asof = OracleQuery(
    "e_asof_purchase_last_view",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("view_event_id"))
      graft.operators.AsofJoin.asofJoin(
          purchases, views, Seq("user_id"), "ts")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("asof_view_event_id").as("view_event_id"),
          col("asof_ts").as("view_ts"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""SELECT p.user_id, p.event_id, p.ts,
      v.view_event_id, v.ts AS view_ts
    FROM (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, MAX(event_id) AS view_event_id
                    FROM events WHERE event_type = 'view'
                    GROUP BY user_id, ts) v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.user_id, p.ts, p.event_id"""))

  // ---- point-in-time feature join (the feature-store correctness op):
  //      attach to each purchase the per-user feature snapshot AS OF the
  //      event time, with features published at day-END (available from
  //      the NEXT midnight) — the leakage-safe convention: an event never
  //      sees features computed from its own day. Composition of the
  //      running-total feature build and AsofJoin; DuckDB replays it with
  //      its native ASOF LEFT JOIN. First-day purchases correctly get
  //      NULL features (no snapshot exists yet) ----
  private val pitFeatureJoin = OracleQuery(
    "e_pit_feature_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val feats = ev
        .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_day"))
        .select(col("user_id"),
          (col("day") + expr("INTERVAL 1 DAY")).as("ts"),
          sum(col("n_day")).over(Window.partitionBy(col("user_id"))
            .orderBy(col("day"))).as("events_to_date"))
      val spine = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsofJoin.asofJoin(spine, feats, Seq("user_id"), "ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_events_to_date").as("events_to_date"))
        .orderBy(col("event_id"))
    },
    Some("""WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_day
      FROM events GROUP BY 1, 2
    ), feats AS (
      SELECT user_id, day + INTERVAL 1 DAY AS fts,
        CAST(SUM(n_day) OVER (PARTITION BY user_id ORDER BY day) AS BIGINT)
          AS events_to_date
      FROM daily
    ), spine AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT s.event_id, s.user_id, s.ts, f.events_to_date
    FROM spine s
    ASOF LEFT JOIN feats f ON s.user_id = f.user_id AND s.ts >= f.fts
    ORDER BY s.event_id"""))

  // ---- native session_window in batch mode, oracle-checked against the
  //      lag-construction: Spark's merging session state must produce
  //      exactly the sessions the relational gap-flag form derives
  //      (session end = last event + gap, per the session_window contract) --
  private val sessionWindowNative = OracleQuery(
    "e_session_window_native",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start")),
    Some("""WITH flagged AS (
      SELECT user_id, ts,
        CASE WHEN LAG(ts, 1) OVER w IS NULL
               OR ts - LAG(ts, 1) OVER w >= INTERVAL '30 minutes'
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
      MAX(ts) + INTERVAL '30 minutes' AS session_end,
      COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    ORDER BY user_id, session_start"""))

  // ---- the flatMapGroupsWithState sessionizer, oracle-checked in batch
  //      mode: batch execution runs each group once and never fires
  //      timeouts, so the operator emits exactly the CLOSED sessions —
  //      every session except each user's trailing one. That set is
  //      SQL-expressible (the gap construction minus the per-user max
  //      session_id), which turns the custom-state operator into a
  //      hash-verified query instead of a spec-only one. total_value is
  //      deliberately not projected: its FP sum order differs between the
  //      state fn (ts order) and SQL aggregation ----
  private val statefulSessions = OracleQuery(
    "e_stateful_sessionize",
    (s, d) =>
      graft.streaming.EventStreams.statefulSessionize(Tables.events(s, d), 30)
        .toDF()
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start")),
    Some("""WITH flagged AS (
      SELECT user_id, event_id, ts,
        CASE WHEN LAG(ts, 1) OVER w IS NULL
               OR ts - LAG(ts, 1) OVER w > INTERVAL '30 minutes'
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, event_id, ts,
        CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    ), sess AS (
      SELECT user_id, session_id, COUNT(*) AS n_events,
        MIN(ts) AS session_start, MAX(ts) AS session_end
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT user_id, session_start, session_end, n_events
    FROM (SELECT *, MAX(session_id) OVER (PARTITION BY user_id) AS mx FROM sess)
    WHERE session_id < mx
    ORDER BY user_id, session_start"""))

  // ---- session path mining: the most common event-type SEQUENCES across
  //      30-min-gap sessions (the path-analysis half of funnel work: the
  //      funnel asks "how many reached step N", paths ask "what routes do
  //      sessions actually take"). In-session order is pinned by
  //      (ts, event_id): the engine sorts collected (ts, event_id, type)
  //      structs per session (array_sort is deterministic), the oracle
  //      uses ordered string_agg. Scale shape: one keyed window pass for
  //      session ids, one (user, session) agg, then a global top-k that
  //      runs as TakeOrdered over the path-count aggregate ----
  private val sessionPaths = OracleQuery(
    "e_session_paths_top",
    (s, d) => {
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val runs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byTs))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (col("ts") - col("prev_ts")) > expr("INTERVAL '30' MINUTE"), 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(runs))
        .groupBy(col("user_id"), col("session_id"))
        .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))).as("evs"))
        .select(concat_ws(">", transform(col("evs"), _.getField("event_type")))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(10)
    },
    Some("""WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
        CASE WHEN LAG(ts, 1) OVER w IS NULL
               OR ts - LAG(ts, 1) OVER w > INTERVAL '30 minutes'
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, event_id, ts, event_type,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    ), paths AS (
      SELECT user_id, session_id,
        string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT path, COUNT(*) AS n_sessions FROM paths
    GROUP BY path ORDER BY n_sessions DESC, path LIMIT 10"""))

  // ---- event-rate anomaly detection: z-score of each 10-minute bucket's
  //      event count against the TRAILING 6 buckets (frame excludes the
  //      current bucket, so a spike can't mask itself). All inputs are
  //      exact integer counts; mean/variance are single IEEE divisions of
  //      exact sums, so the z-score and the |z| > 2 flag are deterministic
  //      cross-engine. Scale shape: one keyed aggregation to buckets
  //      (map-side combinable), then a window PARTITIONED BY DAY over the
  //      bucket relation — the raw stream is never window-sorted and no
  //      single-partition window appears (each day's first 6 buckets have
  //      no full trailing frame and are excluded by the n_frame gate,
  //      which the day partitioning makes a per-day warm-up) ----
  private val rateAnomaly = OracleQuery(
    "e_rate_anomaly_zscore",
    (s, d) => {
      val buckets = Tables.events(s, d)
        .groupBy((floor(unix_timestamp(col("ts")) / 600L) * 600L).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .withColumn("day", floor(col("bucket") / 86400L))
      val w = Window.partitionBy(col("day")).orderBy(col("bucket"))
        .rowsBetween(-6, -1)
      buckets
        .withColumn("n_frame", count(lit(1)).over(w))
        .withColumn("mu", avg(col("n")).over(w))
        .withColumn("msq", avg(col("n") * col("n")).over(w))
        .filter(col("n_frame") === 6)
        .withColumn("sigma", sqrt(col("msq") - col("mu") * col("mu")))
        .select(col("bucket"), col("n"), col("mu"),
          when(col("sigma") > 0.0,
            (col("n").cast("double") - col("mu")) / col("sigma"))
            .otherwise(lit(0.0)).as("z"),
          (col("sigma") > 0.0 &&
            abs((col("n").cast("double") - col("mu")) / col("sigma")) > 2.0)
            .as("anomaly"))
        .orderBy(col("bucket"))
    },
    Some("""WITH b AS (
      SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket,
        COUNT(*) AS n
      FROM events GROUP BY 1
    ), f AS (
      SELECT bucket, n,
        COUNT(*) OVER w AS n_frame,
        AVG(n) OVER w AS mu,
        AVG(n * n) OVER w AS msq
      FROM b
      WINDOW w AS (PARTITION BY CAST(floor(bucket / 86400) AS BIGINT)
        ORDER BY bucket ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
    )
    SELECT bucket, n, mu,
      CASE WHEN sqrt(msq - mu * mu) > 0
           THEN (CAST(n AS DOUBLE) - mu) / sqrt(msq - mu * mu)
           ELSE 0.0 END AS z,
      (sqrt(msq - mu * mu) > 0 AND
       abs((CAST(n AS DOUBLE) - mu) / sqrt(msq - mu * mu)) > 2.0) AS anomaly
    FROM f WHERE n_frame = 6 ORDER BY bucket"""))

  // ---- time-weighted average: each reading weighted by how long it was
  //      current (until the user's next event) — the correct mean for
  //      irregularly-sampled gauges, where the arithmetic mean over-weights
  //      busy periods. Exactness: value quantizes to cents, durations are
  //      exact micros, products sum in DECIMAL, one final double division —
  //      deterministic cross-engine. One keyed window pass + one agg ----
  private val timeWeighted = OracleQuery(
    "e_time_weighted_value",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("dur_us", col("next_us") - col("us"))
        .withColumn("vd",
          (floor(col("value") * 100).cast("long") * col("dur_us"))
            .cast(DecimalType(27, 0)))
        .groupBy(col("user_id"))
        .agg(
          (sum(col("vd")).cast("double") /
            (sum(col("dur_us")).cast("double") * 100.0)).as("twa"),
          sum(col("dur_us")).as("span_us"))
        .orderBy(col("user_id"))
    },
    Some("""WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, value,
        LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS next_us
      FROM events
    )
    SELECT user_id,
      CAST(SUM(CAST(CAST(floor(value * 100) AS BIGINT) * (next_us - us)
          AS DECIMAL(27,0))) AS DOUBLE)
        / (CAST(SUM(next_us - us) AS DOUBLE) * 100.0) AS twa,
      CAST(SUM(next_us - us) AS BIGINT) AS span_us
    FROM e WHERE next_us IS NOT NULL
    GROUP BY user_id ORDER BY user_id"""))

  // ---- first-order Markov transition matrix over each user's event
  //      sequence: P(next | current) — the behavioral-model artifact
  //      behind next-event prediction and anomaly scoring (a transition
  //      seen at p≈0 is the anomaly). One lead window per user (high-
  //      cardinality key), pair counts, and a single exact-integer
  //      division — the probability doubles are bit-identical
  //      cross-engine, so they ship UNQUANTIZED ----
  private val markovTransitions = OracleQuery(
    "e_markov_transitions",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("c"))
      val totals = pairs.groupBy(col("event_type"))
        .agg(sum(col("c")).as("c_tot"))
      pairs.join(totals, "event_type")
        .select(col("event_type"), col("next_type"), col("c"),
          (col("c").cast("double") / col("c_tot").cast("double")).as("p"))
        .orderBy(col("event_type"), col("next_type"))
    },
    Some("""WITH seq AS (
      SELECT event_type,
        LEAD(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ), totals AS (
      SELECT event_type, CAST(SUM(c) AS BIGINT) AS c_tot
      FROM pairs GROUP BY 1
    )
    SELECT p.event_type, p.next_type, p.c,
      CAST(p.c AS DOUBLE) / CAST(t.c_tot AS DOUBLE) AS p
    FROM pairs p JOIN totals t ON p.event_type = t.event_type
    ORDER BY p.event_type, p.next_type"""))

  // ---- windowed drift monitoring: PSI of each (day, event_type)'s
  //      value distribution against the corpus-wide decile mass — "did
  //      click values drift on Tuesday", the time-series form of
  //      t_psi_drift_by_source. Deciles come from the exact two-pass
  //      GlobalRank NTILE (SQL-replayable, unlike the stream twin's
  //      KLL-derived cuts), counts are exact integers under add-one
  //      smoothing, terms cross the exact-decimal boundary, and only
  //      days with ≥ 50 events report (small cells are all smoothing
  //      noise). Quantized PSI, deterministic ordering → full oracle ----
  private val psiWindowed = OracleQuery(
    "e_psi_drift_windowed",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"),
        to_date(col("ts")).as("day"), col("event_type"), col("value"))
      val dec = graft.operators.GlobalRank.withNtile(ev, 10, "decile",
        col("value"), col("event_id"))
      val cells = dec.groupBy(col("day"), col("event_type"), col("decile"))
        .agg(count(lit(1)).as("c"))
      val winN = cells.groupBy(col("day"), col("event_type"))
        .agg(sum(col("c")).as("n_w")).filter(col("n_w") >= 50)
      val totals = dec.groupBy(col("decile")).agg(count(lit(1)).as("c_b"))
      val n = dec.agg(count(lit(1)).as("n"))
      val grid = winN.crossJoin(broadcast(totals))
      grid.join(cells, Seq("day", "event_type", "decile"), "left")
        .na.fill(0L, Seq("c"))
        .crossJoin(broadcast(n))
        .withColumn("p", (col("c") + lit(1)).cast("double") /
          (col("n_w") + lit(10)).cast("double"))
        .withColumn("q", (col("c_b") + lit(1)).cast("double") /
          (col("n") + lit(10)).cast("double"))
        .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
        .groupBy(col("day"), col("event_type"))
        .agg(max(col("n_w")).as("n_events"),
          floor(dsum(col("term"), 27, 18) * lit(1000000.0)).cast("long")
            .as("psi_q"))
        .orderBy(col("day"), col("event_type"))
    },
    Some(s"""WITH ev AS (
      SELECT event_id, CAST(ts AS DATE) AS day, event_type, value
      FROM events
    ), dec AS (
      SELECT day, event_type,
        NTILE(10) OVER (ORDER BY value, event_id) AS decile
      FROM ev
    ), cells AS (
      SELECT day, event_type, decile, CAST(COUNT(*) AS BIGINT) AS c
      FROM dec GROUP BY 1, 2, 3
    ), winn AS (
      SELECT day, event_type, CAST(SUM(c) AS BIGINT) AS n_w
      FROM cells GROUP BY 1, 2 HAVING SUM(c) >= 50
    ), totals AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS c_b FROM dec GROUP BY 1
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dec
    ), grid AS (
      SELECT w.day, w.event_type, w.n_w, t.decile, t.c_b
      FROM winn w CROSS JOIN totals t
    ), terms AS (
      SELECT g.day, g.event_type, g.n_w,
        (CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / CAST(g.n_w + 10 AS DOUBLE)
          - CAST(g.c_b + 1 AS DOUBLE) / CAST(n.n + 10 AS DOUBLE))
        * ln((CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / CAST(g.n_w + 10 AS DOUBLE))
          / (CAST(g.c_b + 1 AS DOUBLE) / CAST(n.n + 10 AS DOUBLE))) AS term
      FROM grid g
      LEFT JOIN cells c ON c.day = g.day AND c.event_type = g.event_type
        AND c.decile = g.decile
      CROSS JOIN n
    )
    SELECT day, event_type, MAX(n_w) AS n_events,
      CAST(floor(${DSUM("term", 27, 18)} * 1000000.0) AS BIGINT) AS psi_q
    FROM terms GROUP BY day, event_type ORDER BY day, event_type"""))

  // ---- regular-grid gap fill with LOCF (operators/GapFill): the
  //      feature-engineering step turning the irregular event stream into
  //      the fixed-step state grid (6h ticks, epoch-aligned, microsecond-
  //      exact integer boundary arithmetic). The engine runs the
  //      span-derived grid + union-scan as-of fill (one shuffle); DuckDB
  //      replays with generate_series + its native ASOF JOIN — an
  //      independent implementation of the same semantics ----
  private val gapfillLocf = OracleQuery(
    "e_gapfill_locf",
    (s, d) => graft.operators.GapFill.locfGrid(
        Tables.events(s, d).filter(col("user_id") < 40),
        keyCol = "user_id", tsCol = "ts", valueCol = "value",
        stepSeconds = 21600L, tieBreakCol = "event_id")
      .orderBy(col("user_id"), col("slot_ts")),
    Some("""WITH obs AS (
      SELECT user_id, ts, max_by(value, event_id) AS v
      FROM events WHERE user_id < 40 GROUP BY 1, 2
    ), sp AS (
      SELECT user_id, min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
      FROM obs GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(
        (lo + 21599999999) // 21600000000, hi // 21600000000)) AS k
      FROM sp
    ), g AS (
      SELECT user_id, make_timestamp(k * 21600000000) AS slot_ts FROM grid
    )
    SELECT g.user_id, g.slot_ts, o.ts AS locf_obs_ts, o.v AS locf_value
    FROM g ASOF JOIN obs o
      ON g.user_id = o.user_id AND o.ts <= g.slot_ts
    ORDER BY g.user_id, g.slot_ts"""))

  // streaming LOCF grid, batch-mode twin (streaming/StreamingGapFill):
  // the live-monitoring form of e_gapfill_locf run over the complete
  // relation — completeInput pins the horizon to each key's last
  // observation, so the ticks must equal the batch operator (and its
  // DuckDB ASOF replay) ROW FOR ROW. StreamingGapFillSpec pins the
  // multi-batch/watermark/late-data semantics on MemoryStream.
  private val streamGapfill = OracleQuery(
    "tx_stream_gapfill",
    (s, d) => graft.streaming.StreamingGapFill.locfTicks(
        Tables.events(s, d).filter(col("user_id") < 40),
        stepSeconds = 21600L, completeInput = true)
      .toDF()
      .orderBy(col("user_id"), col("slot_ts")),
    Some("""WITH obs AS (
      SELECT user_id, ts, max_by(value, event_id) AS v
      FROM events WHERE user_id < 40 GROUP BY 1, 2
    ), sp AS (
      SELECT user_id, min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
      FROM obs GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(
        (lo + 21599999999) // 21600000000, hi // 21600000000)) AS k
      FROM sp
    ), g AS (
      SELECT user_id, make_timestamp(k * 21600000000) AS slot_ts FROM grid
    )
    SELECT g.user_id, g.slot_ts, o.ts AS locf_obs_ts, o.v AS locf_value
    FROM g ASOF JOIN obs o
      ON g.user_id = o.user_id AND o.ts <= g.slot_ts
    ORDER BY g.user_id, g.slot_ts"""))

  override val all: Seq[OracleQuery] =
    Seq(tumbling, sliding, sessions, latestPerUser, typeStats, asof,
      conversionFunnel, cohortRetention, sessionWindowNative, statefulSessions,
      sessionPaths, rateAnomaly, timeWeighted, psiWindowed,
      markovTransitions, pitFeatureJoin, gapfillLocf, streamGapfill)
}
