"""§2.9 -- event-time windowing, batch twins (SURVEY.md §7 step 7).

The same window expressions run (a) here on the static ``events`` table so
DuckDB can oracle-check them, and (b) as Structured Streaming plans in
``streaming.structured`` (exercised by tests/test_streaming.py with
availableNow triggers). Window sums route through DECIMAL per engine-parity
policy.

Scale notes: tumbling/sliding windows aggregate with map-side partials on
(window, key); session windows are per-user gaps-and-islands -- bounded
state per user in streaming, one partitioned window function in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import gated_broadcast, load_table, table_rowcount
from ..plans.registry import register, track_persist

_DEC = "decimal(28,6)"


@register(
    "st_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def st_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "total_value"))


@register(
    "st_sliding_window",
    oracle="""
    WITH starts AS (
      SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
             event_id, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL 30 MINUTE,
             event_id, value FROM events)
    SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM starts GROUP BY window_start
    """,
)
def st_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes: each event lands in two
    windows (the oracle materializes both starts explicitly)."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "n_events", "total_value"))


@register(
    "st_session_window",
    oracle="""
    WITH seq AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - LAG(CAST(ts AS TIMESTAMP))
                         OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                       > INTERVAL 5 MINUTE
                    OR LAG(CAST(ts AS TIMESTAMP))
                       OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    ses AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM seq)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 5 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM ses GROUP BY user_id, session_id
    """,
)
def st_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 5-minute gap per user -- the streaming twin of
    the document pipeline's sessionized clause scan (SURVEY §2.9 / A2).
    Spark's session_window ends = last event + gap, which the
    gaps-and-islands oracle reproduces."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events"))


@register(
    "st_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def st_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup per key (batch twin of streaming
    dropDuplicates-with-state): deterministic via (ts, event_id) ordering."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_id", "event_type", "value"))


@register(
    "st_max_concurrency",
    oracle="""
    WITH pts AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS t, 1 AS d FROM events
      UNION ALL
      SELECT event_type,
             CAST(ts AS TIMESTAMP)
               + to_seconds(CAST(FLOOR(value * 60) AS BIGINT)) AS t,
             -1 AS d
      FROM events),
    net AS (
      SELECT event_type, t, CAST(SUM(d) AS BIGINT) AS nd
      FROM pts GROUP BY event_type, t),
    run AS (
      SELECT event_type, t,
             SUM(nd) OVER (PARTITION BY event_type ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS conc
      FROM net)
    SELECT event_type,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
           MIN(t) FILTER (WHERE conc = pk) AS peak_start
    FROM (SELECT *, MAX(conc) OVER (PARTITION BY event_type) AS pk FROM run)
    GROUP BY event_type
    """,
)
def st_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency: treating each event as a session
    [ts, ts + value minutes), the peak number of simultaneously open
    sessions per event type, and when the peak first starts.

    The sweep collapses to pure relational algebra: explode each interval
    into a +1/-1 delta point, pre-aggregate deltas per (type, instant) --
    which both shrinks the window input AND makes the running sum
    deterministic (no intra-timestamp ordering exists at all; [start, end)
    semantics fall out of summing a whole instant's net delta at once) --
    then one partitioned running sum. Everything shuffles once on
    event_type; no per-row state, no driver loop. The window's ORDER BY is
    within-partition only -- no global sort."""
    ev = load_table(spark, sf_dir, "events")
    dur = F.floor(F.col("value") * 60).cast("long")
    starts = ev.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("d"))
    ends = ev.select("event_type",
                     F.timestamp_add("SECOND", dur, F.col("ts")).alias("t"),
                     F.lit(-1).alias("d"))
    net = (starts.unionByName(ends)
           .groupBy("event_type", "t").agg(F.sum("d").alias("nd")))
    w = (Window.partitionBy("event_type").orderBy("t")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = net.withColumn("conc", F.sum("nd").over(w))
    wmax = Window.partitionBy("event_type")
    return (run.withColumn("pk", F.max("conc").over(wmax))
            .groupBy("event_type")
            .agg(F.max("conc").alias("peak_concurrency"),
                 F.min(F.when(F.col("conc") == F.col("pk"), F.col("t")))
                 .alias("peak_start")))


@register(
    "st_stream_static_enrich",
    oracle="""
    SELECT date_trunc('hour', CAST(e.ts AS TIMESTAMP)) AS window_start,
           c.c_mktsegment AS segment,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def st_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment, batch twin: purchase events joined to the
    customer dimension and rolled up to hourly revenue per market segment.

    The streaming face (`streaming.structured.streaming_static_enrichment`)
    joins the unbounded stream against the same BROADCAST static dim -- the
    canonical scale shape for stream enrichment: the dim ships once per
    executor, the stream never shuffles for the join, and only the windowed
    aggregation keeps state."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cust = (load_table(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("user_id"),
                    F.col("c_mktsegment").alias("segment")))
    return (ev.join(gated_broadcast(
                cust, table_rowcount(spark, sf_dir, "customer")), "user_id")
            .groupBy(F.window("ts", "1 hour").alias("w"), "segment")
            .agg(F.count(F.lit(1)).alias("n_purchases"),
                 F.sum(F.col("value").cast(_DEC)).cast("double").alias("revenue"))
            .select(F.col("w.start").alias("window_start"), "segment",
                    "n_purchases", "revenue"))


@register(
    "st_multi_granularity_rollup",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket_hour,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket_day,
             value
      FROM events)
    SELECT event_type, bucket_hour, bucket_day,
           CAST(GROUPING(bucket_hour) AS BIGINT) AS g_hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM base
    GROUP BY GROUPING SETS ((event_type, bucket_hour), (event_type, bucket_day))
    """,
)
def st_multi_granularity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hourly AND daily
    aggregates per event type in ONE pass via grouping sets -- the batch
    analog of maintaining multiple materialized rollup granularities. At
    scale this halves the scans vs two separate aggregations and feeds
    downstream dashboards from one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bucket_hour"),
        F.date_trunc("day", "ts").alias("bucket_day"),
        "value")
    base.createOrReplaceTempView("events_mg")
    return spark.sql("""
        SELECT event_type, bucket_hour, bucket_day,
               CAST(GROUPING(bucket_hour) AS BIGINT) AS g_hour,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        FROM events_mg
        GROUP BY GROUPING SETS ((event_type, bucket_hour), (event_type, bucket_day))
    """)


@register(
    "st_click_purchase_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS c_ts
      FROM events WHERE event_type = 'click'),
    purchases AS (
      SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS p_ts
      FROM events WHERE event_type = 'purchase')
    SELECT p.purchase_id,
           CAST(COUNT(*) AS BIGINT) AS n_clicks_1h,
           MIN(c.click_id) AS first_click_id
    FROM purchases p JOIN clicks c
      ON p.user_id = c.user_id
     AND c.c_ts BETWEEN p.p_ts - INTERVAL 1 HOUR AND p.p_ts
    GROUP BY p.purchase_id
    """,
)
def st_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming_click_purchase_join (stream-stream inner join
    with event-time bounds, structured.py:110): purchases matched to the
    same user's clicks in the preceding hour, rolled up per purchase. The
    join is an equi-join on user_id with a range residual -- co-partitioned
    on the user key at any scale, state bounded by the 1-hour range exactly
    as the streaming version's watermark bounds its join buffer."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"),
                      F.col("event_id").alias("click_id")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("ts").alias("p_ts"),
                         F.col("event_id").alias("purchase_id")))
    j = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")))
    return (j.groupBy("purchase_id")
            .agg(F.count(F.lit(1)).alias("n_clicks_1h"),
                 F.min("click_id").alias("first_click_id")))


@register(
    "st_gap_fill_forward",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             CAST(SUM(CAST(value AS {_DEC})) AS DOUBLE) AS hour_value
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM bounds)
    SELECT g.user_id, g.h AS hour_start,
           hr.hour_value IS NOT NULL AS observed,
           LAST_VALUE(hr.hour_value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.h
                   ROWS UNBOUNDED PRECEDING) AS filled_value
    FROM grid g
    LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
    """,
)
def st_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: densify each user's hourly activity onto a
    complete hour grid (min..max observed hour) and forward-fill the last
    observed hourly total across the gaps -- the standard resample+ffill
    step before feature windows or charting, done relationally: per-user
    ``sequence()`` explode for the grid (no driver loop, no cross join
    against a global calendar), one co-partitioned left join, one ordered
    window for the fill. Everything stays partitioned by user_id; grid
    size is bounded per user by its own activity span."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
              .agg(F.sum(F.col("value").cast(_DEC)).cast("double")
                   .alias("hour_value")))
    grid = (hourly.groupBy("user_id")
            .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
            .select("user_id",
                    F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR")))
                     .alias("h")))
    j = grid.join(hourly, ["user_id", "h"], "left")
    w = (Window.partitionBy("user_id").orderBy("h")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return j.select(
        "user_id", F.col("h").alias("hour_start"),
        F.col("hour_value").isNotNull().alias("observed"),
        F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"))


@register(
    "st_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
      GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after_click,
           CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / (SELECT COUNT(*) FROM v) AS view_to_purchase_rate
    """,
)
def st_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view -> click -> purchase): per user, the first
    view, the first click strictly AFTER it, the first purchase strictly
    after that; one row of per-step user counts + the end-to-end rate (an
    exact count ratio, so the double division is engine-identical). Each
    step is a min-aggregate semi-joined to the previous step's users --
    shuffles stay on user_id end to end, and each step's input shrinks, the
    standard funnel shape at event-log scale (no window over the full log,
    no self-join explosion)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") > F.col("t_view"))
         .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") > F.col("t_click"))
         .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    counts = (v.agg(F.count(F.lit(1)).alias("n_viewed"))
              .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
              .crossJoin(p.agg(F.count(F.lit(1))
                               .alias("n_purchased_after_click"))))
    return counts.select(
        "n_viewed", "n_clicked_after_view", "n_purchased_after_click",
        (F.col("n_purchased_after_click").cast("double")
         / F.col("n_viewed")).alias("view_to_purchase_rate"))


@register(
    "st_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS DATE)
               AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
               AS active_week
      FROM events)
    SELECT f.cohort_week,
           CAST(date_diff('week', f.cohort_week, a.active_week) AS BIGINT)
             AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def st_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their first
    event; for each (cohort_week, week_offset) the count of users still
    active. The per-user min and the distinct (user, week) activity set
    both shuffle ONCE on user_id, their join is co-partitioned, and only
    the final tiny (cohort, offset) rollup re-keys -- the standard shape
    for retention matrices over event logs at any scale. week_offset
    counts whole Mondays-to-Monday weeks between truncated dates, so the
    integer division is exact on both engines."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = (ev.groupBy("user_id")
              .agg(F.to_date(F.date_trunc("week", F.min("ts")))
                   .alias("cohort_week")))
    activity = (ev.select("user_id",
                          F.to_date(F.date_trunc("week", "ts"))
                           .alias("active_week"))
                .distinct())
    j = firsts.join(activity, "user_id")
    return (j.groupBy(
                "cohort_week",
                (F.datediff("active_week", "cohort_week") / 7)
                 .cast("long").alias("week_offset"))
            .agg(F.countDistinct("user_id").cast("long").alias("n_active")))


@register(
    "st_anomaly_zscore",
    oracle="""
    WITH sums AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE) AS sxx
      FROM events GROUP BY event_type),
    stats AS (
      SELECT event_type, sx / n AS mu,
             sqrt((sxx - sx * sx / n) / n) AS sigma
      FROM sums
      WHERE (sxx - sx * sx / n) / n > 0),
    scored AS (
      SELECT e.event_type, e.event_id,
             ROUND((e.value - s.mu) / s.sigma, 6) AS zscore,
             row_number() OVER (
               PARTITION BY e.event_type
               ORDER BY ABS((e.value - s.mu) / s.sigma) DESC, e.event_id)
               AS rk
      FROM events e JOIN stats s ON e.event_type = s.event_type)
    SELECT event_type, event_id, zscore
    FROM scored WHERE rk <= 5
    """,
)
def st_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key anomaly scoring: top-5 most anomalous events per type by
    |z-score| against the type's own mean/std -- the standard first-line
    outlier detector over telemetry. Determinism discipline as in
    a_statistics_moments: mu/sigma assemble from DECIMAL-exact power sums
    (one map-side-combinable agg), the per-row z is one identical double
    expression, and the top-k tie-breaks on event_id. Scale shape: tiny
    stats side broadcast back onto the stream of events; the only fact
    shuffle is the per-type top-k window (bounded by k per key)."""
    ev = load_table(spark, sf_dir, "events")
    dec6, dec12 = "decimal(28,6)", "decimal(38,12)"
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(dec6)).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast(dec12))
         .cast("double").alias("sxx"))
    # constant-valued types (variance 0) carry no anomaly signal and would
    # divide by zero under ANSI mode -- excluded identically in the oracle
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n")
    stats = sums.filter(var > 0).select(
        "event_type", (F.col("sx") / F.col("n")).alias("mu"),
        F.sqrt(var).alias("sigma"))
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    scored = (ev.join(F.broadcast(stats), "event_type")
              .select("event_type", "event_id",
                      F.round(z, 6).alias("zscore"),
                      F.row_number().over(
                          Window.partitionBy("event_type")
                          .orderBy(F.abs(z).desc(), F.asc("event_id")))
                      .alias("rk")))
    return scored.filter(F.col("rk") <= 5).drop("rk")


@register(
    "st_trend_slope_exact",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_x,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS rev
      FROM events GROUP BY 1, 2),
    sums AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(day_x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(rev AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(day_x * rev AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(day_x * day_x AS DECIMAL(38,12))) AS DOUBLE) AS sxx
      FROM daily GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS slope_per_day,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) AS intercept
    FROM sums
    """,
)
def st_trend_slope_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key trend estimation: least-squares slope/intercept of daily
    revenue over time -- the freshness/drift signal a pipeline tracks per
    source. Built-in regr_slope streams FP accumulations in partition
    order (unstable across engines/runs); here both regression sums AND
    the daily revenues beneath them route through DECIMAL, leaving one
    identical double expression per output -- bit-stable. Two map-side
    aggs, no extra shuffle: daily rollup then 5-key regression sums."""
    ev = load_table(spark, sf_dir, "events")
    dec6, dec12 = "decimal(28,6)", "decimal(38,12)"
    daily = (ev.groupBy(
                "event_type",
                F.datediff(F.col("ts").cast("date"),
                           F.lit("2024-01-01").cast("date")).alias("day_x"))
             .agg(F.sum(F.col("value").cast(dec6)).cast("double")
                  .alias("rev")))
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("day_x").cast(dec6)).cast("double").alias("sx"),
        F.sum(F.col("rev").cast(dec6)).cast("double").alias("sy"),
        F.sum((F.col("day_x") * F.col("rev")).cast(dec12))
         .cast("double").alias("sxy"),
        F.sum((F.col("day_x") * F.col("day_x")).cast(dec12))
         .cast("double").alias("sxx"))
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    return sums.select(
        "event_type", F.col("n").alias("n_days"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
         .alias("intercept"))


@register(
    "st_event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    pairs AS (
      SELECT event_type, next_type FROM seq WHERE next_type IS NOT NULL),
    totals AS (
      SELECT event_type, COUNT(*) AS n_from FROM pairs GROUP BY event_type)
    SELECT p.event_type AS from_type, p.next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(t.n_from), 6) AS p_transition
    FROM pairs p JOIN totals t ON p.event_type = t.event_type
    GROUP BY p.event_type, p.next_type
    """,
)
def st_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    -- the path-analysis primitive behind 'what do users do after X'
    dashboards and sessionized behavior models. One lead() window per
    user (single user_id shuffle, same partitioning every sequence op
    here reuses), then a 25-cell rollup with the per-source normalizer
    joined back; count ratio is one double division -- deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select("user_id", "event_type",
                       F.lead("event_type").over(w).alias("next_type"))
             .filter(F.col("next_type").isNotNull()))
    totals = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_from"))
    return (pairs.groupBy(F.col("event_type").alias("from_type"),
                          F.col("next_type").alias("to_type"))
            .agg(F.count(F.lit(1)).alias("n"))
            .join(F.broadcast(totals),
                  F.col("from_type") == F.col("event_type"))
            .select("from_type", "to_type", "n",
                    F.round(F.col("n").cast("double") / F.col("n_from"), 6)
                    .alias("p_transition")))


@register(
    "st_interval_coalesce",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s,
             epoch_us(CAST(ts AS TIMESTAMP))
               + (60 + event_id % 540) * 1000000 AS e
      FROM events),
    marked AS (
      SELECT user_id, event_id, value, s, e,
             CASE WHEN s <= MAX(e) OVER (
                      PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS new_island
      FROM iv),
    islands AS (
      SELECT user_id, value, s, e,
             SUM(new_island) OVER (
                 PARTITION BY user_id ORDER BY s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked)
    SELECT user_id, CAST(island AS BIGINT) AS island,
           MIN(s) AS start_us, MAX(e) AS end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM islands GROUP BY user_id, island
    """,
)
def st_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge OVERLAPPING per-user intervals -- the interval-coalesce
    primitive behind concurrency accounting, reservation/booking overlap,
    and redaction-span merging, distinct from `st_session_window`'s
    gap-based islands: here each event carries its own DURATION (a
    deterministic 60s + event_id % 540 so both engines derive identical
    integer bounds in epoch MICROseconds -- no float time arithmetic),
    and two intervals merge when they overlap (closed ends: s <= running
    max end), not when they are merely close.

    Classic gaps-and-islands on intervals: one per-user window computes
    the running MAX(end) over all PRIOR intervals (frame ends at 1
    PRECEDING -- a plain lag(end) is WRONG when a long interval spans
    several short ones), a new island starts where start exceeds it, a
    running SUM numbers the islands, and a final groupBy emits each
    merged interval's bounds and totals. Scale shape: a single user_id
    shuffle shared by both windows and the aggregate (the same
    partitioning every per-user sequence face here reuses); per-user
    state is one running max -- and the LIVE twin is exactly that:
    `stateful.streaming_interval_coalesce` keeps the open interval in
    applyInPandasWithState state and is pinned row- and bit-identical to
    this face's closed islands across micro-batch boundaries
    (tests/test_streaming.py)."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id", "event_id", "value",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts"))
         + (F.lit(60) + F.col("event_id") % 540) * F.lit(1000000))
        .alias("e"))
    order = [F.asc("s"), F.asc("event_id")]
    prior = (Window.partitionBy("user_id").orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, -1))
    upto = (Window.partitionBy("user_id").orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    marked = iv.withColumn(
        "new_island",
        F.when(F.col("s") <= F.max("e").over(prior), 0).otherwise(1))
    islands = marked.withColumn("island",
                                F.sum("new_island").over(upto))
    return (islands.groupBy("user_id",
                            F.col("island").cast("long").alias("island"))
            .agg(F.min("s").alias("start_us"),
                 F.max("e").alias("end_us"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast(_DEC)).cast("double")
                  .alias("total_value")))


_ATTR_WINDOW_US = 24 * 3600 * 1_000_000  # attribution lookback (24 h)


@register(
    "st_attribution_last_touch",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events),
    touched AS (
      SELECT user_id, event_id, event_type, ts_us,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN ts_us END IGNORE NULLS)
               OVER w AS touch_us,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_id END IGNORE NULLS)
               OVER w AS touch_id,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER w AS touch_type
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT user_id, event_id AS purchase_id, ts_us AS purchase_us,
           CASE WHEN touch_us IS NOT NULL
                 AND ts_us - touch_us <= {_ATTR_WINDOW_US}
                THEN touch_id END AS touch_id,
           CASE WHEN touch_us IS NOT NULL
                 AND ts_us - touch_us <= {_ATTR_WINDOW_US}
                THEN touch_type ELSE 'organic' END AS touch_type,
           CASE WHEN touch_us IS NOT NULL
                 AND ts_us - touch_us <= {_ATTR_WINDOW_US}
                THEN ts_us - touch_us END AS us_since_touch
    FROM touched WHERE event_type = 'purchase'
    """,
)
def st_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH marketing attribution: each purchase is credited to the
    user's most recent preceding click/view within a 24 h lookback, else
    'organic' -- the canonical event-analytics attribution shape. The
    carry-forward is `last(CASE WHEN touch THEN x END, ignorenulls=True)`
    over the same (ts, event_id)-ordered per-user frame every sequence
    face here shares (frame ends at 1 PRECEDING so a purchase cannot
    attribute to itself, and purchases never reset the carried touch).
    All time arithmetic in exact epoch microseconds. ONE user_id shuffle;
    per-row state is three carried columns -- the streaming twin would be
    the same CASE columns under applyInPandasWithState."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"))
    w = (Window.partitionBy("user_id").orderBy("ts_us", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    is_touch = F.col("event_type").isin("click", "view")
    touched = ev.select(
        "user_id", "event_id", "event_type", "ts_us",
        F.last(F.when(is_touch, F.col("ts_us")), True).over(w)
         .alias("touch_us"),
        F.last(F.when(is_touch, F.col("event_id")), True).over(w)
         .alias("t_id"),
        F.last(F.when(is_touch, F.col("event_type")), True).over(w)
         .alias("t_type"))
    fresh = (F.col("touch_us").isNotNull()
             & ((F.col("ts_us") - F.col("touch_us")) <= _ATTR_WINDOW_US))
    return (touched.filter(F.col("event_type") == "purchase")
            .select("user_id",
                    F.col("event_id").alias("purchase_id"),
                    F.col("ts_us").alias("purchase_us"),
                    F.when(fresh, F.col("t_id")).alias("touch_id"),
                    F.when(fresh, F.col("t_type")).otherwise("organic")
                     .alias("touch_type"),
                    F.when(fresh, F.col("ts_us") - F.col("touch_us"))
                     .alias("us_since_touch")))


_RFM_USER_DIM_MAX = 5_000_000  # user-dimension rows the unpartitioned
#   ntile windows may sort in one task (~200 MB of narrow rows); enforced
#   with an eager count so the allowlist entry rides a guard (the SN
#   face's idiom), not a docstring claim


@register(
    "st_rfm_segmentation",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events),
    anchor AS (SELECT MAX(ts_us) AS mx FROM ev),
    per_user AS (
      SELECT user_id,
             CAST(((SELECT mx FROM anchor) - MAX(ts_us))
                  // 86400000000 AS BIGINT) AS recency_days,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS frequency,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(28,6))
                           ELSE 0 END) AS DOUBLE) AS monetary
      FROM ev GROUP BY user_id),
    scored AS (
      SELECT user_id, recency_days, frequency, monetary,
             ntile(4) OVER (ORDER BY recency_days ASC, user_id) AS r,
             ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f,
             ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m
      FROM per_user)
    SELECT user_id, recency_days, frequency, monetary, r, f, m,
           CASE WHEN r = 1 AND f = 1 THEN 'champion'
                WHEN r = 1 THEN 'recent'
                WHEN f = 1 THEN 'loyal'
                WHEN r = 4 AND f = 4 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def st_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over the event stream: per-user recency
    (whole days from last activity to the corpus anchor = global max ts,
    exact integer microseconds), purchase frequency, and DECIMAL-routed
    purchase monetary, quartiled with ntile(4) (deterministic: every
    ORDER BY carries the user_id tie-break, and ntile's equal-fill
    semantics agree across engines) and mapped to the classic segment
    labels. Scale: one groupBy(user_id) pass + three ntile windows over
    the USER dimension (one row per user, not per event); the anchor is
    a 1-row aggregate. The unpartitioned ntile windows sort the user
    dimension -- the same documented dimension-window class as the SN
    face (at fact-scale user counts, swap to percent_rank on a sampled
    quantile grid)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value",
        F.unix_micros(F.col("ts")).alias("ts_us"))
    anchor = ev.agg(F.max("ts_us").alias("mx"))
    agg = (ev.groupBy("user_id")
           .agg(F.max("ts_us").alias("last_us"),
                F.sum(F.when(F.col("event_type") == "purchase", 1)
                       .otherwise(0)).cast("long").alias("frequency"),
                F.sum(F.when(F.col("event_type") == "purchase",
                             F.col("value").cast(_DEC))
                       .otherwise(F.lit(0).cast(_DEC)))
                 .cast("double").alias("monetary")))
    # Persist before the eager guard count so the full events groupBy
    # runs once, not once for the guard and again for the returned plan
    # (ADVICE r11); track_persist hands the handle to the registry memo.
    agg = track_persist(agg)
    n_users = agg.count()
    if n_users > _RFM_USER_DIM_MAX:
        raise ValueError(
            f"user dimension has {n_users} rows, exceeding the bound "
            f"{_RFM_USER_DIM_MAX} the unpartitioned ntile windows are "
            "allowlisted under -- swap to percent_rank over a sampled "
            "quantile grid (approx_percentile thresholds) at this scale")
    per_user = (agg.crossJoin(F.broadcast(anchor))
                .select("user_id",
                        F.expr("(mx - last_us) DIV 86400000000")
                         .cast("long").alias("recency_days"),
                        "frequency", "monetary"))
    r = Window.orderBy(F.asc("recency_days"), F.asc("user_id"))
    f = Window.orderBy(F.desc("frequency"), F.asc("user_id"))
    m = Window.orderBy(F.desc("monetary"), F.asc("user_id"))
    scored = per_user.select(
        "user_id", "recency_days", "frequency", "monetary",
        F.ntile(4).over(r).alias("r"),
        F.ntile(4).over(f).alias("f"),
        F.ntile(4).over(m).alias("m"))
    seg = (F.when((F.col("r") == 1) & (F.col("f") == 1), "champion")
           .when(F.col("r") == 1, "recent")
           .when(F.col("f") == 1, "loyal")
           .when((F.col("r") == 4) & (F.col("f") == 4), "at_risk")
           .otherwise("regular"))
    return scored.withColumn("segment", seg)
