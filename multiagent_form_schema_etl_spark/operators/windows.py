"""Window-function surface (SURVEY.md §2.6 W1/W2 + ranking/ntile/frames).

Scale notes: every window below is partitioned (by customer / user / nation)
so state stays bounded per partition and Spark distributes groups across
executors. A global unpartitioned window (like the reference's whole-document
running scan) is only safe per-document -- the document pipeline applies it
with partitionBy(doc_id) (see operators/document.py).

Window SUMs over doubles route through DECIMAL: DuckDB evaluates cumulative
windows with segment trees (different association order than a running
accumulator), so double window-sums are NOT bit-stable across engines --
decimal accumulation is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register

_DEC = "decimal(28,6)"


@register(
    "w1_running_revenue_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_revenue,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS order_seq
    FROM orders
    """,
)
def w1_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum over an ordered partition -- W1 is exactly the reference's
    segment-id running scan (layout_analysis/layout_structure.py:152-168)
    generalized to per-customer order history."""
    orders = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wseq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double")
            .alias("running_revenue"),
        F.row_number().over(wseq).cast("long").alias("order_seq"),
    )


@register(
    "w_rank_top_customers_per_nation",
    oracle="""
    SELECT * FROM (
      SELECT n_name, c_custkey, c_acctbal,
             CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn,
             CAST(RANK() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC) AS BIGINT) AS rnk,
             CAST(DENSE_RANK() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC) AS BIGINT) AS drnk
      FROM customer JOIN nation ON c_nationkey = n_nationkey)
    WHERE rn <= 3
    """,
)
def w_rank_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking trio + top-N-per-group filter (engine extra per SURVEY §2.6)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    j = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    w_det = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_tie = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"))
    return (
        j.select(
            "n_name", "c_custkey", "c_acctbal",
            F.row_number().over(w_det).cast("long").alias("rn"),
            F.rank().over(w_tie).cast("long").alias("rnk"),
            F.dense_rank().over(w_tie).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "w2_lead_lag_event_gaps",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           MAX(gap_us) AS max_gap_us
    FROM (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
      FROM events)
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def w2_lead_lag_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG lookback (W2's next-words peek, layout_structure.py:188-208,
    inverted): inter-event gap per user, aggregated per event type."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = ev.select(
        "event_type",
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_us").alias("total_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


@register(
    "w_ntile_acctbal_quartiles",
    oracle="""
    SELECT tile, COUNT(*) AS n, MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
    FROM (SELECT c_acctbal,
                 CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS tile
          FROM customer)
    GROUP BY tile
    """,
)
def w_ntile_acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing (engine extra). Note: a global ORDER BY window is a
    single-partition sort -- fine for dimension-sized inputs, never for
    facts; at scale use approx percentile_approx instead."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        cust.select("c_acctbal", F.ntile(4).over(w).cast("long").alias("tile"))
        .groupBy("tile")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("c_acctbal").alias("lo"),
             F.max("c_acctbal").alias("hi"))
    )


@register(
    "w_sliding_frame_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6)))
                OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS moving_avg_3
    FROM events
    """,
)
def w_sliding_frame_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding rowsBetween frame: 3-event moving average of event value."""
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, Window.currentRow))
    return ev.select(
        "user_id", "event_id",
        (F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
         / F.count("value").over(w)).alias("moving_avg_3"),
    )


@register(
    "w_percent_rank_cume",
    oracle="""
    SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           CAST(rank() OVER w AS BIGINT) AS rnk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def w_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window family: percent_rank ((rank-1)/(n-1)) and
    cume_dist (rows<=current / n) per nation ordered by balance. Both are
    single integer divisions, so the doubles match bit-for-bit across
    engines; the (c_acctbal, c_custkey) sort is unique, pinning ranks."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("nation"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.rank().over(w).cast("long").alias("rnk"))


@register(
    "w_range_frame_time_window",
    oracle="""
    SELECT user_id, event_id,
           CAST(COUNT(value) OVER w AS BIGINT) AS n_events_1h,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
             AS sum_value_1h
    FROM (SELECT user_id, event_id, value,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def w_range_frame_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based RANGE frame -- the window feature the ROWS-frame family
    cannot express: per event, the count and DECIMAL-routed value sum of
    the user's events in the PRECEDING HOUR (frame bounded by the
    ORDER-BY value, not a row count, so sparse and bursty users get the
    same wall-clock semantics). Ordering key is exact epoch MICROSECONDS
    (integer range arithmetic -- identical frame membership on both
    engines; timestamp ties are RANGE-frame peers and included on both,
    by the standard's definition). Scale shape: one user_id-partitioned
    window over the event relation -- the same single-shuffle contract
    as every w_* face; the frame is evaluated by Spark's sliding range
    accumulator, never by a self-join."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value",
        F.unix_micros(F.col("ts")).alias("ts_us"))
    w = (Window.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(-3_600_000_000, Window.currentRow))
    return ev.select(
        "user_id", "event_id",
        F.count("value").over(w).cast("long").alias("n_events_1h"),
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
         .alias("sum_value_1h"))
