"""Structured Streaming plans (SURVEY.md §2.9): the batch-window queries
re-expressed as streams, plus watermarked dedup and foreachBatch stage sinks
mirroring the reference's per-phase snapshots (K2, main.py:154-208).

The event source is the same parquet data read as a file stream; tests run
these with ``trigger(availableNow=True)`` into memory sinks and assert parity
with the batch twins. On a real deployment the source line is the only
change (Kafka/files), because plans are declared against the unbound
DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EVENT_SCHEMA_TEMPLATE = ("event_id long, ts {ts_type}, user_id long, "
                          "event_type string, value double, props string")

_DEC = "decimal(28,6)"


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over events.parquet (nanos ts → microseconds,
    matching catalog.load_table). The file source requires a directory, so
    the parquet file is exposed through a scratch dir symlink -- on a real
    deployment the source would already be a landing directory / Kafka
    topic."""
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    d = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(src, os.path.join(d, "events.parquet"))
    # The declared stream schema must match the file's physical ts type
    # (nanos-as-long vs native micros); probe it with a batch footer read.
    ts_type = dict(spark.read.parquet(src).dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        raw = (spark.readStream
               .schema(_EVENT_SCHEMA_TEMPLATE.format(ts_type="long"))
               .format("parquet").load(d))
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = (spark.readStream
           .schema(_EVENT_SCHEMA_TEMPLATE.format(ts_type=ts_type))
           .format("parquet").load(d))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling window counts -- streaming twin of
    st_tumbling_window. The 30-minute watermark bounds state: windows older
    than (max event time - 30m) are finalized and evicted."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", "30 minutes")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "total_value"))


def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked session windows (5-minute gap) per user -- streaming twin
    of st_session_window."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", "30 minutes")
    return (ev.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events"))


def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful exact dedup on event_id within the watermark horizon
    (dropDuplicatesWithinWatermark, §2.9)."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", "30 minutes")
    return ev.dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory(df: DataFrame, name: str) -> None:
    """Drain an availableNow trigger into a memory sink (test harness)."""
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("complete" if df.isStreaming else "append")
         .trigger(availableNow=True).start())
    q.awaitTermination()


def run_append_to_memory(df: DataFrame, name: str) -> None:
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()


def run_update_to_memory(df: DataFrame, name: str) -> None:
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()


def run_foreach_batch_snapshots(df: DataFrame, out_dir: str) -> None:
    """K2 mirror: per-microbatch parquet stage snapshots
    (reference main.py:154-208 writes per-phase JSON; here each batch lands
    as a parquet stage directory)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_{batch_id:05d}"))

    q = (df.writeStream.foreachBatch(sink)
         .trigger(availableNow=True)
         .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
         .start())
    q.awaitTermination()


def run_foreach_batch_refresh_join(stream_df: DataFrame, dim_path: str,
                                   key: str, out_dir: str) -> None:
    """Refreshing-side-input enrichment: join each microbatch against the
    CURRENT snapshot of a dim table, re-read inside foreachBatch.

    A plan-time stream-static join pins the static side's file listing
    when the query is DEFINED -- dim updates published after start() are
    invisible (or break the listing when old files are compacted away).
    Re-reading inside foreachBatch re-resolves the path every batch, so a
    slowly-changing dimension (republished via overwrite or the versioned
    publish_stage pointer) takes effect on the NEXT microbatch -- the
    standard Structured Streaming pattern for refreshable lookup data.
    Output lands as per-batch parquet (replay-idempotent overwrite per
    batch directory, like run_foreach_batch_snapshots)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        dim = batch_df.sparkSession.read.parquet(dim_path)
        (batch_df.join(F.broadcast(dim), key)
         .write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"batch_{batch_id:05d}")))

    q = (stream_df.writeStream.foreachBatch(sink)
         .trigger(availableNow=True)
         .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
         .start())
    q.awaitTermination()


def streaming_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment -- streaming twin of
    st_stream_static_enrich: the purchase stream joins the static customer
    dimension (broadcast: ships once per executor, stream side never
    shuffles for the join, no join state kept) and rolls up hourly revenue
    per market segment. Only the windowed aggregation is stateful, bounded
    by the watermark."""
    from ..catalog import gated_broadcast, load_table, table_rowcount

    ev = (stream_events(spark, sf_dir)
          .filter(F.col("event_type") == "purchase")
          .withWatermark("ts", "30 minutes"))
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


def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with event-time bounds: purchases joined to
    the same user's clicks from the preceding hour. Both sides are
    watermarked so Spark can bound join state (clicks older than the
    watermark + range are evicted)."""
    ev = stream_events(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"),
                      F.col("event_id").alias("click_id"))
              .withWatermark("c_ts", "30 minutes"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("ts").alias("p_ts"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("value").alias("amount"))
                 .withWatermark("p_ts", "30 minutes"))
    return purchases.join(
        clicks,
        F.expr("p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"))
