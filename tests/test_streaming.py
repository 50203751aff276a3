"""Structured Streaming parity tests: the streaming plans must produce the
same results as their batch twins when drained with availableNow."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from multiagent_form_schema_etl_spark.streaming import batch_windows as bw
from multiagent_form_schema_etl_spark.streaming import structured as st
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_tumbling_matches_batch(spark):
    st.run_to_memory(st.streaming_tumbling_counts(spark, SF_SMOKE), "t_tumble")
    got = _rows(spark.sql("SELECT * FROM t_tumble"))
    want = _rows(bw.st_tumbling_window(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_streaming_session_matches_batch(spark):
    st.run_to_memory(st.streaming_session_counts(spark, SF_SMOKE), "t_sess")
    got = _rows(spark.sql("SELECT * FROM t_sess"))
    want = _rows(bw.st_session_window(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_streaming_static_enrichment_matches_batch(spark):
    st.run_to_memory(st.streaming_static_enrichment(spark, SF_SMOKE), "t_enrich")
    got = _rows(spark.sql("SELECT * FROM t_enrich"))
    want = _rows(bw.st_stream_static_enrich(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_streaming_dedup_drops_nothing_on_unique_ids(spark):
    st.run_append_to_memory(st.streaming_dedup_events(spark, SF_SMOKE), "t_dedup")
    n_stream = spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0]["n"]
    from multiagent_form_schema_etl_spark.catalog import load_table

    n_batch = load_table(spark, SF_SMOKE, "events").dropDuplicates(["event_id"]).count()
    assert n_stream == n_batch > 0


def test_foreach_batch_stage_snapshots(spark):
    import glob
    import os

    with tempfile.TemporaryDirectory() as d:
        st.run_foreach_batch_snapshots(st.stream_events(spark, SF_SMOKE), d)
        batches = sorted(glob.glob(os.path.join(d, "batch_*")))
        assert batches, "no stage snapshots written"
        total = sum(spark.read.parquet(b).count() for b in batches)
        assert total == 1000 or total > 0


def test_apply_in_pandas_with_state_running_counts(spark):
    """Custom stateful streaming operator (applyInPandasWithState, SURVEY
    §2.9): per-user running event counter across microbatches."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def count_events(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    ev = st.stream_events(spark, SF_SMOKE)
    counted = (ev.groupBy("user_id").applyInPandasWithState(
        count_events,
        outputStructType="user_id long, n_events long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))
    st.run_update_to_memory(counted, "t_state")
    got = {r["user_id"]: r["n_events"]
           for r in spark.sql("SELECT * FROM t_state").collect()}
    from multiagent_form_schema_etl_spark.catalog import load_table
    want = {r["user_id"]: r["n"]
            for r in load_table(spark, SF_SMOKE, "events")
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_stream_stream_join_matches_batch(spark):
    """Stream-stream time-bounded join drains to the same pairs as the
    batch equivalent."""
    from multiagent_form_schema_etl_spark.catalog import load_table

    st.run_append_to_memory(
        st.streaming_click_purchase_join(spark, SF_SMOKE), "t_ssj")
    got = sorted((r["purchase_id"], r["click_id"])
                 for r in spark.sql("SELECT * FROM t_ssj").collect())

    ev = load_table(spark, SF_SMOKE, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
                      F.col("event_id").alias("click_id")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
                         F.col("event_id").alias("purchase_id")))
    want = sorted((r["purchase_id"], r["click_id"]) for r in purchases.join(
        clicks,
        F.expr("p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"))
        .collect())
    assert got == want and len(got) > 0


def test_stateful_threshold_batches_state_survives_microbatches(spark, tmp_path):
    """applyInPandasWithState threshold batching: stream the events table as
    TWO ts-ordered files with maxFilesPerTrigger=1, so every user's running
    (acc, n, batch_id) state must cross a micro-batch boundary; the emitted
    closed batches must equal the oracle-backed batch twin's closed rows
    bit-for-bit (identical sequential double accumulation)."""
    import os
    import shutil

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.streaming import stateful as stf

    ev = (load_table(spark, SF_SMOKE, "events")
          .select("user_id", "event_id", "ts", "value"))
    split = ev.orderBy("ts", "event_id").collect()[ev.count() // 2]
    first_half = ((F.col("ts") < split["ts"]) |
                  ((F.col("ts") == split["ts"]) &
                   (F.col("event_id") <= split["event_id"])))

    src = tmp_path / "src"
    src.mkdir()
    for i, (name, part) in enumerate(
            [("a.parquet", ev.filter(first_half)),
             ("b.parquet", ev.filter(~first_half))]):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / name)
        os.utime(src / name, (1_700_000_000 + i, 1_700_000_000 + i))

    raw = (spark.readStream
           .schema("user_id long, event_id long, ts timestamp, value double")
           .format("parquet").option("maxFilesPerTrigger", "1")
           .load(str(src)))
    st.run_append_to_memory(
        stf.streaming_threshold_batches(spark, SF_SMOKE, source=raw),
        "t_thresh")
    got = _rows(spark.sql("SELECT * FROM t_thresh"))
    want = _rows(stf.st_stateful_threshold_batches(spark, SF_SMOKE)
                 .filter("closed"))
    assert got == want and len(got) > 0


def test_threshold_batches_kernel_properties(spark):
    """Every closed batch crosses the threshold exactly once (removing its
    last event drops it back below); open batches stay below it."""
    from multiagent_form_schema_etl_spark.streaming import stateful as stf

    rows = stf.st_stateful_threshold_batches(spark, SF_SMOKE).collect()
    assert all(r["batch_value"] >= 100.0 for r in rows if r["closed"])
    assert all(r["batch_value"] < 100.0 for r in rows if not r["closed"])
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    for u, bs in per_user.items():
        bids = sorted(b["batch_id"] for b in bs)
        assert bids == list(range(1, len(bids) + 1))
        open_bs = [b for b in bs if not b["closed"]]
        assert all(b["batch_id"] == len(bs) for b in open_bs)


def test_tws_running_totals_state_survives_microbatches(spark, tmp_path):
    """transformWithStateInPandas running totals: stream events as TWO
    ts-ordered files with maxFilesPerTrigger=1 so every user's (micros, n)
    ValueState must cross a micro-batch boundary; the per-event update
    stream must equal the oracle-backed batch twin bit-for-bit (integer
    micro-unit accumulation == decimal window sum). Requires the RocksDB
    state store (the transformWithState backend) and protobuf (the state
    client wire format) -- runs on a real protobuf or the vendor/pbshim runtime."""
    import os
    import shutil

    import pytest

    from multiagent_form_schema_etl_spark.streaming.pbcompat import (
        ensure_protobuf)

    try:
        ensure_protobuf(spark)  # real protobuf, or the vendor/pbshim
    except ImportError:
        pytest.skip("no protobuf and the shim failed to import")

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.streaming import stateful as stf

    ev = (load_table(spark, SF_SMOKE, "events")
          .select("user_id", "event_id", "ts", "value"))
    split = ev.orderBy("ts", "event_id").collect()[ev.count() // 2]
    first_half = ((F.col("ts") < split["ts"]) |
                  ((F.col("ts") == split["ts"]) &
                   (F.col("event_id") <= split["event_id"])))

    src = tmp_path / "src"
    src.mkdir()
    for i, (name, part) in enumerate(
            [("a.parquet", ev.filter(first_half)),
             ("b.parquet", ev.filter(~first_half))]):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / name)
        os.utime(src / name, (1_700_000_000 + i, 1_700_000_000 + i))

    raw = (spark.readStream
           .schema("user_id long, event_id long, ts timestamp, value double")
           .format("parquet").option("maxFilesPerTrigger", "1")
           .load(str(src)))
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        st.run_update_to_memory(
            stf.streaming_running_totals_tws(spark, SF_SMOKE, source=raw),
            "t_tws")
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    got = _rows(spark.sql("SELECT * FROM t_tws"))
    want = _rows(stf.st_tws_running_totals(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_gap_fill_grid_is_contiguous_and_filled(spark):
    """Every user's gap-filled grid is a complete hourly sequence from the
    first to the last observed hour; filled_value is never NULL (row 1 is
    always observed) and equals the last observed hourly total."""
    from multiagent_form_schema_etl_spark.plans import registry

    registry.load_all_modules()
    rows = registry.QUERIES["st_gap_fill_forward"](spark, SF_SMOKE).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for rs in by_user.values():
        rs.sort(key=lambda r: r["hour_start"])
        assert rs[0]["observed"]  # grid starts at the first observed hour
        for a, b in zip(rs, rs[1:]):
            assert (b["hour_start"] - a["hour_start"]).total_seconds() == 3600
        assert all(r["filled_value"] is not None for r in rs)
        last = None
        for r in rs:
            if r["observed"]:
                last = r["filled_value"]
            assert r["filled_value"] == last


def test_funnel_steps_monotonically_shrink(spark):
    from multiagent_form_schema_etl_spark.plans import registry

    registry.load_all_modules()
    [r] = registry.QUERIES["st_funnel_conversion"](spark, SF_SMOKE).collect()
    assert r["n_viewed"] >= r["n_clicked_after_view"] >= r["n_purchased_after_click"] >= 0
    assert r["n_viewed"] > 0
    assert abs(r["view_to_purchase_rate"]
               - r["n_purchased_after_click"] / r["n_viewed"]) == 0.0


def test_cohort_retention_offsets_start_at_zero(spark):
    """Every cohort has a week-0 row whose n_active covers every user the
    cohort ever counts (week 0 is the cohort's own first-event week)."""
    from multiagent_form_schema_etl_spark.plans import registry

    registry.load_all_modules()
    rows = registry.QUERIES["st_cohort_retention"](spark, SF_SMOKE).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_active"]
    assert by_cohort
    for offsets in by_cohort.values():
        assert 0 in offsets and min(offsets) == 0
        assert offsets[0] == max(offsets.values())


def test_threshold_batches_state_survives_query_restart(spark, tmp_path):
    """Durable state recovery: drain file 1 with an explicit checkpoint
    location, STOP the query, add file 2, start a NEW query on the same
    checkpoint -- the restarted query must resume from the stored offsets
    (re-emitting nothing) and its state must carry the open batches, so the
    union of both runs' closed batches equals the batch twin's closed rows
    bit-for-bit."""
    import os
    import shutil

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.streaming import stateful as stf

    ev = (load_table(spark, SF_SMOKE, "events")
          .select("user_id", "event_id", "ts", "value"))
    split = ev.orderBy("ts", "event_id").collect()[ev.count() // 2]
    first_half = ((F.col("ts") < split["ts"]) |
                  ((F.col("ts") == split["ts"]) &
                   (F.col("event_id") <= split["event_id"])))

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def add_file(i, part):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / f"{chr(97 + i)}.parquet")
        os.utime(src / f"{chr(97 + i)}.parquet",
                 (1_700_000_000 + i, 1_700_000_000 + i))

    out = str(tmp_path / "out")

    def drain():
        # memory sink can't recover from a checkpoint; the parquet file
        # sink can (exactly-once via its _spark_metadata commit log).
        raw = (spark.readStream
               .schema("user_id long, event_id long, ts timestamp, value double")
               .format("parquet").load(str(src)))
        q = (stf.streaming_threshold_batches(spark, SF_SMOKE, source=raw)
             .writeStream.format("parquet").option("path", out)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return _rows(spark.read.parquet(out))

    add_file(0, ev.filter(first_half))
    run1 = drain()

    add_file(1, ev.filter(~first_half))
    total = drain()  # fresh query, same checkpoint + sink

    want = _rows(stf.st_stateful_threshold_batches(spark, SF_SMOKE)
                 .filter("closed"))
    assert total == want
    run2 = [r for r in total if r not in set(run1)]
    assert len(run1) > 0 and len(run2) > 0  # both runs closed batches
    assert sorted(run1 + run2) == total     # restart re-emitted nothing


def test_streaming_document_pipeline_matches_batch(spark, tmp_path):
    """Documents landed one file at a time must stream through the full
    extraction lifecycle (words → clauses → cascade → validate → recover)
    and append exactly the forms the batch pipeline produces on the same
    blocks -- multiple microbatches, exactly-once sink."""
    from multiagent_form_schema_etl_spark.fixtures import SCHEMA_ROWS
    from multiagent_form_schema_etl_spark.operators import document as D
    from multiagent_form_schema_etl_spark.pipeline import DocumentPipeline
    from multiagent_form_schema_etl_spark.streaming.doc_stream import (
        stream_document_forms,
    )

    blocks = D.blocks_df(spark)
    doc_forms = D.doc_forms_df(spark)
    landing = str(tmp_path / "landing")
    for i, doc in enumerate(r.doc_id for r in
                            blocks.select("doc_id").distinct().collect()):
        # one parquet FILE per document (per-file atomicity = doc boundary)
        (blocks.filter(F.col("doc_id") == doc).coalesce(1)
         .write.mode("append").parquet(landing))
    n_files = len(list((tmp_path / "landing").glob("*.parquet")))
    assert n_files >= 2  # the stream must cross microbatch boundaries

    out = stream_document_forms(spark, landing, str(tmp_path / "out"),
                                SCHEMA_ROWS, doc_forms)
    got = sorted(map(tuple, spark.read.parquet(out)
                 .select("doc_id", "form_name", "field_name", "value")
                 .collect()))
    want = sorted(map(tuple,
                      DocumentPipeline(spark, SCHEMA_ROWS)
                      .recover(blocks, doc_forms)
                      .select("doc_id", "form_name", "field_name", "value")
                      .collect()))
    assert got == want and len(got) > 0


def test_foreach_batch_dim_refresh_picked_up(spark, tmp_path):
    """A dim republish between runs must take effect on the next
    microbatch: run 1 joins dim v1; after overwriting the dim and landing
    a second event file, the checkpointed second run processes ONLY the
    new file and joins the CURRENT dim -- the refreshing-side-input
    pattern a plan-time stream-static join cannot express (its file
    listing pins at query definition)."""
    import glob

    ev_dir = str(tmp_path / "events")
    dim_dir = str(tmp_path / "dim")
    out = str(tmp_path / "out")
    spark.createDataFrame([(1, 10.0, "e1")], "user_id long, value double, event_id string") \
        .write.parquet(ev_dir)
    spark.createDataFrame([(1, "bronze")], "user_id long, segment string") \
        .write.parquet(dim_dir)

    stream = (spark.readStream
              .schema("user_id long, value double, event_id string")
              .parquet(ev_dir))
    st.run_foreach_batch_refresh_join(stream, dim_dir, "user_id", out)
    first = spark.read.parquet(*(glob.glob(f"{out}/batch_*"))).collect()
    assert {r["segment"] for r in first} == {"bronze"}

    # republish the dim and land a new event; same checkpoint => only the
    # new file is processed, against the refreshed dim
    spark.createDataFrame([(1, "gold")], "user_id long, segment string") \
        .write.mode("overwrite").parquet(dim_dir)
    spark.createDataFrame([(1, 20.0, "e2")], "user_id long, value double, event_id string") \
        .write.mode("append").parquet(ev_dir)
    st.run_foreach_batch_refresh_join(stream, dim_dir, "user_id", out)

    rows = {r["event_id"]: r["segment"] for r in
            spark.read.parquet(*(glob.glob(f"{out}/batch_*"))).collect()}
    assert rows == {"e1": "bronze", "e2": "gold"}


def test_stateful_query_under_rocksdb_state_store(spark):
    """The same windowed aggregation must produce identical results under
    the RocksDB state store provider -- the large-state backend for 100 TB
    streaming (state spills off-heap/to disk instead of living on the JVM
    heap like the default HDFSBackedStateStore). Conf is scoped to this
    query and restored."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "org.apache.spark.sql.execution.streaming."
                            "state.RocksDBStateStoreProvider")
        st.run_to_memory(st.streaming_tumbling_counts(spark, SF_SMOKE),
                         "t_rocks")
    finally:
        spark.conf.set(key, old)
    got = _rows(spark.sql("SELECT * FROM t_rocks"))
    want = _rows(bw.st_tumbling_window(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_streaming_trio_matches_oracle_checked_twins(spark):
    """VERDICT r2 item 7: one harness draining the tumbling / session /
    stateful-threshold streaming faces (availableNow) and diffing each
    sink against the exact DataFrame the DuckDB oracle gate verifies --
    the batch twin invoked through the driver-visible registry, not a
    re-derived batch plan. Streaming parity is thereby transitively
    anchored to the oracle."""
    import __spark_entry__ as e

    from multiagent_form_schema_etl_spark.streaming import stateful as stf

    qs = e.queries()
    faces = {
        "st_tumbling_window":
            lambda: st.streaming_tumbling_counts(spark, SF_SMOKE),
        "st_session_window":
            lambda: st.streaming_session_counts(spark, SF_SMOKE),
        "st_stateful_threshold_batches":
            lambda: stf.streaming_threshold_batches(spark, SF_SMOKE),
    }
    for i, (name, face) in enumerate(faces.items()):
        sink = f"trio_{i}"
        if name == "st_stateful_threshold_batches":
            st.run_append_to_memory(face(), sink)
            want = _rows(qs[name](spark, SF_SMOKE).filter("closed"))
        else:
            st.run_to_memory(face(), sink)
            want = _rows(qs[name](spark, SF_SMOKE))
        got = _rows(spark.sql(f"SELECT * FROM {sink}"))
        assert got == want and len(got) > 0, name


def test_tws_recent_list_window_matches_batch(spark, tmp_path):
    """ListState + event-time-timer transformWithState face: streamed as
    TWO ts-ordered files so each user's 3-item ring buffer must cross a
    micro-batch boundary; the per-event recent-window stream must equal
    the oracle-backed batch twin bit-for-bit. Runs on a real protobuf
    or the vendor/pbshim runtime (the state client wire format)."""
    import os
    import shutil

    import pytest

    from multiagent_form_schema_etl_spark.streaming.pbcompat import (
        ensure_protobuf)

    try:
        ensure_protobuf(spark)  # real protobuf, or the vendor/pbshim
    except ImportError:
        pytest.skip("no protobuf and the shim failed to import")

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.streaming import stateful as stf

    ev = (load_table(spark, SF_SMOKE, "events")
          .select("user_id", "event_id", "ts", "value"))
    split = ev.orderBy("ts", "event_id").collect()[ev.count() // 2]
    first_half = ((F.col("ts") < split["ts"]) |
                  ((F.col("ts") == split["ts"]) &
                   (F.col("event_id") <= split["event_id"])))
    src = tmp_path / "src"
    src.mkdir()
    for i, (name, part) in enumerate(
            [("a.parquet", ev.filter(first_half)),
             ("b.parquet", ev.filter(~first_half))]):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / name)
        os.utime(src / name, (1_700_000_000 + i, 1_700_000_000 + i))
    raw = (spark.readStream
           .schema("user_id long, event_id long, ts timestamp, value double")
           .format("parquet").option("maxFilesPerTrigger", "1")
           .load(str(src)))
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        st.run_update_to_memory(
            stf.streaming_recent_list_window_tws(spark, SF_SMOKE, source=raw),
            "t_tws_list")
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    got = _rows(spark.sql("SELECT * FROM t_tws_list"))
    want = _rows(stf.st_tws_recent_list_window(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_tws_event_time_timer_fires_and_clears_idle_state(spark, tmp_path):
    """The ListState face's event-time timer (registered at last_ts + 1h)
    must actually FIRE once the watermark passes it and clear the idle
    user's ring buffer (ADVICE r3: the pre-fix registration multiplied
    epoch-ms by 1000, landing ~1000x past the epoch, so the GC never ran
    and this test's final assertion would see n_last3 == 3).

    Four single-file micro-batches: (1) two user-1 events at T0 register
    a timer at T0+1m+1h; (2) a user-2 event at T0+2h advances the
    watermark past it; (3) another user-2 event gives the runner a batch
    in which user-1's expired timer is handled with no user-1 input; (4)
    a fresh user-1 event must then see an EMPTY buffer -- n_last3 == 1."""
    import os
    import shutil

    import pytest

    from multiagent_form_schema_etl_spark.streaming import stateful as stf
    from multiagent_form_schema_etl_spark.streaming.pbcompat import (
        ensure_protobuf)

    try:
        ensure_protobuf(spark)
    except ImportError:
        pytest.skip("no protobuf and the shim failed to import")

    t0 = 1_700_000_000  # epoch seconds
    batches = [
        [(1, 10, t0, 1.0), (1, 11, t0 + 60, 2.0)],
        [(2, 20, t0 + 7200, 5.0)],
        [(2, 21, t0 + 7260, 6.0)],
        [(1, 12, t0 + 10800, 9.0)],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            [(u, e, ts, v) for u, e, ts, v in rows],
            "user_id long, event_id long, ts_s long, value double"
        ).select("user_id", "event_id",
                 F.timestamp_seconds("ts_s").alias("ts"), "value")
        stage = tmp_path / f"stage{i}"
        df.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / f"{i}.parquet")
        os.utime(src / f"{i}.parquet",
                 (1_700_000_000 + i, 1_700_000_000 + i))

    raw = (spark.readStream
           .schema("user_id long, event_id long, ts timestamp, value double")
           .format("parquet").option("maxFilesPerTrigger", "1")
           .load(str(src))
           .withWatermark("ts", "0 seconds"))
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        st.run_update_to_memory(
            stf.streaming_recent_list_window_tws(spark, SF_SMOKE, source=raw),
            "t_tws_timer")
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    out = {r["event_id"]: r for r in
           spark.sql("SELECT * FROM t_tws_timer").collect()}
    assert out[11]["n_last3"] == 2          # pre-expiry buffer grew
    assert out[12]["n_last3"] == 1, (
        "idle-state GC timer did not fire: user 1's buffer survived "
        f"(n_last3={out[12]['n_last3']})")
    assert out[12]["sum_last3"] == 9.0      # only the fresh event


def test_tws_map_category_totals_matches_batch(spark, tmp_path):
    """MapState transformWithState face (r4, completing the typed-state
    triad): per-user per-event_type running count + decimal sum streamed
    as TWO ts-ordered files so every user's category map must carry
    totals across a micro-batch boundary; the per-event stream must
    equal the oracle-backed batch twin bit-for-bit. Runs on a real
    protobuf or the vendor/pbshim runtime."""
    import os
    import shutil

    import pytest

    from multiagent_form_schema_etl_spark.streaming.pbcompat import (
        ensure_protobuf)

    try:
        ensure_protobuf(spark)
    except ImportError:
        pytest.skip("no protobuf and the shim failed to import")

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.streaming import stateful as stf

    ev = (load_table(spark, SF_SMOKE, "events")
          .select("user_id", "event_id", "ts", "event_type", "value"))
    split = ev.orderBy("ts", "event_id").collect()[ev.count() // 2]
    first_half = ((F.col("ts") < split["ts"]) |
                  ((F.col("ts") == split["ts"]) &
                   (F.col("event_id") <= split["event_id"])))
    src = tmp_path / "src"
    src.mkdir()
    for i, (name, part) in enumerate(
            [("a.parquet", ev.filter(first_half)),
             ("b.parquet", ev.filter(~first_half))]):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / name)
        os.utime(src / name, (1_700_000_000 + i, 1_700_000_000 + i))
    raw = (spark.readStream
           .schema("user_id long, event_id long, ts timestamp, "
                   "event_type string, value double")
           .format("parquet").option("maxFilesPerTrigger", "1")
           .load(str(src)))
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        st.run_update_to_memory(
            stf.streaming_category_totals_tws(spark, SF_SMOKE, source=raw),
            "t_tws_map")
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    got = _rows(spark.sql("SELECT * FROM t_tws_map"))
    want = _rows(stf.st_tws_map_category_totals(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_stateless_band_buckets_match_batch_derivation(spark):
    """The array-function MinHash banding (no explode, no groupBy; the
    streaming face's signature path) must produce the exact (doc_id,
    band, bucket) relation the batch x1_dedup_minhash_lsh face derives
    via explode + groupBy-min over distinct tokens."""
    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.operators import dedup as DD

    docs = load_table(spark, SF_SMOKE, "documents")
    got = {(r["doc_id"], r["band"], r["bucket"])
           for r in DD.minhash_band_buckets(
               docs.select("doc_id", "text")).collect()}

    tok = DD._tok_d_df(spark, SF_SMOKE).select("doc_id", "token")
    mins = [F.min(F.xxhash64(F.lit(k), F.col("token"))).alias(f"h{k}")
            for k in range(DD._MINHASH_K)]
    sigs = tok.groupBy("doc_id").agg(*mins)
    rpb = DD._MINHASH_K // DD._LSH_BANDS
    band_cols = [F.xxhash64(*[F.col(f"h{b * rpb + r}") for r in range(rpb)])
                 .alias(f"band{b}") for b in range(DD._LSH_BANDS)]
    banded = sigs.select("doc_id", *band_cols)
    want = {(r["doc_id"], r["band"], r["bucket"])
            for r in banded.select(
                "doc_id",
                F.posexplode(F.array(*[F.col(f"band{b}")
                                       for b in range(DD._LSH_BANDS)]))
                 .alias("band", "bucket")).collect()}
    assert got == want and len(got) > 0


def test_streaming_lsh_candidates_match_batch_buckets(spark, tmp_path):
    """The live streaming near-dup face: documents stream in as THREE
    files with maxFilesPerTrigger=1 (bucket ListState must carry members
    across micro-batch boundaries), and the emitted candidate pairs must
    equal the documented prefix-cap semantics EXACTLY: per (band,
    bucket), all unordered pairs among the first ``cap`` members in
    arrival order (file index, then doc_id within a micro-batch) -- which
    reduces to the batch face's full pair set on buckets that never
    overflow. This corpus's 40-word vocabulary makes buckets dense, so
    BOTH regimes are exercised (the largest bucket holds hundreds of
    docs; many hold 2-50). Also proves cross-batch pairing: at least one
    emitted pair must span two input files."""
    import os
    import shutil

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.operators import dedup as DD
    from multiagent_form_schema_etl_spark.streaming import dedup_stream as ds

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cut1, cut2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    parts = [docs.filter(F.col("doc_id") <= cut1),
             docs.filter((F.col("doc_id") > cut1)
                         & (F.col("doc_id") <= cut2)),
             docs.filter(F.col("doc_id") > cut2)]
    src = tmp_path / "src"
    src.mkdir()
    file_of = {}
    for i, part in enumerate(parts):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / f"{i}.parquet")
        os.utime(src / f"{i}.parquet",
                 (1_700_000_000 + i, 1_700_000_000 + i))
        for r in part.select("doc_id").collect():
            file_of[r["doc_id"]] = i

    raw = (spark.readStream
           .schema(ds._DOC_SCHEMA)
           .format("parquet").option("maxFilesPerTrigger", "1")
           .load(str(src)))
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        st.run_append_to_memory(
            ds.streaming_lsh_candidates(spark, SF_SMOKE, source=raw),
            "t_lsh_cand")
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    got = {(r["band"], r["bucket"], r["doc_a"], r["doc_b"])
           for r in spark.sql("SELECT * FROM t_lsh_cand").collect()}

    # expectation: per bucket, all pairs among the first cap members in
    # arrival order (file index, then doc_id within a micro-batch)
    buckets = {}
    for r in DD.minhash_band_buckets(
            docs.select("doc_id", "text")).collect():
        buckets.setdefault((r["band"], r["bucket"]), []).append(r["doc_id"])
    sizes = sorted(len(m) for m in buckets.values())
    assert sizes[-1] > 50 and any(2 <= s <= 50 for s in sizes)  # both regimes
    want = set()
    for (b, bk), mem in buckets.items():
        order = sorted(mem, key=lambda d: (file_of[d], d))[:50]
        want.update((b, bk, min(a, c), max(a, c))
                    for i, a in enumerate(order) for c in order[i + 1:])
    assert got == want and len(got) > 0
    # state crossed micro-batches: some pair spans two input files
    assert any(file_of[a] != file_of[b] for _, _, a, b in got)


def test_streaming_lsh_verified_matches_python_reference(spark, tmp_path):
    """End-to-end live near-dup (candidates + stream-static Jaccard
    verification): over a 40-doc slice (no bucket can overflow the cap,
    so candidates = all bucket pairs), the verified pair set and each
    pair's Jaccard must equal an independent pure-Python reference
    (token sets + bucket pairing computed outside Spark's join/verify
    lineage). Streamed as two files crossing a micro-batch boundary."""
    import os
    import shutil

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.operators import dedup as DD
    from multiagent_form_schema_etl_spark.streaming import dedup_stream as ds

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())[:40]
    slice40 = docs.filter(F.col("doc_id").isin(ids))
    src = tmp_path / "src"
    src.mkdir()
    halves = [slice40.filter(F.col("doc_id") <= ids[19]),
              slice40.filter(F.col("doc_id") > ids[19])]
    for i, part in enumerate(halves):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / f"{i}.parquet")
        os.utime(src / f"{i}.parquet",
                 (1_700_000_000 + i, 1_700_000_000 + i))

    raw = (spark.readStream.schema(ds._DOC_SCHEMA)
           .format("parquet").option("maxFilesPerTrigger", "1")
           .load(str(src)))
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        st.run_append_to_memory(
            ds.streaming_lsh_verified(spark, SF_SMOKE, source=raw),
            "t_lsh_ver")
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    rows = spark.sql("SELECT * FROM t_lsh_ver").collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    # ADVICE r7: multi-band collisions must NOT multiply output rows --
    # the default distinct_pairs contract emits each verified pair once
    assert len(rows) == len(got)

    # independent reference: bucket pairing from the (pinned-equal)
    # banding helper, token sets and Jaccard in pure Python
    toks = {r["doc_id"]: {t for t in r["text"].split(" ") if t}
            for r in slice40.select("doc_id", "text").collect()}
    buckets = {}
    for r in DD.minhash_band_buckets(
            slice40.select("doc_id", "text")).collect():
        buckets.setdefault((r["band"], r["bucket"]), []).append(r["doc_id"])
    assert max(len(m) for m in buckets.values()) <= 40  # cap never binds
    want = {}
    for mem in buckets.values():
        for i, a in enumerate(sorted(mem)):
            for b in sorted(mem)[i + 1:]:
                inter = len(toks[a] & toks[b])
                j = inter / (len(toks[a]) + len(toks[b]) - inter)
                if j >= 0.8:
                    want[(a, b)] = j
    assert set(got) == set(want) and len(got) > 0
    for p, jv in want.items():
        assert abs(got[p] - jv) < 1e-12, (p, got[p], jv)


def test_streaming_semantic_decon_matches_batch_face(spark, tmp_path):
    """Live semantic decontamination (stateless stream-side GEMM against
    the static eval matrix) must produce exactly the batch face's
    pre-aggregation hit set -- same pairs, same 9-dp cosines -- over a
    2-file micro-batched embedding stream, and its per-train aggregation
    must equal x5_decontaminate_semantic row-for-row."""
    import os
    import shutil
    from collections import defaultdict

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.operators.llmprep import (
        x5_decontaminate_semantic)
    from multiagent_form_schema_etl_spark.streaming import dedup_stream as ds

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding", "label")
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    halves = [emb.filter(F.col("vec_id") <= ids[len(ids) // 2]),
              emb.filter(F.col("vec_id") > ids[len(ids) // 2])]
    src = tmp_path / "src"
    src.mkdir()
    for i, part in enumerate(halves):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / f"{i}.parquet")
        os.utime(src / f"{i}.parquet",
                 (1_700_000_000 + i, 1_700_000_000 + i))

    raw = (spark.readStream.schema(ds._EMB_SCHEMA)
           .format("parquet").option("maxFilesPerTrigger", "1")
           .load(str(src)))
    st.run_append_to_memory(
        ds.streaming_semantic_decon(spark, SF_SMOKE, source=raw),
        "t_semdecon")
    rows = spark.sql("SELECT * FROM t_semdecon").collect()
    assert rows and len(rows) == len({(r["train_id"], r["heldout_id"])
                                      for r in rows})

    agg = defaultdict(lambda: [0, -1.0, 1 << 62])
    for r in rows:
        a = agg[r["train_id"]]
        a[0] += 1
        a[1] = max(a[1], r["cosine"])
        a[2] = min(a[2], r["heldout_id"])
    want = {r["train_id"]: (r["n_heldout_hits"], r["max_cosine"],
                            r["first_heldout_id"])
            for r in x5_decontaminate_semantic(spark, SF_SMOKE).collect()}
    assert {k: tuple(v) for k, v in agg.items()} == want


def test_streaming_semantic_decon_eval_bound_raises_before_collect(
        spark, monkeypatch):
    """The _SEMDECON_EVAL_MAX guard must fire on a cheap executor-side
    count BEFORE any driver-side collect of the held-out relation
    (ADVICE r9: a post-collect length check defends against nothing --
    the OOM would already have happened)."""
    import pyspark.sql.dataframe as dfmod

    from multiagent_form_schema_etl_spark.streaming import dedup_stream as ds

    monkeypatch.setattr(ds, "_SEMDECON_EVAL_MAX", 0)
    collected = []
    orig_collect = dfmod.DataFrame.collect
    monkeypatch.setattr(
        dfmod.DataFrame, "collect",
        lambda self: (collected.append(1), orig_collect(self))[1])
    try:
        ds.streaming_semantic_decon(spark, SF_SMOKE)
        raise AssertionError("expected ValueError from the eval bound")
    except ValueError as ex:
        assert "benchmark-sized bound" in str(ex)
    assert not collected, "held-out relation was collected before the bound"


def test_streaming_interval_coalesce_state_survives_microbatches(
        spark, tmp_path):
    """applyInPandasWithState interval coalescing: stream the events table
    as TWO ts-ordered files with maxFilesPerTrigger=1 (every user's open
    interval must cross the micro-batch boundary); the emitted CLOSED
    intervals must equal the oracle-backed batch twin's islands minus each
    user's final (still-open) one, total_value bit-for-bit (the kernel's
    integer micro-unit accumulation IS the batch face's DECIMAL(28,6)
    routing)."""
    import os
    import shutil

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.streaming import stateful as stf
    from multiagent_form_schema_etl_spark.streaming.batch_windows import (
        st_interval_coalesce)

    ev = (load_table(spark, SF_SMOKE, "events")
          .select("user_id", "event_id", "ts", "value"))
    split = ev.orderBy("ts", "event_id").collect()[ev.count() // 2]
    first_half = ((F.col("ts") < split["ts"]) |
                  ((F.col("ts") == split["ts"]) &
                   (F.col("event_id") <= split["event_id"])))
    src = tmp_path / "src"
    src.mkdir()
    for i, (name, part) in enumerate(
            [("a.parquet", ev.filter(first_half)),
             ("b.parquet", ev.filter(~first_half))]):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / name)
        os.utime(src / name, (1_700_000_000 + i, 1_700_000_000 + i))

    raw = (spark.readStream
           .schema("user_id long, event_id long, ts timestamp, value double")
           .format("parquet").option("maxFilesPerTrigger", "1")
           .load(str(src)))
    st.run_append_to_memory(
        stf.streaming_interval_coalesce(spark, SF_SMOKE, source=raw),
        "t_icoalesce")
    got = _rows(spark.sql("SELECT * FROM t_icoalesce"))
    batch = st_interval_coalesce(spark, SF_SMOKE)
    last = batch.groupBy("user_id").agg(F.max("island").alias("last_island"))
    want = _rows(batch.join(last, "user_id")
                 .filter(F.col("island") < F.col("last_island"))
                 .drop("last_island"))
    assert got == want and len(got) > 0


def test_rfm_guard_and_attribution_invariants(spark, monkeypatch):
    """RFM: the user-dimension guard raises past the bound (so the
    unpartitioned-ntile allowlist entry rides enforcement); quartile
    labels partition users into equal-fill ntile groups. Attribution:
    every purchase appears exactly once, a credited touch precedes its
    purchase within the 24 h window, and 'organic' rows carry no touch."""
    import pytest

    from multiagent_form_schema_etl_spark.streaming import batch_windows as bw

    rfm = bw.st_rfm_segmentation(spark, SF_SMOKE).collect()
    n_users = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
               .select("user_id").distinct().count())
    assert len(rfm) == n_users
    for col in ("r", "f", "m"):
        counts = sorted(
            sum(1 for x in rfm if x[col] == q) for q in (1, 2, 3, 4))
        assert counts[-1] - counts[0] <= 1  # ntile equal fill
    monkeypatch.setattr(bw, "_RFM_USER_DIM_MAX", 1)
    with pytest.raises(ValueError, match="user dimension"):
        bw.st_rfm_segmentation(spark, SF_SMOKE)

    attr = bw.st_attribution_last_touch(spark, SF_SMOKE).collect()
    ev = {r["event_id"]: r for r in
          (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
           .withColumn("ts_us",
                       F.unix_micros(F.col("ts").cast("timestamp")))
           .collect())}
    purchases = [e for e in ev.values() if e["event_type"] == "purchase"]
    assert len(attr) == len(purchases)
    for a in attr:
        if a["touch_type"] == "organic":
            assert a["touch_id"] is None and a["us_since_touch"] is None
        else:
            t = ev[a["touch_id"]]
            assert t["event_type"] in ("click", "view")
            assert t["user_id"] == a["user_id"]
            assert 0 <= a["us_since_touch"] <= bw._ATTR_WINDOW_US
            assert a["purchase_us"] - t["ts_us"] == a["us_since_touch"]


def test_streaming_attribution_matches_batch(spark, tmp_path):
    """applyInPandasWithState last-touch attribution: two-file ordered
    source (maxFilesPerTrigger=1) so carried touches must cross the
    micro-batch boundary; output must equal the oracle-backed batch twin
    row-for-row (attribution emits per purchase, so unlike the interval
    face there is no open tail to subtract)."""
    import os
    import shutil

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.streaming import stateful as stf
    from multiagent_form_schema_etl_spark.streaming.batch_windows import (
        st_attribution_last_touch)

    ev = (load_table(spark, SF_SMOKE, "events")
          .select("user_id", "event_id", "event_type", "ts"))
    split = ev.orderBy("ts", "event_id").collect()[ev.count() // 2]
    first_half = ((F.col("ts") < split["ts"]) |
                  ((F.col("ts") == split["ts"]) &
                   (F.col("event_id") <= split["event_id"])))
    src = tmp_path / "src"
    src.mkdir()
    for i, (name, part) in enumerate(
            [("a.parquet", ev.filter(first_half)),
             ("b.parquet", ev.filter(~first_half))]):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / name)
        os.utime(src / name, (1_700_000_000 + i, 1_700_000_000 + i))

    raw = (spark.readStream
           .schema("user_id long, event_id long, event_type string,"
                   " ts timestamp")
           .format("parquet").option("maxFilesPerTrigger", "1")
           .load(str(src)))
    st.run_append_to_memory(
        stf.streaming_attribution_last_touch(spark, SF_SMOKE, source=raw),
        "t_attr")
    got = _rows(spark.sql("SELECT * FROM t_attr"))
    want = _rows(st_attribution_last_touch(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_value_micros_matches_spark_decimal_cast_on_repr_halves(spark):
    """_value_micros must round the SHORTEST decimal repr (what Spark's
    double->DECIMAL(28,6) cast rounds), not the exact binary expansion
    (ADVICE r11): 0.1234565's binary value is just UNDER the half, but
    its shortest repr IS the half, so Spark HALF_UPs to 123457 micros."""
    from multiagent_form_schema_etl_spark.streaming.stateful import (
        _value_micros)

    cases = [0.1234565, 0.1234575, 2.5e-7, 1.0000005, 0.1, 3.14159265,
             123456.789012, 7.0000015]
    got = {v: _value_micros(v) for v in cases}
    rows = spark.createDataFrame([(v,) for v in cases], "v double") \
        .selectExpr("v", "CAST(CAST(v AS DECIMAL(28,6)) * 1000000 "
                         "AS BIGINT) AS micros").collect()
    want = {r.v: r.micros for r in rows}
    assert got == want
    assert got[0.1234565] == 123457  # the exact-binary path says 123456


def test_streaming_range_frame_state_survives_microbatches(spark, tmp_path):
    """applyInPandasWithState sliding-hour frames: stream the events table
    as TWO ts-ordered files with maxFilesPerTrigger=1 (every user's hour
    buffer must cross the micro-batch boundary); the per-event emissions
    must equal the oracle-backed RANGE-frame batch face row-for-row,
    sum_value_1h bit-for-bit (integer micro-unit accumulation == the
    batch DECIMAL(28,6) routing). The cross-batch tie contract holds
    vacuously here: the corpus has no duplicate (user_id, ts) -- asserted
    so a regenerated corpus that violates it fails loudly, not subtly."""
    import os
    import shutil

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.operators.windows import (
        w_range_frame_time_window)
    from multiagent_form_schema_etl_spark.streaming import stateful as stf

    ev = (load_table(spark, SF_SMOKE, "events")
          .select("user_id", "event_id", "ts", "value"))
    assert (ev.groupBy("user_id", "ts").count()
            .filter(F.col("count") > 1).count() == 0)
    split = ev.orderBy("ts", "event_id").collect()[ev.count() // 2]
    first_half = ((F.col("ts") < split["ts"]) |
                  ((F.col("ts") == split["ts"]) &
                   (F.col("event_id") <= split["event_id"])))
    src = tmp_path / "src"
    src.mkdir()
    for i, (name, part) in enumerate(
            [("a.parquet", ev.filter(first_half)),
             ("b.parquet", ev.filter(~first_half))]):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / name)
        os.utime(src / name, (1_700_000_000 + i, 1_700_000_000 + i))

    raw = (spark.readStream
           .schema("user_id long, event_id long, ts timestamp, value double")
           .format("parquet").option("maxFilesPerTrigger", "1")
           .load(str(src)))
    st.run_append_to_memory(
        stf.streaming_range_frame_hour(spark, SF_SMOKE, source=raw),
        "t_rframe")
    got = _rows(spark.sql("SELECT * FROM t_rframe"))
    want = _rows(w_range_frame_time_window(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_streaming_range_frame_handles_timestamp_peers(spark, tmp_path):
    """RANGE frames include PEERS (rows tied on the order key): a
    constructed one-batch corpus with three events at the identical
    microsecond must emit every tied row with the full peer-group
    aggregate, exactly as the batch face computes it."""
    import datetime

    from multiagent_form_schema_etl_spark.operators.windows import (
        w_range_frame_time_window)
    from multiagent_form_schema_etl_spark.streaming import stateful as stf

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(1, 1, t0, 10.0), (1, 2, t0, 20.0), (1, 3, t0, 30.0),
            (1, 4, t0 + datetime.timedelta(minutes=30), 5.0),
            (1, 5, t0 + datetime.timedelta(hours=2), 1.0),
            (2, 6, t0, 7.0)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double")
    ev.write.parquet(str(tmp_path / "events.parquet"))
    raw = (spark.readStream
           .schema("user_id long, event_id long, ts timestamp, value double")
           .format("parquet").load(str(tmp_path / "events.parquet")))
    st.run_append_to_memory(
        stf.streaming_range_frame_hour(spark, str(tmp_path), source=raw),
        "t_rframe_peers")
    got = _rows(spark.sql("SELECT * FROM t_rframe_peers"))
    want = _rows(w_range_frame_time_window(spark, str(tmp_path)))
    assert got == want
    by_event = {r[1]: r for r in got}
    # all three peers see the full 60.0 group; the +30min event adds on top
    assert by_event[1][2] == 3 and abs(by_event[1][3] - 60.0) < 1e-12
    assert by_event[3][2] == 3 and abs(by_event[3][3] - 60.0) < 1e-12
    assert by_event[4][2] == 4 and abs(by_event[4][3] - 65.0) < 1e-12
    assert by_event[5][2] == 1  # 2h later: buffer fully evicted


def test_streaming_range_frame_null_values_match_batch_count_semantics(
        spark, tmp_path):
    """ADVICE r12: the batch face's COUNT(value)/SUM(value) skip NULLs; the
    live kernel must treat a null-value event as a frame PEER (it emits a
    row) but not a MEMBER (contributes nothing to n/sum), and an all-null
    frame must emit n=0, sum=NULL -- pinned row-for-row vs the batch face
    on a constructed corpus with leading, interior, and tied nulls."""
    import datetime

    from multiagent_form_schema_etl_spark.operators.windows import (
        w_range_frame_time_window)
    from multiagent_form_schema_etl_spark.streaming import stateful as stf

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    mins = datetime.timedelta(minutes=1)
    rows = [(1, 1, t0, None),            # leading null: frame all-null
            (1, 2, t0 + 5 * mins, 10.0),
            (1, 3, t0 + 9 * mins, None),  # interior null
            (1, 4, t0 + 9 * mins, 4.0),   # tied with the null peer
            (1, 5, t0 + 65 * mins, 2.0),  # cut lands EXACTLY on event 2's
                                          # ts: inclusive boundary keeps it
            (2, 6, t0, None), (2, 7, t0, None)]  # all-null user
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double")
    ev.write.parquet(str(tmp_path / "events.parquet"))
    raw = (spark.readStream
           .schema("user_id long, event_id long, ts timestamp, value double")
           .format("parquet").load(str(tmp_path / "events.parquet")))
    st.run_append_to_memory(
        stf.streaming_range_frame_hour(spark, str(tmp_path), source=raw),
        "t_rframe_nulls")
    got = _rows(spark.sql("SELECT * FROM t_rframe_nulls"))
    want = _rows(w_range_frame_time_window(spark, str(tmp_path)))
    assert got == want and len(got) == len(rows)
    by_event = {r[1]: r for r in got}
    assert by_event[1][2] == 0 and by_event[1][3] is None  # all-null frame
    assert by_event[3][2] == 2 and abs(by_event[3][3] - 14.0) < 1e-12
    assert by_event[4][2] == 2 and abs(by_event[4][3] - 14.0) < 1e-12
    assert by_event[5][2] == 3 and abs(by_event[5][3] - 16.0) < 1e-12
    assert by_event[6][2] == 0 and by_event[6][3] is None


def test_streaming_range_frame_hot_user_state_guard_raises(
        spark, tmp_path, monkeypatch):
    """The enforced per-user state bound (the SN/RFM/AA standard): a user
    whose trailing-hour buffer exceeds _RF_STATE_MAX must fail LOUDLY from
    the kernel, not silently carry unbounded state through checkpoints."""
    import datetime

    from multiagent_form_schema_etl_spark.streaming import stateful as stf

    monkeypatch.setattr(stf, "_RF_STATE_MAX", 5)
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(1, i, t0 + datetime.timedelta(seconds=i), 1.0)
            for i in range(10)]  # 10 events inside one hour > bound 5
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double")
    ev.write.parquet(str(tmp_path / "events.parquet"))
    raw = (spark.readStream
           .schema("user_id long, event_id long, ts timestamp, value double")
           .format("parquet").load(str(tmp_path / "events.parquet")))
    import pytest as _pytest
    with _pytest.raises(Exception, match="range-frame state for user 1"):
        st.run_append_to_memory(
            stf.streaming_range_frame_hour(spark, str(tmp_path), source=raw),
            "t_rframe_guard")


def test_ewma_vec_bit_identical_to_row_loop():
    """VERDICT r12 nit #2 precondition: the vectorized _ewma_vec kernel
    (pandas ewm(adjust=False) + NaN-poison mask + prepend-seed) must be
    BIT-identical to the original row loop -- on the gate corpus's real
    values, on repr-half values (the _value_micros lesson), on extreme
    magnitudes, and with carried-state seeds (incl. NaN poisoning,
    which raw ewm would silently skip but the recursive-CTE oracle's
    NULL arithmetic propagates)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from multiagent_form_schema_etl_spark.streaming.stateful import (
        EWMA_ALPHA, _ewma_vec)

    def loop(vals, e=None):
        out = []
        for v in vals:
            v = float(v)
            e = v if e is None else (EWMA_ALPHA * v
                                     + (1.0 - EWMA_ALPHA) * e)
            out.append(e)
        return np.array(out, dtype="float64")

    def check(vals, e=None):
        got = _ewma_vec(pd.Series(vals, dtype="float64"), e).to_numpy()
        want = loop(vals, e)
        # array_equal(equal_nan=True): bit-identical incl. NaN positions
        assert np.array_equal(got, want, equal_nan=True), (vals[:5], e)

    # (a) the gate corpus's real per-user value sequences
    ev = pq.read_table(SF_SMOKE + "/events.parquet",
                       columns=["user_id", "ts", "event_id", "value"]
                       ).to_pandas().sort_values(["ts", "event_id"])
    for _uid, grp in list(ev.groupby("user_id"))[:25]:
        check(grp["value"].astype("float64").to_numpy())

    # (b) repr-half values, (c) extreme magnitudes, (d) random seeded
    halves = [0.1234565, 0.1234575, 2.5e-7, 1.0000005, 7.0000015] * 20
    check(np.array(halves))
    check(np.array([1e300, -1e300, 1e-300, 5.0, -0.0] * 40))
    rng = np.random.default_rng(13)
    for _ in range(50):
        vals = rng.uniform(-1e6, 1e6, int(rng.integers(1, 40)))
        check(vals)
        check(vals, e=float(rng.uniform(-1e6, 1e6)))

    # (e) NaN poisoning: input NaN poisons the tail; a NaN seed poisons
    # everything (matching the loop and the oracle, NOT raw ewm)
    check(np.array([1.0, np.nan, 2.0, 3.0]))
    check(np.array([np.nan, 2.0, 3.0]))
    check(np.array([1.0, 2.0]), e=float("nan"))

    # (f) ADVICE r13 (high): exact repeats. pandas' C kernel skips the
    # update when running mean == incoming value, emitting v where the
    # loop computes a*v + (1-a)*v (differs by an ulp for ~17% of
    # doubles, and propagates). Cover [v, v, ...], seeded e == v, a
    # repeat mid-stream after divergence-prone values, and repeats
    # adjacent to NaN poison -- sweeping many v so some hit the
    # divergent-ulp class.
    for v in rng.uniform(-1e6, 1e6, 200):
        check(np.array([v, v]))
        check(np.array([v, v, v, v, v]))
        check(np.array([v]), e=float(v))
        check(np.array([v, v, 3.7, v, v]), e=float(v))
    check(np.array([2.0, np.nan, 4.0, 4.0]))
    v = -459.4262679369458  # known divergent repeat (a*v+(1-a)*v != v)
    assert EWMA_ALPHA * v + (1 - EWMA_ALPHA) * v != v
    check(np.array([v, v, v]))
    check(np.array([v, 1.0, v]), e=float(v))


def test_streaming_ewma_state_survives_microbatches(spark, tmp_path):
    """applyInPandasWithState EWMA: two ts-ordered files with
    maxFilesPerTrigger=1 force every user's running EWMA across the
    micro-batch boundary; emissions must equal the oracle-backed batch
    twin row-for-row, ewma BIT-for-bit (identical sequential float
    recursion -- no decimal routing involved at all)."""
    import os
    import shutil

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.streaming import stateful as stf

    ev = (load_table(spark, SF_SMOKE, "events")
          .select("user_id", "event_id", "ts", "value"))
    split = ev.orderBy("ts", "event_id").collect()[ev.count() // 2]
    first_half = ((F.col("ts") < split["ts"]) |
                  ((F.col("ts") == split["ts"]) &
                   (F.col("event_id") <= split["event_id"])))
    src = tmp_path / "src"
    src.mkdir()
    for i, (name, part) in enumerate(
            [("a.parquet", ev.filter(first_half)),
             ("b.parquet", ev.filter(~first_half))]):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        [pf] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.copy(stage / pf, src / name)
        os.utime(src / name, (1_700_000_000 + i, 1_700_000_000 + i))

    raw = (spark.readStream
           .schema("user_id long, event_id long, ts timestamp, value double")
           .format("parquet").option("maxFilesPerTrigger", "1")
           .load(str(src)))
    st.run_append_to_memory(
        stf.streaming_ewma(spark, SF_SMOKE, source=raw), "t_ewma")
    got = _rows(spark.sql("SELECT * FROM t_ewma"))
    want = _rows(stf.st_ewma_smoothing(spark, SF_SMOKE))
    assert got == want and len(got) > 0
