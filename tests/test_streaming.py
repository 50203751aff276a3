"""Structured Streaming parity tests: the streaming plans must produce the
same results as their batch twins when drained with availableNow."""

from __future__ import annotations

import tempfile

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
