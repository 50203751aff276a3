"""Custom stateful streaming operator (SURVEY.md §2.9 / §2.10): per-user
value-threshold batching.

Semantics: process each user's events in (ts, event_id) order, accumulating
``value``; the moment the running total reaches >= 100.0 the current batch
CLOSES (the crossing event belongs to it) and the next event starts a fresh
batch. This is the canonical "cumulative reset" shape -- NOT expressible
with session_window / any built-in window function (the reset point depends
on the running value itself, so a single window pass can't place it;
SQL needs recursion). It models the reference orchestrator's stateful
linear DAG (orchestration/orchestrator.py:189-215 advances phase state per
document) generalized to a keyed stream, and is exactly the micro-batching
a training-data pipeline does when packing variable-cost items into
fixed-budget requests.

Three faces, one kernel:

- ``threshold_batches_pdf`` -- the per-user pandas kernel (pure, tested).
- ``st_stateful_threshold_batches`` -- batch twin: ``groupBy(user_id)
  .applyInPandas(kernel)``. One shuffle on user_id; each group is a linear
  scan with O(1) live state. Oracle = DuckDB recursive CTE walking the same
  (ts, event_id) order -- both sides do the *sequential* IEEE-double
  accumulation in the same order, so acc values (and the >= 100.0 branch
  decisions) are bit-identical with no decimal detour.
- ``streaming_threshold_batches`` -- the live plan:
  ``applyInPandasWithState`` with (acc, n_events, batch_id) state per user,
  emitting a row per CLOSED batch (append semantics); open batches stay in
  state. tests/test_streaming.py drains it with availableNow over a
  two-file source (maxFilesPerTrigger=1) so state provably carries across
  micro-batches and still matches the batch twin's closed set.

Scale: state per user is three scalars -- a billion users is ~GBs of state
spread over the cluster, and Spark's state store checkpoints it
incrementally. The batch twin's only data movement is the single hash
shuffle on user_id; within a group the kernel streams rows through Arrow in
one pass. Skew caveat: one pathological user = one task, the standard
sessionization trade-off (mitigate upstream with a per-user time-slice
pre-split if a key can exceed a partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register

THRESHOLD = 100.0

_OUT_SCHEMA = ("user_id long, batch_id long, n_events long, "
               "batch_value double, closed boolean")


def threshold_batches_pdf(pdf, *, closed_only: bool = False):
    """Pure pandas kernel: events for ONE user -> one row per batch.

    Sorts by (ts, event_id), accumulates value left-to-right, closes a
    batch when the running total reaches THRESHOLD. Returns columns
    matching _OUT_SCHEMA. Sequential float adds -- order is the contract.
    """
    import pandas as pd

    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    uid = int(pdf["user_id"].iloc[0])
    rows = []
    acc, n, bid = 0.0, 0, 1
    for v in pdf["value"].astype("float64"):
        acc += float(v)
        n += 1
        if acc >= THRESHOLD:
            rows.append((uid, bid, n, acc, True))
            acc, n, bid = 0.0, 0, bid + 1
    if n and not closed_only:
        rows.append((uid, bid, n, acc, False))
    return pd.DataFrame(
        rows, columns=["user_id", "batch_id", "n_events",
                       "batch_value", "closed"])


@register(
    "st_stateful_threshold_batches",
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    rec AS (
      SELECT user_id, rn, value AS acc, CAST(1 AS BIGINT) AS batch_id
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.rn,
             CASE WHEN r.acc >= 100.0 THEN e.value
                  ELSE r.acc + e.value END AS acc,
             CASE WHEN r.acc >= 100.0 THEN r.batch_id + 1
                  ELSE r.batch_id END AS batch_id
      FROM rec r
      JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1
    )
    SELECT user_id, batch_id,
           COUNT(*) AS n_events,
           MAX(acc) AS batch_value,
           MAX(acc) >= 100.0 AS closed
    FROM rec
    GROUP BY user_id, batch_id
    """,
)
def st_stateful_threshold_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful threshold-batching operator.

    The oracle's recursive CTE steps one event at a time per user --
    identical order, identical double arithmetic. batch_value = MAX(acc)
    works because values are strictly positive (events.value >= 0.01), so
    acc is increasing within a batch and MAX picks the closing total.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value")
    return ev.groupBy("user_id").applyInPandas(
        threshold_batches_pdf, schema=_OUT_SCHEMA)


def streaming_threshold_batches(spark: SparkSession, sf_dir: str,
                                source: DataFrame | None = None) -> DataFrame:
    """Live applyInPandasWithState plan: emits each batch the moment it
    closes; the open tail of every user's stream rides in state.

    State = (acc, n_events, batch_id); within a micro-batch rows are
    processed in (ts, event_id) order, so with an in-order source the
    closed-batch output is identical to the batch twin's closed rows.
    ``source`` lets tests inject a multi-file stream (maxFilesPerTrigger=1)
    to prove state survives micro-batch boundaries.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .structured import stream_events

    def step(key, pdfs, state: GroupState):
        uid = int(key[0])
        acc, n, bid = state.get if state.exists else (0.0, 0, 1)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            for v in pdf["value"].astype("float64"):
                acc += float(v)
                n += 1
                if acc >= THRESHOLD:
                    out.append((uid, bid, n, acc, True))
                    acc, n, bid = 0.0, 0, bid + 1
        state.update((acc, n, bid))
        yield pd.DataFrame(
            out, columns=["user_id", "batch_id", "n_events",
                          "batch_value", "closed"])

    ev = (source if source is not None
          else stream_events(spark, sf_dir)).select(
        "user_id", "event_id", "ts", "value")
    return ev.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=_OUT_SCHEMA,
        stateStructType="acc double, n_events long, batch_id long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout)
