"""Single-pass pipeline observability (data-quality gates at scale).

The reference tracks per-stage errors/warnings in its pipeline state dict
(orchestration/orchestrator.py:17-37) and counts validation failures by
re-walking rows. At 100 TB a second pass over a stage just to count nulls
or errors doubles its cost, so the engine attaches Spark ``observe``
metrics to the existing action instead: the metrics are accumulated
JVM-side while the stage computes, and cost nothing beyond the aggregation
of one row per task.

- Batch: ``pyspark.sql.Observation`` -- ``attach_quality_metrics`` wires
  row/null/distinct-ish counters onto a DataFrame; after ANY action on it
  the numbers are on ``Observation.get``.
- Streaming: the same ``df.observe(name, ...)`` call surfaces per-microbatch
  numbers in ``StreamingQueryProgress.observedMetrics`` -- the hook a
  production deployment feeds to its metrics backend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

_DEC = "decimal(28,6)"


def quality_metric_columns(check_nulls: list[str],
                           value_col: str | None = None) -> list:
    """The standard quality bundle: total rows, per-column null counts, and
    an optional decimal-routed value sum (exact, so batch and streaming
    totals are comparable bit-for-bit)."""
    # SUM over zero rows is NULL -- coalesce so an empty input reports
    # zeros, not JSON nulls a downstream gate would trip over
    cols = [F.count(F.lit(1)).alias("n_rows")]
    cols += [F.coalesce(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)),
                        F.lit(0)).alias(f"nulls_{c}")
             for c in check_nulls]
    if value_col is not None:
        cols.append(F.coalesce(F.sum(F.col(value_col).cast(_DEC))
                               .cast("double"), F.lit(0.0))
                    .alias(f"sum_{value_col}"))
    return cols


def attach_quality_metrics(df: DataFrame, check_nulls: list[str],
                           value_col: str | None = None
                           ) -> tuple[DataFrame, Observation]:
    """Batch: returns (instrumented df, observation). Run any single action
    on the returned df, then read ``observation.get`` -- no second scan."""
    obs = Observation()
    return df.observe(obs, *quality_metric_columns(check_nulls, value_col)), obs


def attach_streaming_metrics(df: DataFrame, name: str,
                             check_nulls: list[str],
                             value_col: str | None = None) -> DataFrame:
    """Streaming: named observe node; per-microbatch values appear in
    ``query.lastProgress['observedMetrics'][name]``."""
    return df.observe(name, *quality_metric_columns(check_nulls, value_col))
