"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``multiagent_form_schema_etl_spark`` package;
this module only adapts its query registry to the driver's calling
convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The engine package lives next to this file; make the import robust to the
# driver loading this module from a different working directory.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from multiagent_form_schema_etl_spark.plans import registry  # noqa: E402
from multiagent_form_schema_etl_spark.session import tune_for_session

registry.load_all_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5-style star join, SURVEY.md §7 step 1) on
    /root/testdata/sf0.001; driver checks rows>0."""
    tune_for_session(spark)
    return registry.QUERIES["q05_local_supplier_volume"](spark, "/root/testdata/sf0.001")


def _tuned(fn: Callable[[SparkSession, str], DataFrame]
           ) -> Callable[[SparkSession, str], DataFrame]:
    """Pin session conf (UTC, AQE, Arrow) before building the plan, so a
    query's oracle parity never depends on the driver having called
    ``entry`` (which also tunes) first. Runtime-conf sets are idempotent
    and cheap."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune_for_session(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    driver's checked window covers every query family (oracle-backed first,
    rows-only last)."""
    return {n: _tuned(registry.QUERIES[n]) for n in registry.ordered_query_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every oracle-checkable query."""
    order = registry.ordered_query_names()
    return {n: registry.ORACLES[n] for n in order if n in registry.ORACLES}
