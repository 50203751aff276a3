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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from multiagent_form_schema_etl_spark.plans import registry
from multiagent_form_schema_etl_spark.session import tune_for_session

registry.load_all_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5-style star join, SURVEY.md §7 step 1) on
    /root/testdata/sf0.001; driver checks rows>0."""
    tune_for_session(spark)
    return registry.QUERIES["q05_local_supplier_volume"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every oracle-checkable query."""
    return dict(registry.ORACLES)
