"""Central query registry: every operator from SURVEY.md §2 registers a named
query (spark, sf_dir) -> DataFrame plus (usually) an ANSI-SQL oracle string the
driver runs through DuckDB for hash-equality checking.

Oracle-less registrations (LSH approx joins, streaming, stochastic ops) get
the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query builder under ``name`` with an optional
    DuckDB oracle SQL string."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def query_names() -> list[str]:
    return sorted(QUERIES)


def load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from ..operators import (  # noqa: F401
        relational,
        functions_queries,
        joins,
        aggregates,
        windows,
        document,
        dedup,
        similarity,
        textstats,
        multimodal,
    )
    from ..streaming import batch_windows  # noqa: F401
