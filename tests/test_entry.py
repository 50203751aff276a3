"""Driver-contract smoke tests (t1) + registry invariants."""

from __future__ import annotations

import __spark_entry__ as e
from tests.conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns


def test_every_oracle_has_query():
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0


def test_all_queries_run_on_smoke_sf(spark):
    for name, fn in e.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        df.limit(1).collect()
