"""Deterministic literal fixtures shared by Spark queries and DuckDB oracles.

The driver's oracle only pre-registers the 10 analytics tables, so
document-pipeline queries (FIXTURES.md group A) build their input twice from
the same Python literals: ``spark.createDataFrame(ROWS, SCHEMA)`` on the Spark
side and an inline ``VALUES`` CTE (rendered by :func:`values_sql`) on the
DuckDB side. Both renderings come from the single source of truth below, so
they cannot drift.
"""

from __future__ import annotations

import datetime as _dt


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_sql_lit(x) for x in v) + "]"
    raise TypeError(f"no SQL literal rendering for {type(v)}")


def values_sql(rows: list[tuple], cols: list[str]) -> str:
    """Render rows as a DuckDB inline relation: ``(VALUES ...) AS t(c1, c2)``."""
    body = ",\n        ".join("(" + ", ".join(_sql_lit(v) for v in row) + ")"
                              for row in rows)
    return f"(VALUES\n        {body}) AS t({', '.join(cols)})"


# ---------------------------------------------------------------------------
# Scalar-function fixture: raw strings exercising the reference's parsers
# (dates in 4 formats, numbers, booleans, null-words, emails, currency --
# SURVEY.md §2.8 F5/F6, §1.2).
# ---------------------------------------------------------------------------
SCALAR_COLS = ["id", "raw"]
SCALAR_ROWS: list[tuple] = [
    (1, "2021-03-05"),
    (2, "3/15/2021"),
    (3, "March 15, 2021"),
    (4, "15 March 2021"),
    (5, "not a date"),
    (6, "2021-13-45"),
    (7, "  2022-01-02  "),
    (8, "Payment of 1500.75 dollars due"),
    (9, "within 30 days"),
    (10, "USD 1,000.50"),
    (11, "no digits here"),
    (12, "true"),
    (13, "Agreed"),
    (14, "no"),
    (15, "maybe"),
    (16, "None"),
    (17, "N/A"),
    (18, "  null "),
    (19, "unknown"),
    (20, ""),
    (21, "actual value"),
    (22, "alice.smith+legal@example-corp.com"),
    (23, "not-an-email@"),
    (24, "USD 5,000.00"),
    (25, "usd 5000"),
    (26, "EUR 250"),
    (27, "yes"),
    (28, "0"),
    (29, "42"),
    (30, "3.14 and 2.72"),
]
