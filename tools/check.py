#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count,
column names, and (order-insensitively) values.

Usage: python tools/check.py [query_name ...]   (default: all)
Env: SPARK_GRAFT_SF_DIR overrides the sf0.01 default (e.g. a full sf0.1
robustness pass -- catches LIMIT ties and scale-dependent divergence).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import os
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def canon(v):
    """Canonicalize a cell for order-insensitive comparison."""
    import datetime
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision: we demand bit-identical doubles
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict)):
        # The driver hashes result cells through pandas factorize, which
        # raises on unhashable list/map cells -- so must we.
        raise TypeError(f"complex-typed result cell not allowed: {v!r}")
    return str(v)


def _spark_kind(dt) -> str:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if s in ("float", "double") or s.startswith("decimal"):
        return "f"
    if s == "boolean":
        return "b"
    return "O"


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in idx) for r in rows)


def main() -> int:
    # Leak/copy guard gates every check run (VERDICT r5 item 7): a
    # non-allowlisted import or reference-distinctive token in code
    # fails the sweep before any query runs.
    from tools import guard
    if guard.main() != 0:
        return 1

    import __spark_entry__ as e
    from multiagent_form_schema_etl_spark.session import get_spark

    names = sys.argv[1:] or sorted(e.queries())
    qs, oracles = e.queries(), e.oracle_sql()

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        complex_cols = [f.name for f in sdf.schema.fields
                        if f.dataType.typeName() in ("array", "map", "struct")]
        if complex_cols and name in oracles:
            # mirror the driver: its pandas-based hasher crashes on these
            print(f"FAIL {name}: complex-typed result columns {complex_cols} "
                  f"(driver hasher rejects list/map/struct cells)")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"     WARNING {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        else:
            # dtype-kind parity: a strict driver hashing pandas frames would
            # see int-vs-float drift (e.g. DuckDB HUGEINT sums -> float64)
            try:
                ddf = con.execute(oracles[name]).df()
                spdf = sdf.toPandas()
                for c in ddf.columns:
                    dk = ddf[c].dtype.kind
                    sk = spdf[c].dtype.kind if c in spdf.columns else None
                    # pandas coerces nullable ints to float on both sides,
                    # so comparing frame-to-frame is the honest check
                    if sk and dk in "if" and sk in "if" and dk != sk:
                        problems.append(f"dtype kind mismatch col={c} "
                                        f"spark={sk} duck={dk}")
            except Exception:
                pass
        if not problems:
            s, d = rowset(scols, srows), rowset(dcols, drows)
            if s != d:
                diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(names)-len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
