#!/usr/bin/env python
"""Dump `.explain("formatted")` for a set of queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name suffix, r14 optimization evidence)
  query:  registry names; default = the bench headliner set.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1 -- the bench SF, so the
gated broadcast hints and AQE thresholds see bench-scale row counts).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r14")


def main() -> None:
    suffix = sys.argv[1]
    import bench
    import __spark_entry__ as e
    from multiagent_form_schema_etl_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    names = sys.argv[2:] or ([n for n in bench.HEADLINE if n in qs]
                             + [n for n in bench.OPTIONAL if n in qs])
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"dump_plans: {name}")
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
