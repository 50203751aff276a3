#!/usr/bin/env python
"""Dump `.explain("formatted")` for a set of queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
  tag:    round directory under plans/ (e.g. 'r15' -- ADVICE r14: the tag
          was hardcoded 'r14', so a later round would silently mix its
          evidence into the r14 directory)
  suffix: 'before' or 'after' (file name suffix, optimization evidence)
  query:  registry names; default = the bench headliner set.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1 -- the bench SF, so the
gated broadcast hints and AQE thresholds see bench-scale row counts).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    out_dir = os.path.join(ROOT, "plans", tag)
    import bench
    import __spark_entry__ as e
    from multiagent_form_schema_etl_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    names = sys.argv[3:] or ([n for n in bench.HEADLINE if n in qs]
                             + [n for n in bench.OPTIONAL if n in qs])
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"dump_plans: {name}")
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
