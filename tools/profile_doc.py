#!/usr/bin/env python
"""Split a query's cost into (DataFrame build = py4j + eager analysis,
physical planning, first noop execution, steady-state noop execution) --
the doc-family faces spend a per-action constant in Catalyst that VERDICT
r14 item 3 asks to attack; this measures exactly where it sits before and
after any flattening.

Usage: python tools/profile_doc.py [query ...] [--n 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=", 1)[1]) if "=" in a else n
    names = args or ["doc_u7_extraction_cascade", "doc_pipeline_scaled",
                     "doc_pipeline_scoped_scaled"]

    import __spark_entry__ as e
    from multiagent_form_schema_etl_spark.session import get_spark

    spark = get_spark("profile_doc")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    # warm shared fixtures the way bench.py does
    if "doc_a3_full_text" in qs:
        qs["doc_a3_full_text"](spark, SF_DIR).collect()

    for name in names:
        rec = {"query": name}
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        rec["build_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        rec["plan_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        rec["first_exec_s"] = round(time.perf_counter() - t0, 3)
        warm = []
        for _ in range(n):
            # rebuild per pass: the registry memo returns the same DF, so
            # re-request it to include the per-action re-plan the bench's
            # warm pass pays (new write = new query execution each time)
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            warm.append(round(time.perf_counter() - t0, 3))
        rec["warm_execs_s"] = warm
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
