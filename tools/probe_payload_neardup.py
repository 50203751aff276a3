#!/usr/bin/env python
"""x3_payload_neardup candidate-volume probe (VERDICT r14 item 8): decide
WITH NUMBERS whether the byte-shingle verification stage is candidate-
dominated (worth an Arrow-kernel rewrite) or bucket/scan-dominated (leave
alone). Measures, at sf0.1 and on the 10x density corpus (exact twins --
the adversarial candidate-volume shape):

- n_cand: candidate pairs out of the band-bucket join
- n_cand_docs / n_docs: how much of the corpus the verify semi-join keeps
- verify_s vs full_s: noop time of the full face vs a candidates-only
  re-run (the difference is the shingle-join verify cost)

Usage: python tools/probe_payload_neardup.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    import __spark_entry__ as e
    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.session import get_spark
    from tools import scale_probe

    spark = get_spark("probe_pnd")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    corpora = [("sf0.1", os.environ.get("SPARK_GRAFT_SF_DIR",
                                        "/root/testdata/sf0.1"))]
    corpora.append(("x10_density", scale_probe.build_dir(spark, 10, True)))

    for name, d in corpora:
        docs = load_table(spark, d, "documents")
        n_docs = docs.count()
        t0 = time.perf_counter()
        full = qs["x3_payload_neardup"](spark, d)
        full.write.format("noop").mode("overwrite").save()
        full_s = round(time.perf_counter() - t0, 3)
        n_pairs = full.count()  # memoized + checkpointed candidates reused
        # candidate stats from the face's own internals: re-derive the
        # band-bucket candidate set the way the face does (same code path,
        # separate timing) -- this is a PROBE, not part of any query
        from multiagent_form_schema_etl_spark.operators import multimodal as M
        t0 = time.perf_counter()
        sh_rel, cand = M._pnd_candidates(spark, d)
        rec = {"corpus": name, "n_docs": n_docs, "full_noop_s": full_s,
               "n_result_pairs": n_pairs}
        rec["n_cand"] = cand.count()
        rec["cand_s"] = round(time.perf_counter() - t0, 3)
        cd = (cand.select(F.col("doc_a").alias("doc_id"))
              .union(cand.select(F.col("doc_b").alias("doc_id")))
              .distinct())
        rec["n_cand_docs"] = cd.count()
        t0 = time.perf_counter()
        M._pnd_verify(sh_rel, cand).write.format("noop") \
            .mode("overwrite").save()
        rec["verify_s"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
