#!/usr/bin/env python
"""Scale-up probe (VERDICT r2 item 4): replicate documents/events 10-30x
on disk and measure the headline dedup / clustering / sharding / event
queries plus the scoped document pipeline at 100k docs, so the 100 TB
posture is MEASURED (does runtime scale ~linearly with input?) instead of
argued.

Two replication modes:
- linear (default): each copy gets a DISJOINT key space AND a disjoint
  token vocabulary (every token prefixed with its copy id), so the
  near-dup pair structure scales linearly with the corpus -- the honest
  "10x more data" shape.
- density (exact replication, shifted keys only): every doc gains 9+
  identical twins, so the pair graph grows ~quadratically in the
  replication factor -- the adversarial corpus that exposes quadratic
  fan-out cliffs (the judge's candidate: block-pair enumeration).

Usage: python tools/scale_probe.py [--mults 10,30] [--density]
Writes parquet under scale_probe_data/ (repo-local, gitignored) and
prints one JSON line per (mode, mult) with per-query seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "scale_probe_data")

DOC_QUERIES = [
    "x1_dedup_exact",
    "x1_dedup_jaccard_ngram",
    "x1_dedup_jaccard_blockpairs",
    "x1_dedup_minhash_lsh",
    "x1_dedup_components",
    "x5_shard_by_budget",
    "x4_token_stats",
]
EVENT_QUERIES = [
    "st_session_window",
    "st_max_concurrency",
]


def build_dir(spark, mult: int, density: bool) -> str:
    name = f"x{mult}_{'density' if density else 'linear'}"
    d = os.path.join(OUT, name)
    ok = os.path.join(d, "_OK")
    if os.path.exists(ok):
        return d
    os.makedirs(d, exist_ok=True)

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    did = docs.agg(F.max("doc_id")).first()[0] + 1
    copies = spark.range(mult).select(F.col("id").alias("copy"))
    r = (docs.crossJoin(copies)
         .withColumn("doc_id", F.col("doc_id") + F.col("copy") * did))
    if not density:
        # disjoint per-copy vocabulary: near-dup structure scales linearly
        r = r.withColumn("text", F.concat_ws(" ", F.transform(
            F.filter(F.split("text", " "), lambda w: w != ""),
            lambda t: F.concat(F.lit("c"), F.col("copy"), F.lit("_"), t))))
    (r.drop("copy").repartition(32)
     .write.mode("overwrite")
     .parquet(os.path.join(d, "documents.parquet")))

    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    eid = ev.agg(F.max("event_id")).first()[0] + 1
    uid = ev.agg(F.max("user_id")).first()[0] + 1
    (ev.crossJoin(copies)
     .withColumn("event_id", F.col("event_id") + F.col("copy") * eid)
     .withColumn("user_id", F.col("user_id") + F.col("copy") * uid)
     .drop("copy").repartition(32)
     .write.mode("overwrite").parquet(os.path.join(d, "events.parquet")))

    for f in os.listdir(BASE):
        if f.endswith(".parquet") and f not in ("documents.parquet",
                                                "events.parquet"):
            dst = os.path.join(d, f)
            if not os.path.exists(dst):
                shutil.copy(os.path.join(BASE, f), dst)
    open(ok, "w").close()
    return d


def build_ann_dir(spark, mult: int, density: bool) -> str:
    """Replicate embeddings mult-x. linear: each copy's vectors are
    deterministically PERTURBED (hash-derived per-element noise, ~5% of
    the unit scale) so copies land elsewhere on the sphere and the
    near-dup structure scales linearly; density: exact copies (shifted
    ids), the adversarial every-vector-gains-twins corpus."""
    name = f"ann_x{mult}_{'density' if density else 'linear'}"
    d = os.path.join(OUT, name)
    ok = os.path.join(d, "_OK")
    if os.path.exists(ok):
        return d
    os.makedirs(d, exist_ok=True)

    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    vid = emb.agg(F.max("vec_id")).first()[0] + 1
    copies = spark.range(mult).select(F.col("id").alias("copy"))
    r = emb.crossJoin(copies)
    if not density:
        noise = lambda i: ((F.xxhash64(F.col("copy"), F.col("vec_id"), i)
                            % 1000).cast("double") / 1000.0 - 0.5) * 0.1
        r = r.withColumn(
            "embedding",
            F.zip_with("embedding",
                       F.sequence(F.lit(0), F.size("embedding") - 1),
                       lambda x, i: F.when(F.col("copy") == 0, x)
                       .otherwise((x + noise(i)).cast("float"))))
    r = (r.withColumn("vec_id", F.col("vec_id") + F.col("copy") * vid)
         .drop("copy"))
    (r.repartition(32).write.mode("overwrite")
     .parquet(os.path.join(d, "embeddings.parquet")))
    for f in os.listdir(BASE):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            dst = os.path.join(d, f)
            if not os.path.exists(dst):
                shutil.copy(os.path.join(BASE, f), dst)
    open(ok, "w").close()
    return d


def run_ann_probe(spark, qs, sf_dir: str) -> dict:
    """ANN paths at scale (VERDICT r3 item 5): runtime, recall vs the
    exact GEMM ground truth, and measured CANDIDATE volume per path."""
    from multiagent_form_schema_etl_spark.operators import similarity as S

    out: dict = {}
    t0 = time.perf_counter()
    exact = {(r["query_id"], r["match_id"])
             for r in qs["x2_cosine_topk_gemm"](spark, sf_dir).collect()}
    out["gemm_exact_s"] = round(time.perf_counter() - t0, 2)

    for name in ("x2_ann_lsh_buckets", "x2_ann_ivf_kmeans", "x2_ann_pq_adc"):
        t0 = time.perf_counter()
        got = {(r["query_id"], r["match_id"])
               for r in qs[name](spark, sf_dir).collect()}
        out[f"{name}_s"] = round(time.perf_counter() - t0, 2)
        out[f"{name}_recall"] = round(
            len(got & exact) / max(len(exact), 1), 3)

    # candidate volumes (the quantity that must scale sub-quadratically)
    t0 = time.perf_counter()
    out["lsh_cand"] = S._lsh_candidate_pairs(spark, sf_dir).count()
    out["lsh_cand_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out["ivf_topk_cand"] = S._ivf_topk_candidates(spark, sf_dir).count()
    out["ivf_topk_cand_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    _, cells = S._ivf_dedup_cells(spark, sf_dir)
    a = cells.select(F.col("vec_id").alias("a"), "cell")
    b = cells.select(F.col("vec_id").alias("b"), "cell")
    out["ivf_dedup_cand"] = (a.join(b, ["cell"])
                             .filter(F.col("a") < F.col("b"))
                             .select("a", "b").distinct().count())
    out["ivf_dedup_cand_s"] = round(time.perf_counter() - t0, 2)

    # the dedup operator end-to-end (exact-verified pairs)
    t0 = time.perf_counter()
    out["ivf_dedup_pairs"] = qs["x1_dedup_embedding_ivf"](
        spark, sf_dir).count()
    out["ivf_dedup_s"] = round(time.perf_counter() - t0, 2)
    for k, v in out.items():
        print(f"  {k}: {v}", file=sys.stderr)
    return out


def run_probe(spark, qs, sf_dir: str, names: list[str]) -> dict[str, float]:
    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        [r] = (df.select(F.count(F.lit(1)).alias("n"),
                         F.max(F.xxhash64(*[F.col(c) for c in df.columns])))
               .collect())
        times[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {times[name]}s ({r['n']} rows)", file=sys.stderr)
    return times


def scoped_pipeline_copies(spark, n_copies: int) -> float:
    """The scoped document pipeline at n_copies x 4 fixture docs (the
    registry variant is pinned at 2500 copies = 10k docs; the probe runs
    10x that)."""
    from multiagent_form_schema_etl_spark.operators import document as D

    copies = spark.range(n_copies).select(F.col("id").alias("copy"))
    shift = F.col("copy") * 4
    blocks = (D.blocks_df(spark).crossJoin(copies)
              .withColumn("doc_id", F.col("doc_id") + shift).drop("copy"))
    doc_forms = (D.doc_forms_df(spark).crossJoin(copies)
                 .withColumn("doc_id", F.col("doc_id") + shift).drop("copy"))
    t0 = time.perf_counter()
    vals = D.scoped_cascade_values_rules(
        D.section_context(spark, blocks, doc_forms))
    per_doc = (vals.groupBy("form_name", "doc_id")
               .agg(F.count("value").alias("n_values")))
    out = per_doc.groupBy("form_name").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_values").alias("n_values"))
    # hash-reduce over every column so Catalyst cannot prune the cascade
    # (a bare count() would drop the value column and with it all regex
    # work)
    [r] = (out.select(F.count(F.lit(1)).alias("n"),
                      F.max(F.xxhash64(*[F.col(c) for c in out.columns])))
           .collect())
    assert r["n"] == 3
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="10,30")
    ap.add_argument("--density", action="store_true")
    ap.add_argument("--skip", default="",
                    help="comma-separated query names to skip")
    ap.add_argument("--ann", action="store_true",
                    help="probe the ANN/similarity paths over replicated "
                         "embeddings instead of the document/event queries")
    ap.add_argument("--pipe-copies", type=int, default=0,
                    help="run ONLY the scoped document pipeline at N "
                         "fixture copies (4 docs each; 250000 -> 1M docs) "
                         "-- the VERDICT r5 item 6 probe")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",") if m]
    skip = set(args.skip.split(","))

    import __spark_entry__ as e
    from multiagent_form_schema_etl_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    if args.pipe_copies:
        t = scoped_pipeline_copies(spark, args.pipe_copies)
        print(json.dumps({"mode": "scoped_pipeline",
                          "n_docs": args.pipe_copies * 4, "seconds": t}))
        return

    if args.ann:
        for mult in mults:
            d = (BASE if mult == 1
                 else build_ann_dir(spark, mult, args.density))
            mode = "density" if args.density else "linear"
            print(f"ann probe {mode} x{mult} -> {d}", file=sys.stderr)
            res = run_ann_probe(spark, qs, d)
            print(json.dumps({"mode": f"ann_{mode}", "mult": mult,
                              "metrics": res}))
        return

    for mult in mults:
        d = build_dir(spark, mult, args.density)
        mode = "density" if args.density else "linear"
        print(f"probe {mode} x{mult} -> {d}", file=sys.stderr)
        names = [n for n in DOC_QUERIES + EVENT_QUERIES if n not in skip]
        times = run_probe(spark, qs, d, names)
        if "scoped_pipeline" not in skip:
            times["doc_pipeline_scoped_100k" if mult >= 10 else
                  "doc_pipeline_scoped"] = scoped_pipeline_copies(
                spark, 2500 * min(mult, 10))
        print(json.dumps({"mode": mode, "mult": mult, "queries": times,
                          "total": round(sum(times.values()), 2)}))


if __name__ == "__main__":
    main()
