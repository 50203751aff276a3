#!/usr/bin/env python
"""Containment-selector boundary drill (VERDICT r12 item 6).

The x1_dedup_containment auto-selector routes to the lossless
containment-prefix kernel iff the naive inverted-index join's exact
candidate volume V = sum over (lang, gram) of C(c, 2) exceeds
``_CONT_AUTO_FACTOR`` (2.0) times the shingle-row count S. The 2.0 was
calibrated from far-apart regimes (V/S = 0.017 gate / 0.055 linear
probes / ~3.2 boilerplate pytest corpus) with NO measurement near the
threshold. This drill manufactures corpora that LAND near it -- the
cached x10 replication corpus plus a 6-token boilerplate phrase appended
to exactly c docs OF ONE LANGUAGE (V is counted per (lang, gram), so a
cross-language injection splits the fan-out and undershoots: the first
drill run measured 0.42 targeting 1.5), where c is solved from the
target factor f: the phrase's 3 interior 4-gram shingles each occur in
c same-language docs, so V grows by ~3*C(c, 2) while S grows by ~6c.

Each kernel is timed FACE-COLD in its own subprocess JVM (the r12 probe
methodology; also avoids cross-kernel memory accumulation), and the two
kernels' outputs are verified row-identical per corpus.

Usage:
    python tools/containment_boundary.py [--factors 1.5,2.0,2.5]
    python tools/containment_boundary.py --kernel naive --dir D  # worker

Writes drill corpora under scale_probe_data/boundary_f{f}/ (gitignored
cache, same policy as the x10/x30 corpora); prints one table row per
factor for SCALE_PROBE.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.path.join(REPO, "scale_probe_data", "x10_linear")
PHRASE = ("bp_legal bp_notice bp_rights bp_reserved bp_worldwide "
          "bp_forever")  # 6 tokens => 3 interior shared 4-grams


def shingle_stats(duck, rel: str) -> tuple[int, int]:
    """(S, V) under the oracle's shingle semantics: distinct
    (doc, lang, 4-gram) rows; V = sum over (lang, gram) of C(c, 2)."""
    [row] = duck.execute(f"""
        WITH toks AS (
          SELECT doc_id, lang,
                 list_filter(string_split(text, ' '), x -> x <> '') AS l
          FROM {rel}),
        sh AS (
          SELECT DISTINCT doc_id, lang,
                 array_to_string(l[i:i+3], ' ') AS g
          FROM toks, unnest(range(1, len(l) - 2)) AS t(i)
          WHERE len(l) >= 4),
        cnt AS (SELECT lang, g, COUNT(*) AS c FROM sh GROUP BY lang, g)
        SELECT SUM(c) AS s, SUM(c * (c - 1) // 2) AS v FROM cnt
        """).fetchall()
    return int(row[0]), int(row[1])


def build_corpus(duck, factor: float, s_base: int, v_base: int,
                 out_dir: str) -> None:
    [(lang, n_lang)] = duck.execute(
        "SELECT lang, COUNT(*) FROM base GROUP BY lang "
        "ORDER BY COUNT(*) DESC, lang LIMIT 1").fetchall()
    c = int(math.isqrt(max(0, int(2 * (factor * s_base - v_base) / 3))))
    if c > n_lang:
        raise SystemExit(f"factor {factor} needs c={c} docs but the "
                         f"largest language '{lang}' has only {n_lang}")
    duck.execute(f"""
        COPY (
          SELECT doc_id,
                 CASE WHEN doc_id IN (
                        SELECT doc_id FROM base WHERE lang = '{lang}'
                        ORDER BY doc_id LIMIT {c})
                      THEN text || ' ' || '{PHRASE}' ELSE text END AS text,
                 lang, source, n_chars
          FROM base
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
        """)


def run_kernel(kernel: str, sf_dir: str) -> None:
    """Worker mode: time ONE kernel face-cold in this fresh JVM; print a
    JSON line {time_s, rows, digest} (digest = sha256 of the sorted
    output rows, for the cross-kernel identity check)."""
    from multiagent_form_schema_etl_spark.operators.dedup import (
        _containment_cand_naive, _containment_cand_prefix,
        _containment_shingles, _containment_verify, track_persist)
    from multiagent_form_schema_etl_spark.session import get_spark

    spark = get_spark("containment_boundary")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    sh, sizes = _containment_shingles(spark, sf_dir)
    sh = track_persist(sh)
    cand = (_containment_cand_naive(sh) if kernel == "naive"
            else _containment_cand_prefix(sh, sizes))
    res = _containment_verify(cand, sh, sizes).collect()
    dt = round(time.perf_counter() - t0, 1)
    digest = hashlib.sha256(
        repr(sorted(map(tuple, res))).encode()).hexdigest()[:16]
    print(json.dumps({"time_s": dt, "rows": len(res), "digest": digest}))


def time_kernels(sf_dir: str) -> dict:
    out = {}
    for kernel in ("naive", "prefix"):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--kernel", kernel, "--dir", sf_dir],
            stdout=subprocess.PIPE, text=True)
        rec = json.loads([ln for ln in p.stdout.splitlines()
                          if ln.startswith("{")][-1])
        out[kernel] = rec
    assert out["naive"]["digest"] == out["prefix"]["digest"], \
        f"kernels diverged: {out}"
    assert out["naive"]["rows"] == out["prefix"]["rows"]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1.5,2.0,2.5")
    ap.add_argument("--kernel", choices=("naive", "prefix"))
    ap.add_argument("--dir")
    args = ap.parse_args()
    if args.kernel:
        run_kernel(args.kernel, args.dir)
        return

    import duckdb

    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW base AS SELECT * FROM "
                 f"read_parquet('{BASE}/documents.parquet/*.parquet')")
    s_base, v_base = shingle_stats(duck, "base")
    print(f"base x10 corpus: S={s_base} V={v_base} V/S={v_base/s_base:.3f}")

    for f in [float(x) for x in args.factors.split(",")]:
        out_dir = os.path.join(REPO, "scale_probe_data", f"boundary_f{f}")
        if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
            os.makedirs(out_dir, exist_ok=True)
            build_corpus(duck, f, s_base, v_base, out_dir)
        s, v = shingle_stats(
            duck, f"read_parquet('{out_dir}/documents.parquet')")
        t = time_kernels(out_dir)
        choice = "prefix" if v > 2.0 * s else "naive"
        print(f"factor~{f}: measured V/S={v/s:.2f} (S={s} V={v}) | "
              f"naive {t['naive']['time_s']}s "
              f"prefix {t['prefix']['time_s']}s | selector-> {choice} | "
              f"rows {t['naive']['rows']} (identical)")


if __name__ == "__main__":
    main()
