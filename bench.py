#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully executed (collect) but results are small aggregates, so
timing measures scan+shuffle+agg, not driver materialization.

Noise-proofing (VERDICT r7 item 3: this box swings +/-40% on identical
code, and a single-run BENCH record cost r7 a 30% phantom regression):
the default invocation runs N=$SPARK_GRAFT_BENCH_RUNS (default 3)
INDEPENDENT passes, each in a fresh subprocess JVM so every pass's cold
numbers include their own Catalyst analysis + codegen compile, and
reports the per-query and per-total MEDIANS. `bench.py --single` runs
one pass (the pre-r8 behavior).

Output contract (VERDICT r8 item 1: the r8 one-line record carried the
full per-run data, overflowed the driver's ~2 KB stdout-tail capture,
and BENCH_r08.parsed came back null): the FINAL stdout line is a COMPACT
medians-only JSON record (hard-capped under ~1.9 KB); the full per-run
records land in the committed side artifact BENCH_LOCAL.json, which is
where the error bars live.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _loadavg() -> list[float]:
    """Host 1/5/15-min load averages. Self-diagnosis (VERDICT r12 item 1):
    BENCH_r12's cold runs climbed 55.9 -> 70.3 -> 92.1 s on identical code
    because ambient load ramped to ~7 mid-bench; stamping every pass with
    before/after loadavg lets a contaminated sample identify itself inside
    the committed record instead of needing out-of-band disclosure."""
    try:
        with open("/proc/loadavg") as f:
            return [round(float(x), 2) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return []


def _cpu_counters() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat. On a VM (this box
    is one), CPU STEAL is the definitive contamination signal loadavg
    can't see: jiffies the hypervisor withheld from this guest for other
    tenants. A pass's steal_pct = 100 * d(steal)/d(total) directly
    quantifies how much compute the host took back mid-measurement --
    loadavg only shows the guest's own runnable queue."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        # fields: user nice system idle iowait irq softirq steal guest
        # guest_nice -- the kernel already folds guest/guest_nice into
        # user/nice, so summing all 10 double-counts them and slightly
        # understates steal_pct (ADVICE r13): total over the first 8.
        return (vals[7] if len(vals) > 7 else 0, sum(vals[:8]))
    except (OSError, ValueError, IndexError):
        return (0, 0)

# Headline set: one per operator family (relational joins/aggs, windows,
# scalar funcs, doc pipeline, dedup, similarity, text stats, events windows).
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q10_returned_items",
]
# Extended per-family headliners appended when present in the registry.
OPTIONAL = [
    "w1_running_revenue_per_customer",
    "f9_events_json_extract",
    "doc_u7_extraction_cascade",
    "doc_pipeline_scaled",
    "doc_pipeline_scoped_scaled",
    "x1_dedup_exact",
    "x1_dedup_jaccard_ngram",
    "x1_dedup_minhash_lsh",
    "x2_cosine_topk",
    "x2_cosine_topk_bruteforce",
    "x2_cosine_topk_gemm",
    "x2_ann_pq_adc",
    "x1_dedup_embedding_cosine",
    "x5_decontaminate_semantic",
    "x1_dedup_keep_best_quality",
    "x4_token_stats",
    "x4_doc_fingerprint",
    "x5_decontaminate_ngram",
    "x5_repetition_stats",
    "x5_corpus_filter_funnel",
    "st_tumbling_window",
    "st_session_window",
]


def run_pass() -> dict:
    import __spark_entry__ as e
    from multiagent_form_schema_etl_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    names = [n for n in HEADLINE if n in qs] + [n for n in OPTIONAL if n in qs]

    # Warm the JVM + parquet footers once so timings measure steady state.
    qs[names[0]](spark, SF_DIR).collect()
    # Also materialize the shared document-fixture chain (blocks -> full
    # text) once: it is INPUT data for every doc_* headliner (driver-side
    # literal fixture standing in for a source read), and its first
    # materialization + stage scheduling was otherwise billed to whichever
    # doc query ran first (doc_u7, +~1.3s cold -- VERDICT r6 item 3). The
    # headliners' cold numbers keep their OWN one-time Catalyst analysis
    # and codegen compile; only the shared input warm-up moves here,
    # exactly like the parquet-footer warm-up above.
    if "doc_a3_full_text" in qs:
        qs["doc_a3_full_text"](spark, SF_DIR).collect()

    from pyspark.sql import functions as F

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        # Reduce through count + a hash of EVERY output column: forces full
        # computation of the result (nothing is prunable the way it is
        # under a bare count) while shipping one row to the driver -- the
        # timing measures the engine, not Python Row materialization of
        # large results (w1 at sf0.1 is 150k rows; collecting them costs
        # ~2.5s of pure driver-side transfer that no cluster deploy pays).
        [r] = (df.select(F.count(F.lit(1)).alias("n"),
                         F.max(F.xxhash64(*[F.col(c) for c in df.columns]))
                          .alias("h"))
               .collect())
        assert r["n"] >= 0
        return round(time.perf_counter() - t0, 3)

    def run_collect(name: str) -> float:
        t0 = time.perf_counter()
        rows = qs[name](spark, SF_DIR).collect()
        assert len(rows) >= 0
        return round(time.perf_counter() - t0, 3)

    # Cold pass (includes each query's one-time Catalyst analysis + codegen
    # compile -- the headline, comparable across rounds), then a warm pass
    # isolating steady-state execution: at scale the compile constant
    # amortizes to zero, so warm times are the per-round throughput signal.
    times = {name: run_once(name) for name in names}
    warm = {name: run_once(name) for name in names}
    # Methodology bridge (r2 -> r3 honesty): the r4+ hash-reduce timing
    # flatters large-result queries vs r1's collect()-based numbers; carry
    # the old methodology for the two affected headliners so r1->rN trends
    # stay comparable in one record.
    collect_times = {name: run_collect(name)
                     for name in ("w1_running_revenue_per_customer",
                                  "st_session_window") if name in qs}
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
        "queries_collect_method": collect_times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # Scaling-probe evidence (VERDICT r14 item 2): the record itself
        # proves which core count the session ACTUALLY ran with -- the
        # driver's 8-vs-32-core probe saw flat ratios at sf0.1 (fixed
        # per-query planning cost dominates 0.5-2s queries) and had no
        # in-record signal to distinguish "env ignored" from
        # "overhead-dominated"; master + defaultParallelism settle it.
        "master": spark.sparkContext.master,
        "parallelism": spark.sparkContext.defaultParallelism,
    }


def main() -> None:
    if "--single" in sys.argv:
        print(json.dumps(run_pass()))
        return
    n = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # soft wall-clock budget: if the box is slow enough that further
    # passes would risk an external timeout, stop after the current pass
    # and report medians of what completed (>= 1 pass always runs)
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "480"))
    t_start = time.perf_counter()
    runs = []
    for _ in range(n):
        if runs and time.perf_counter() - t_start > budget_s:
            break
        # fresh subprocess JVM per pass: cold numbers keep their own
        # analysis+codegen, and a noisy-host spike in one pass cannot
        # contaminate the others
        load_before = _loadavg()
        steal0, total0 = _cpu_counters()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single"],
            stdout=subprocess.PIPE, text=True, env=os.environ)
        # Scan candidate brace-prefixed lines in REVERSE for one that both
        # parses and carries our metric -- a stray brace-prefixed log line
        # after the record (JVM shutdown chatter) must not crash the
        # multi-run bench with a bare JSONDecodeError (ADVICE r8).
        rec = None
        for ln in reversed([ln for ln in p.stdout.splitlines()
                            if ln.lstrip().startswith("{")]):
            try:
                cand = json.loads(ln)
            except ValueError:
                continue
            if (isinstance(cand, dict)
                    and cand.get("metric") == "headline_queries_total_runtime"):
                rec = cand
                break
        if p.returncode != 0 or rec is None:
            raise RuntimeError(
                f"bench pass failed (rc={p.returncode}, "
                f"record={'missing' if rec is None else 'ok'}): "
                f"{p.stdout[-500:]}")
        rec["loadavg_before"] = load_before
        rec["loadavg_after"] = _loadavg()
        steal1, total1 = _cpu_counters()
        rec["steal_pct"] = (round(100.0 * (steal1 - steal0)
                                  / max(1, total1 - total0), 2)
                            if total1 > total0 else None)
        runs.append(rec)

    full, line = build_records(runs)
    # Full record (medians + every per-run sample) goes to a committed side
    # artifact; stdout gets ONLY a compact medians line. VERDICT r8 item 1:
    # the one-line multi-run record (~6-7 KB) overflowed the driver's ~2 KB
    # stdout-tail capture and BENCH_r08.parsed came back null -- the error
    # bars live in the file, the driver contract line stays small.
    side = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_LOCAL.json")
    try:
        with open(side, "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout line still carries the medians
    print(line)


_LINE_BUDGET = 1900  # hard cap: never overflow the driver's ~2 KB tail


def build_records(runs: list[dict]) -> tuple[dict, str]:
    """(full side-artifact record, compact stdout line) from per-pass
    records. Pure function so the line-budget contract is unit-testable
    (tests/test_cli.py)."""

    def med(xs):
        return round(statistics.median(xs), 3)

    full = {
        "metric": "headline_queries_total_runtime",
        # headline value/queries = per-total and per-query MEDIANS over
        # the runs (so the per-query medians need not sum to "value")
        "value": med([r["value"] for r in runs]),
        "unit": "sec",
        "queries": {q: med([r["queries"][q] for r in runs])
                    for q in runs[0]["queries"]},
        "queries_warm": {q: med([r["queries_warm"][q] for r in runs])
                         for q in runs[0]["queries_warm"]},
        "warm_total": med([r["warm_total"] for r in runs]),
        "queries_collect_method": {
            q: med([r["queries_collect_method"][q] for r in runs])
            for q in runs[0]["queries_collect_method"]},
        "n_runs": len(runs),
        "master": runs[0].get("master"),
        "parallelism": runs[0].get("parallelism"),
        "runs": [{"value": r["value"], "warm_total": r["warm_total"],
                  "queries": r["queries"], "queries_warm": r["queries_warm"],
                  "loadavg_before": r.get("loadavg_before", []),
                  "loadavg_after": r.get("loadavg_after", []),
                  "steal_pct": r.get("steal_pct")}
                 for r in runs],
        "sf": runs[0]["sf"],
    }
    # Self-diagnosis summary: the worst 1-min loadavg observed at any pass
    # boundary. A clean record reads load_max ~= active bench threads; a
    # contaminated one (BENCH_r12: ambient ~7) self-identifies in-line.
    samples = [la[0] for r in runs
               for la in (r.get("loadavg_before"), r.get("loadavg_after"))
               if la]
    full["load_max_1m"] = max(samples) if samples else None
    # Per-pass cold totals in wall order: a monotonic climb on identical
    # code (the BENCH_r12 signature) is visible in the stdout line itself.
    full["run_values"] = [r["value"] for r in runs]
    steals = [r["steal_pct"] for r in runs
              if r.get("steal_pct") is not None]
    full["steal_pct_max"] = max(steals) if steals else None
    compact = {k: full[k] for k in
               ("metric", "value", "unit", "queries", "queries_warm",
                "warm_total", "n_runs", "sf", "load_max_1m", "run_values",
                "steal_pct_max", "master", "parallelism")}
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > _LINE_BUDGET:
        compact.pop("queries_warm")  # still in BENCH_LOCAL.json
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > _LINE_BUDGET:
        # final unconditional fallback (ADVICE r9): if the cold medians
        # dict alone overflows, drop it too -- the headline value/
        # warm_total still parse, and the full per-query data is always
        # in BENCH_LOCAL.json
        compact.pop("queries")
        compact["queries_in"] = "BENCH_LOCAL.json"
        line = json.dumps(compact, separators=(",", ":"))
    return full, line


if __name__ == "__main__":
    main()
