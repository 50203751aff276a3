#!/usr/bin/env python
"""Fresh-seed corpus regeneration drill (VERDICT r9 item 1).

Regenerates statistically-shaped twins of the driver's synthetic testdata
tables (TESTDATA.md: TPC-H-ish star schema + events + documents +
embeddings) under a DIFFERENT seed, into a scratch dir INSIDE the repo
(never touching /root/testdata). The point is robustness, not replication:
every committed knob (ANN probe radii, PQ rerank depth, IVF probes, the
rounded-oracle boundary audit, LIMIT tie-breaks) was sized on the seed-42
corpora -- running `tools/check.py` against a fresh-seed corpus proves the
knobs either hold, or fail through the PRE-DETECTION machinery (BOUNDARY
fail / the loud approximate-face diagnostic) rather than as a silent flip.

Shapes mirrored from the seed-42 data (measured in-round, recorded here):
- region/nation: 5 fixed regions, 25 NATION_i rows, regionkey = i % 5
- customer: n = 150000*sf, Customer#%09d, acctbal U(-1000,10000) 2dp,
  5 TPC-H market segments, nationkey U{0..24}
- supplier: n = 10000*sf, same acctbal shape
- part: n = 200000*sf, name = adj + ' ' + noun (7x7 vocab),
  Brand#{0..24}, 6 types, size U{1..50}, retailprice 900 + 0.1*(i%200)
- orders: n = 1.5M*sf, custkey U{customers}, status in {P,O,F},
  totalprice U(1300,500000) 2dp, orderdate U(1995-01-01..2001-08-01)
  at day precision, 5 TPC-H priorities
- lineitem: per-order line count ~ Poisson(4.07) clipped to [0,7]
  (seed-42 measures avg 4.07, max linenumber 7, ~1.7% empty orders),
  partkey/suppkey uniform FKs, quantity U{1..50} as double, discount
  U{0..0.10} 2dp, tax U{0..0.08} 2dp, extendedprice U(900,105000) 2dp,
  shipdate = orderdate + U{1..95} days
- events: n = 1M*sf, user_id U{customers/10}, 5 uniform event types,
  ts = 2024-01-01 + cumulative Exp(mean = 30d/n) gaps (event_id-ordered),
  value ~ Exp(mean 50) clipped to >= 0.01 2dp, props = '{"k": U{0..99}}'
- documents: 500 rows below sf0.1 (5000 at sf0.1), text = U{10..99}
  words from the 31-word query vocab, lang weighted
  {en:.4, es/fr/zh/de:.15}, source = src{i%20}, n_chars = len(text)
- embeddings: 500 rows below sf0.1 (2000 at sf0.1), 64-dim float32
  unit vectors (normalized post-float32-cast like the originals),
  label U{0..9} (labels are NOT cluster-structured in seed-42 either)

Usage: python tools/regen_corpus.py [--seed 4242] [--sfs 0.001,0.01]
       [--out fresh_seed_data]
Then:  SPARK_GRAFT_SF_DIR=fresh_seed_data/sf0.01 python tools/check.py
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = (["en"] * 8 + ["es"] * 3 + ["fr"] * 3 + ["zh"] * 3 + ["de"] * 3)
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ADJS = ["red", "cold", "hot", "blue", "small", "old", "new"]
NOUNS = ["bolt", "widget", "gear", "anvil", "ring", "plate", "rod"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
MAX_WORDS = 99  # doc length upper bound; --max-words overrides
LABEL_SKEW = False  # --label-skew: 60%/1% embedding-label skew


def _write(out_dir: str, name: str, df: pd.DataFrame) -> None:
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    # timestamps at microsecond precision, like the driver's files
    fields = [pa.field(f.name, pa.timestamp("us"))
              if pa.types.is_timestamp(f.type) else f for f in tbl.schema]
    tbl = tbl.cast(pa.schema(fields))
    pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))


def generate(sf: float, seed: int, out_dir: str) -> dict:
    rng = np.random.default_rng(seed + int(sf * 100000))
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150000 * sf)
    n_supp = max(int(10000 * sf), 1)
    n_part = int(200000 * sf)
    n_ord = int(1500000 * sf)
    n_ev = int(1000000 * sf)
    n_doc = 5000 if sf >= 0.1 else 500
    n_emb = 2000 if sf >= 0.1 else 500

    _write(out_dir, "region", pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": REGIONS}))
    _write(out_dir, "nation", pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32)}))
    _write(out_dir, "customer", pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, n_cust)}))
    _write(out_dir, "supplier", pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))
    _write(out_dir, "part", pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{a} {b}" for a, b in zip(rng.choice(ADJS, n_part),
                                              rng.choice(NOUNS, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
        "p_type": rng.choice(
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"],
            n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(
            900.0 + 0.1 * (np.arange(n_part) % 200), 2)}))

    base = np.datetime64("1995-01-01")
    span_days = int((np.datetime64("2001-08-01") - base)
                    / np.timedelta64(1, "D"))
    odate = base + rng.integers(0, span_days + 1, n_ord).astype(
        "timedelta64[D]")
    _write(out_dir, "orders", pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": rng.choice(["P", "O", "F"], n_ord),
        "o_totalprice": np.round(rng.uniform(1300, 500000, n_ord), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": rng.choice(PRIORITIES, n_ord)}))

    k = np.clip(rng.poisson(4.07, n_ord), 0, 7)
    l_ok = np.repeat(np.arange(n_ord, dtype=np.int64), k)
    n_li = len(l_ok)
    l_ln = (np.arange(n_li) - np.repeat(np.cumsum(k) - k, k) + 1)
    l_odate = np.repeat(odate, k)
    _write(out_dir, "lineitem", pd.DataFrame({
        "l_orderkey": l_ok,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": l_ln.astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["F", "O"], n_li),
        "l_shipdate": (l_odate + rng.integers(1, 96, n_li).astype(
            "timedelta64[D]")).astype("datetime64[us]")}))

    gaps = rng.exponential(30 * 86400 / max(n_ev, 1), n_ev)
    ts = (np.datetime64("2024-01-01", "us")
          + (np.cumsum(gaps) * 1e6).astype("timedelta64[us]"))
    _write(out_dir, "events", pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, max(n_cust // 10, 1), n_ev),
        "event_type": rng.choice(ETYPES, n_ev),
        "value": np.maximum(np.round(rng.exponential(50, n_ev), 2), 0.01),
        "props": [json.dumps({"k": int(v)})
                  for v in rng.integers(0, 100, n_ev)]}))

    texts = [" ".join(rng.choice(VOCAB, rng.integers(10, MAX_WORDS + 1)))
             for _ in range(n_doc)]
    _write(out_dir, "documents", pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)}))

    m = rng.standard_normal((n_emb, 64)).astype(np.float32)
    m = m / np.linalg.norm(m, axis=1, keepdims=True).astype(np.float32)
    if LABEL_SKEW:
        # r14 drill: label 0 at 60% of the corpus, label 9 at 1%, the
        # rest uniform over the remaining 39% -- stresses the filtered
        # faces' per-(label, band, bucket) cap and candidate-volume
        # claims where label slices are unbalanced (seed-42 labels are
        # ~uniform 10%)
        p = [0.60] + [0.39 / 8] * 8 + [0.01]
        labels = rng.choice(10, n_emb, p=p).astype(np.int32)
    else:
        labels = rng.integers(0, 10, n_emb).astype(np.int32)
    _write(out_dir, "embeddings", pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": [row for row in m],
        "label": labels}))

    return {"sf": sf, "out": out_dir, "lineitem": n_li, "orders": n_ord,
            "events": n_ev, "documents": n_doc, "embeddings": n_emb}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--sfs", default="0.001,0.01")
    ap.add_argument("--out", default="fresh_seed_data")
    ap.add_argument("--en-weight", type=int, default=8,
                    help="en fraction = exactly en-weight/20 of the lang "
                         "mix (default 8 matches seed-42; 18 = a 90%%-en "
                         "skew drill). NOTE: before r11 a max() floor "
                         "kept all 4 other langs in the mix, so "
                         "--en-weight 18 actually ran 18/22 = 81.8%% en "
                         "-- the r10 'shape-shift 90%%-en' record is "
                         "really an 81.8%%-en run (ADVICE r10).")
    ap.add_argument("--label-skew", action="store_true",
                    help="embedding labels 60%%/1%%-skewed instead of "
                         "uniform (r14 filtered-faces drill)")
    ap.add_argument("--max-words", type=int, default=99,
                    help="doc length upper bound in words (default 99 "
                         "matches seed-42; raise for a length-shift drill)")
    a = ap.parse_args()
    global LANGS, MAX_WORDS, LABEL_SKEW
    MAX_WORDS = a.max_words
    LABEL_SKEW = a.label_skew
    others = ["es", "fr", "zh", "de"]
    # en fraction is exactly en_weight/20 (ADVICE r10: the old
    # max(20-en_weight, 4) floor silently diluted high skews -- the r10
    # "90%-en" drill actually ran 18/22 = 81.8% en). At en-weight > 16
    # the tail langs drop out of the mix; that is the documented cost of
    # an exact high skew. The 20-slot layout keeps the default
    # (en-weight 8) bit-identical to the r10 drill corpora.
    rest = 20 - a.en_weight
    if rest < 0:
        ap.error("--en-weight must be <= 20")
    LANGS = (["en"] * a.en_weight
             + [others[i % len(others)] for i in range(rest)])
    for sf in (float(s) for s in a.sfs.split(",")):
        d = os.path.join(a.out, f"sf{sf:g}")
        print(json.dumps(generate(sf, a.seed, d)))


if __name__ == "__main__":
    main()
