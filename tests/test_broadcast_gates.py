"""Size-gated broadcast hints (VERDICT r10).

A forced ``F.broadcast()`` hint on a corpus-growing relation is
measured-right at gate scale and OOM-certain at 100x. Round 11 routed every
such hint through ``catalog.gated_broadcast`` (hint only while the parquet
footer row count is under ``BROADCAST_MAX_ROWS``) or removed it. These tests
pin (a) the gate's two branches, (b) the metadata row counter, and (c) the
STATIC property that every remaining raw ``F.broadcast(`` call site in the
package is on the reviewed allowlist of genuinely bounded relations -- a new
hint on a documents/fact-derived relation fails here until reviewed.
"""

from __future__ import annotations

import re
from pathlib import Path

from conftest import SF_CHECK, SF_SMOKE

PKG = Path(__file__).resolve().parents[1] / "multiagent_form_schema_etl_spark"


def test_gated_broadcast_keeps_hint_under_gate(spark):
    from pyspark.sql import functions as F

    from multiagent_form_schema_etl_spark.catalog import (
        BROADCAST_MAX_ROWS, gated_broadcast)

    small = spark.range(10).select(F.col("id").alias("k"))
    big = spark.range(1000).select(F.col("id").alias("k"))
    plan = big.join(gated_broadcast(small, 10), "k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # exactly at the cap still hints; one above does not
    hinted = gated_broadcast(small, BROADCAST_MAX_ROWS)
    assert "UnresolvedHint broadcast" in hinted._jdf.queryExecution() \
        .logical().toString()
    unhinted = gated_broadcast(small, BROADCAST_MAX_ROWS + 1)
    assert "Hint" not in unhinted._jdf.queryExecution().logical().toString()


def test_table_rowcount_matches_scan_and_caches(spark):
    from multiagent_form_schema_etl_spark import catalog

    n = catalog.table_rowcount(spark, SF_SMOKE, "documents")
    assert n == catalog.load_table(spark, SF_SMOKE, "documents").count()
    # cached on (path, mtime): a second call answers from the dict
    key_hits = [k for k in catalog._rowcount_cache
                if k[0].endswith("documents.parquet")
                and SF_SMOKE in k[0]]
    assert key_hits, "rowcount cache not populated"
    assert catalog.table_rowcount(spark, SF_SMOKE, "documents") == n
    # events is excluded by contract (nanos-typed ts generations)
    try:
        catalog.table_rowcount(spark, SF_SMOKE, "events")
        raise AssertionError("events must be rejected")
    except KeyError:
        pass


def test_table_rowcount_non_local_uri_falls_back_to_footer_stats(spark):
    """ADVICE r12: the pyarrow fast path assumes a local filesystem; a
    URI-schemed sf_dir must route through footer_stats (the DSv2
    footer-pushdown COUNT through the Hadoop FS layer -- the reason the
    `spark` parameter stays in the signature). file:// is the one
    Hadoop-resolvable scheme available in this container; the count must
    match the local fast path's."""
    from multiagent_form_schema_etl_spark import catalog

    local = catalog.table_rowcount(spark, SF_SMOKE, "documents")
    via_uri = catalog.table_rowcount(spark, "file://" + SF_SMOKE,
                                     "documents")
    assert via_uri == local > 0
    # and the fallback genuinely populated its own cache key
    assert any(k[0].startswith("file://") for k in catalog._rowcount_cache)


def test_gated_sites_still_broadcast_at_gate_scale(spark):
    """A flagship gated site (relational._gb on the corpus-growing TPC-H
    customer/supplier dims, q05) keeps its measured-right BroadcastHashJoin
    at gate scale -- the gate changes the 100x posture, not the sf0.01
    plan. (r15: the previous flagship, _tok_d_df's doc-attribute attach,
    no longer exists -- lang/bucket/n_tok now ride each token row from the
    same document row, no join at all; x1_dedup_jaccard_ngram's zero-join
    token relation is asserted in test_corpus_prep.)"""
    from multiagent_form_schema_etl_spark.operators.relational import (
        q05_local_supplier_volume)

    plan = q05_local_supplier_volume(spark, SF_CHECK)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# Reviewed raw-hint allowlist: (file relative to the package, first argument
# expression of F.broadcast). Every entry is a relation whose size is bounded
# by CONSTRUCTION (literal dims, fixed query sets, clamp/cap-bounded
# aggregates, k/K-bounded loop state, one micro-batch) -- NOT by the corpus.
_ALLOWED_RAW = {
    # the gate itself
    ("catalog.py", "df"),
    # TPC-H fixed dims (25/5 rows at every SF) and 1-row aggregates
    ("operators/aggregates.py", "nation"),
    ("operators/aggregates.py", "boff"),  # domain-bounded bucket offsets
    ("operators/aggregates.py", "qs"),    # literal 4-row quantile dim
    ("operators/windows.py", "nation"),
    ("operators/relational.py", "nation"),
    ("operators/relational.py", "region"),
    ("operators/relational.py", "cn"),      # nation projection
    ("operators/relational.py", "sn"),      # nation projection
    ("operators/relational.py", "mx"),      # 1-row max
    ("operators/relational.py", "avg_bal"),  # 1-row avg
    ("operators/relational.py", "total"),   # 1-row sum
    # dedup: block/cap/batch-bounded relations
    ("operators/dedup.py", "rep"),    # one row per (lang,bucket) block
    ("operators/dedup.py", "small"),  # cap-bounded LSH buckets
    ("operators/dedup.py", "good"),   # cap-bounded SimHash buckets
    ("operators/dedup.py", "bh"),     # one ingestion micro-batch by contract
    ("operators/dedup.py", "exact"),  # subset of the micro-batch
    ("operators/dedup.py", "near"),   # subset of the micro-batch
    ("operators/dedup.py", "na"),     # per-source sizes (|sources|-bounded)
    ("operators/dedup.py", "nb"),     # per-source sizes (|sources|-bounded)
    ("operators/dedup.py", "nl"),     # per-language doc counts (|langs|)
    # document pipeline: schema/rules-as-data dims (schema-bounded)
    ("operators/document.py", "cand"),
    ("operators/document.py", "s"),
    ("operators/document.py", "schema_meta_df"),
    # bounded aggregates / literal dims
    ("operators/functions_queries.py", "merged"),  # per-month agg
    ("operators/functions_queries.py", "est"),     # 1 row
    ("operators/functions_queries.py", "bounds"),  # 1 row
    ("operators/functions_queries.py", "offs"),    # clamp-bounded offsets
    ("operators/joins.py", "kws"),     # literal keyword dim
    ("operators/joins.py", "segs"),    # literal segment dim
    ("operators/joins.py", "orders"),  # pre-filtered o_orderkey < 2000
    ("operators/llmprep.py", "direct"),   # per-mktsegment agg
    ("operators/llmprep.py", "offsets"),  # clamp-bounded offsets
    ("operators/llmprep.py", "profiles"),  # literal language profiles
    ("operators/llmprep.py", "tot"),    # 1-row corpus total
    ("operators/llmprep.py", "norm"),   # 1-row term sum
    ("operators/llmprep.py", "rates.select"),  # |langs|-bounded rates
    ("operators/llmprep.py", "bw"),  # bloom bitset: <= _BLOOM_M_MAX/64
    #                                  rows (cap-bounded, never corpus-sized)
    # similarity: fixed query sets / K-bounded state
    ("operators/similarity.py", "q"),
    ("operators/similarity.py", "a"),        # query slice
    ("operators/similarity.py", "b"),        # query-side GEMM blocks
    ("operators/similarity.py", "cand"),     # k*|queries|-bounded
    ("operators/similarity.py", "ca"),  # MMR pool: |queries|*C rows
    ("operators/similarity.py", "cb"),  # MMR pool: |queries|*C rows
    ("operators/similarity.py", "na"),  # query-side norms: _N_QUERIES rows
    #   (r14: pruned to the bounded query set before the decimal fold)
    ("operators/similarity.py", "va"),  # MMR candidate vec+norm: |Q|*C rows
    ("operators/similarity.py", "vb"),  # MMR candidate vec+norm: |Q|*C rows
    ("operators/similarity.py", "cand_ids"),  # MMR pool ids: |Q|*C rows
    ("operators/similarity.py", "probes"),   # |queries|*probe-bounded
    ("operators/similarity.py", "qv"),       # query vectors
    ("operators/similarity.py", "centroids"),  # K-bounded
    ("operators/similarity.py", "center.select"),  # 1 row
    ("operators/similarity.py", "picked_df"),      # k-bounded
    # textstats: literal profiles / clamp-bounded / term-pruned
    ("operators/textstats.py", "tf"),        # fixed 20-doc slice
    ("operators/textstats.py", "profiles"),
    ("operators/textstats.py", "off_df"),    # clamp-bounded offsets
    ("operators/textstats.py", "q"),         # literal query terms
    ("operators/textstats.py", "df.withColumnRenamed"),  # term-pruned df
    ("operators/textstats.py", "stats"),     # 1 row
    # streaming: bounded aggregates / one micro-batch / caller-contract dim
    ("streaming/batch_windows.py", "stats"),   # per-event_type agg
    ("streaming/batch_windows.py", "totals"),  # per-window agg
    ("streaming/batch_windows.py", "anchor"),  # 1-row max-ts aggregate
    ("streaming/doc_stream.py", "batch_docs"),  # one micro-batch
    ("streaming/structured.py", "dim"),  # upsert helper: dim by contract
}


def test_every_raw_broadcast_site_is_allowlisted():
    found = set()
    for f in sorted(PKG.rglob("*.py")):
        rel = str(f.relative_to(PKG))
        src = f.read_text()
        for m in re.finditer(r"F\.broadcast\(\s*([A-Za-z_][\w.]*)", src):
            found.add((rel, m.group(1)))
    extra = found - _ALLOWED_RAW
    assert not extra, (
        "raw F.broadcast() on a relation not on the reviewed allowlist -- "
        "if it is corpus-growing, route it through catalog.gated_broadcast; "
        f"if bounded by construction, review and allowlist: {sorted(extra)}")


def test_corpus_growing_sites_use_the_gate():
    """The r10-flagged sites (and their same-class twins) reference the
    gate, not a raw hint: a regression back to F.broadcast on these
    relations fails here by name."""
    gated_files = [
        "operators/dedup.py",        # _tok_d_df, blocked_components, tokd
        "operators/similarity.py",   # per-vector norm attaches
        "operators/relational.py",   # customer/supplier/part via _gb
        "streaming/dedup_stream.py",  # corpus token-set side
        "streaming/batch_windows.py",
        "streaming/structured.py",
    ]
    for rel in gated_files:
        src = (PKG / rel).read_text()
        assert "gated_broadcast" in src, f"{rel} lost its gated hints"
    # and the two dropped-hint sites stay dropped
    doc = (PKG / "operators/document.py").read_text()
    assert "F.broadcast(forms" not in doc
    llm = (PKG / "operators/llmprep.py").read_text()
    assert "F.broadcast(types" not in llm
    ts = (PKG / "operators/textstats.py").read_text()
    assert "F.broadcast(df)" not in ts  # tf_rarity full-vocab hint
    dd = (PKG / "operators/dedup.py").read_text()
    assert "F.broadcast(src" not in dd  # source-overlap doc->source map
    assert "F.broadcast(attrs" not in dd  # doc-attribute dims
