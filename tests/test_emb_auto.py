"""Both branches of the embedding near-dup auto-selector pinned in CI
(VERDICT r8 item 4). The selector's DEFAULT calibration routes every
measurable corpus to exact gemm (the r9 probes clocked the GEMM face
4.7x/3.4x faster than the cell join at 10x/30x, with IVF also leaking
recall -- SCALE_PROBE.md), so the ivf branch's routing and end-to-end
output are exercised here with the calibration constants OVERRIDDEN
(documented per test): a uniform corpus above a shrunken budget must
take the ivf branch and match the exact face set-for-set, while a
twin-flood corpus (the r8 adversarial regime) must route back to gemm
via occupancy skew alone even above budget.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

_DIM = 128
_N = 800
_CELL_OVERRIDE = 25  # n/25 = 32 cells at n=800: the crossover a 250-target
#                      quantizer only reaches at ~8k vectors, scaled into
#                      pytest territory (the cost model itself is untouched)


def _write_emb_corpus(tmp_path, name, vecs: np.ndarray) -> str:
    d = tmp_path / name
    d.mkdir()
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            shutil.copy(os.path.join(SF_SMOKE, f), d / f)
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 4 for i in range(len(vecs))], pa.int32()),
    })
    pq.write_table(t, d / "embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def uniform_dir(tmp_path_factory):
    """800 seeded random unit vectors (random 128-dim cosines stay ~5
    sigma below the 0.45 threshold) plus 10 planted identical-twin pairs
    so the near-dup result is non-trivial: occupancy is near-uniform =>
    candidate-join rows < all-pairs => ivf."""
    rng = np.random.default_rng(42)
    v = rng.normal(size=(_N, _DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    for i in range(10):  # twin pairs (2i, 2i+1) in the low-id range
        v[2 * i + 1] = v[2 * i]
    return v


@pytest.fixture(scope="module")
def twin_dir_vecs():
    """The r8 adversarial regime scaled down: 8 distinct vectors x 100
    exact copies. Twins co-assign, so ~8 mega-cells blow the candidate
    estimate past all-pairs => gemm."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(8, _DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    return np.repeat(base, _N // 8, axis=0)


def _pairset(df):
    return {(r["vec_a"], r["vec_b"], r["cosine"]) for r in df.collect()}


def test_gate_corpus_picks_gemm(spark):
    # 500 vectors = 125k pairs, five orders under the 2e9 exact budget:
    # gemm is GUARANTEED by the tractability rule, and the registered
    # face additionally ASSERTS it in-query for every under-budget corpus.
    from multiagent_form_schema_etl_spark.operators import similarity

    assert similarity._emb_dedup_choice(spark, SF_SMOKE) == "gemm"


def test_default_rule_needs_deep_ivf_advantage():
    # The pure rule, at the committed calibration: exact under budget;
    # above budget the cell join must beat all-pairs by the MEASURED
    # 25x per-row cost, which uniform K = n/250 cells only reach past
    # ~120k vectors (probe-measured: gemm faster at 10x/30x).
    from multiagent_form_schema_etl_spark.operators.similarity import (
        _GEMM_PAIR_BUDGET, _emb_dedup_choice_from)

    assert _emb_dedup_choice_from(1e6, _GEMM_PAIR_BUDGET) == "gemm"
    assert _emb_dedup_choice_from(1e9, 1e10) == "gemm"   # 25e9 >= 1e10
    assert _emb_dedup_choice_from(1e8, 1e10) == "ivf"    # 2.5e9 < 1e10


def test_uniform_corpus_picks_ivf_and_matches_exact(
        spark, tmp_path_factory, uniform_dir, monkeypatch):
    # Calibration OVERRIDDEN to bring the ivf branch into pytest range:
    # budget shrunk below the 800-vector all-pairs volume and the per-row
    # ratio set to 1 so the volume rule decides -- what's pinned is the
    # ROUTING plumbing and the ivf branch's end-to-end set-equality to
    # the exact face, not the production constants (those are probe-
    # measured and pinned in test_default_rule_needs_deep_ivf_advantage).
    from multiagent_form_schema_etl_spark.operators import similarity

    monkeypatch.setattr(similarity, "_IVF_DEDUP_CELL", _CELL_OVERRIDE)
    monkeypatch.setattr(similarity, "_GEMM_PAIR_BUDGET", 10_000)
    monkeypatch.setattr(similarity, "_IVF_ROW_COST", 1.0)
    d = _write_emb_corpus(tmp_path_factory.mktemp("emb"), "uniform",
                          uniform_dir)
    assert similarity._emb_dedup_choice(spark, d) == "ivf"
    auto = _pairset(similarity.x1_dedup_embedding_auto(spark, d))
    exact = _pairset(similarity.x1_dedup_embedding_cosine(spark, d))
    assert auto == exact
    assert len(exact) >= 10  # the planted twins all surfaced


def test_twin_flood_picks_gemm_even_above_budget(
        spark, tmp_path_factory, twin_dir_vecs, monkeypatch):
    # Same overrides as the uniform test -- but the twin flood's
    # occupancy skew pushes the candidate estimate past all-pairs, so the
    # skew rule routes back to gemm even though the corpus is "above
    # budget": the r8 adversarial regime, decided by measurement alone.
    from multiagent_form_schema_etl_spark.operators import similarity

    monkeypatch.setattr(similarity, "_IVF_DEDUP_CELL", _CELL_OVERRIDE)
    monkeypatch.setattr(similarity, "_GEMM_PAIR_BUDGET", 10_000)
    monkeypatch.setattr(similarity, "_IVF_ROW_COST", 1.0)
    d = _write_emb_corpus(tmp_path_factory.mktemp("emb"), "twins",
                          twin_dir_vecs)
    assert similarity._emb_dedup_choice(spark, d) == "gemm"
    # the gemm branch still returns the complete twin pair set
    auto = similarity.x1_dedup_embedding_auto(spark, d)
    n_groups = 8
    per_group = _N // n_groups
    expected_pairs = n_groups * per_group * (per_group - 1) // 2
    assert auto.count() == expected_pairs


def test_rerank_hybrid_handles_empty_text(spark, tmp_path_factory):
    """The lexical term's zero-union guard: a document with empty text
    must score lex = 0 (hybrid = alpha * cosine), not trip ANSI division
    by zero. Gate corpora never exercise this branch."""
    import pandas as pd

    from multiagent_form_schema_etl_spark.operators import similarity

    rng = np.random.default_rng(3)
    v = rng.normal(size=(40, 16))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[15] = v[0]  # cosine(0, 15) = 1.0 => guaranteed in query 0's top-k
    d = _write_emb_corpus(tmp_path_factory.mktemp("emb"), "rerank", v)
    # overwrite documents with matching doc_ids, two of them EMPTY text
    docs = pd.DataFrame({
        "doc_id": range(40),
        "text": ["" if i in (0, 15) else f"w{i} common tok{i % 5}"
                 for i in range(40)],
        "lang": "en", "source": "s", "n_chars": 0,
    })
    docs.to_parquet(os.path.join(d, "documents.parquet"))
    out = similarity.x2_rerank_hybrid(spark, d).collect()
    assert out, "rerank produced no rows"
    by_pair = {(r["query_id"], r["match_id"]): r["hybrid"] for r in out}
    # both sides empty => union 0 => lex exactly 0 => hybrid = alpha * cos
    assert (0, 15) in by_pair
    assert by_pair[(0, 15)] == round(similarity._RERANK_ALPHA * 1.0, 9)
