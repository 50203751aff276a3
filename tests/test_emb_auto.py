"""Both branches of the embedding near-dup auto-selector pinned in CI
(VERDICT r8 item 4): the gate corpora sit below the IVF crossover (the
4-probe cell join materializes ~2x the all-pairs volume at 500-2000
vectors), so a constructed uniform corpus must force the ivf branch --
and its output must be set-equal to the exact block-GEMM face on the
same data -- while a twin-flood corpus (the r8 probe's adversarial
regime) must route back to gemm via occupancy skew alone.
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
    # 500 vectors, K=8 cells, 4-probe: even perfectly uniform occupancy
    # puts the candidate join at 2x all-pairs, so gemm is GUARANTEED here
    # (sum m(m-1)/2 is minimized at uniform occupancy).
    from multiagent_form_schema_etl_spark.operators import similarity

    assert similarity._emb_dedup_choice(spark, SF_SMOKE) == "gemm"


def test_uniform_corpus_picks_ivf_and_matches_exact(
        spark, tmp_path_factory, uniform_dir, monkeypatch):
    from multiagent_form_schema_etl_spark.operators import similarity

    monkeypatch.setattr(similarity, "_IVF_DEDUP_CELL", _CELL_OVERRIDE)
    d = _write_emb_corpus(tmp_path_factory.mktemp("emb"), "uniform",
                          uniform_dir)
    assert similarity._emb_dedup_choice(spark, d) == "ivf"
    auto = _pairset(similarity.x1_dedup_embedding_auto(spark, d))
    exact = _pairset(similarity.x1_dedup_embedding_cosine(spark, d))
    assert auto == exact
    assert len(exact) >= 10  # the planted twins all surfaced


def test_twin_flood_picks_gemm(spark, tmp_path_factory, twin_dir_vecs,
                               monkeypatch):
    from multiagent_form_schema_etl_spark.operators import similarity

    monkeypatch.setattr(similarity, "_IVF_DEDUP_CELL", _CELL_OVERRIDE)
    d = _write_emb_corpus(tmp_path_factory.mktemp("emb"), "twins",
                          twin_dir_vecs)
    assert similarity._emb_dedup_choice(spark, d) == "gemm"
    # the gemm branch still returns the complete twin pair set
    auto = similarity.x1_dedup_embedding_auto(spark, d)
    n_groups = 8
    per_group = _N // n_groups
    expected_pairs = n_groups * per_group * (per_group - 1) // 2
    assert auto.count() == expected_pairs
