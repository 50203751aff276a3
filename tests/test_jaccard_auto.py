"""Both branches of the Jaccard auto-selector pinned in CI (VERDICT r3
item 6): the scale-probe corpora all chose the inverted index, so a
constructed dense-block corpus must force the blockpairs branch and a
sparse one the ngram branch -- and each branch's result must equal the
other strategy's on the same data, so the selector can't silently
degenerate into picking a wrong-but-fast plan.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _write_corpus(tmp_path, name, rows):
    """A documents.parquet with the driver's schema plus the OTHER tables
    the catalog may load (copied from sf0.001 so loaders don't 404)."""
    d = tmp_path / name
    d.mkdir()
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(SF_SMOKE, f), d / f)
    pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source",
                                "n_chars"]).to_parquet(d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def dense_dir(tmp_path_factory):
    """Dense block: 20 IDENTICAL 80-token docs in one (lang, bucket) block
    (inverted index pays vocab rows per pair) plus 100 singleton docs in
    their own buckets (diluting avg tokens/doc, which only the pair-join
    estimate scales with) => pair_cost < idx_cost => blockpairs."""
    shared = " ".join(f"tok{i}" for i in range(80))
    rows = [(i, shared, "en", "src0", 10) for i in range(20)]
    rows += [(100 + i, f"solo{i}", "en", "src0", 50 * (i + 2))
             for i in range(100)]
    return _write_corpus(tmp_path_factory.mktemp("jac"), "dense", rows)


@pytest.fixture(scope="module")
def sparse_dir(tmp_path_factory):
    """Sparse block: 30 docs sharing one (lang, bucket) block with fully
    DISJOINT vocabularies => zero token collisions (idx_cost 0) while the
    pair join would still enumerate C(30,2) pairs => ngram."""
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(10)), "en", "src0", 10)
            for i in range(30)]
    return _write_corpus(tmp_path_factory.mktemp("jac"), "sparse", rows)


def test_cost_model_picks_blockpairs_on_dense(spark, dense_dir):
    from multiagent_form_schema_etl_spark.operators import dedup

    assert dedup._jaccard_auto_choice(spark, dense_dir) == "blockpairs"


def test_cost_model_picks_ngram_on_sparse(spark, sparse_dir):
    from multiagent_form_schema_etl_spark.operators import dedup

    assert dedup._jaccard_auto_choice(spark, sparse_dir) == "ngram"


@pytest.mark.parametrize("corpus", ["dense_dir", "sparse_dir"])
def test_auto_equals_both_strategies(spark, corpus, request):
    """On each constructed corpus the selected plan, the non-selected
    plan, and the registered auto query must return identical pair sets
    (shared semantics regardless of which branch the model picks)."""
    import __spark_entry__ as e
    from multiagent_form_schema_etl_spark.operators import dedup

    sf = request.getfixturevalue(corpus)
    key = lambda df: sorted((r.doc_a, r.doc_b, round(r.jaccard, 9))
                            for r in df.collect())
    ngram = key(dedup.x1_dedup_jaccard_ngram(spark, sf))
    block = key(dedup.x1_dedup_jaccard_blockpairs(spark, sf))
    auto = key(e.queries()["x1_dedup_jaccard_auto"](spark, sf))
    assert ngram == block == auto
    if corpus == "dense_dir":
        assert len(auto) == 20 * 19 // 2  # the identical-doc clique
        assert all(j == 1.0 for _, _, j in auto)
    else:
        assert auto == []  # disjoint vocabularies: no >= 0.8 pair


def test_substring_spans_constructed(spark, tmp_path):
    """Span semantics pinned on a constructed corpus: doc 1 embeds a
    known 10-token run of doc 0 (one span, correct start positions and
    length), doc 2 shares only a 5-token run (below the 6-gram seed, no
    span), doc 3 repeats the 10-token run TWICE (two diagonals, two
    spans against doc 0)."""
    from multiagent_form_schema_etl_spark.operators.dedup import (
        x1_dedup_substring_spans)

    run = " ".join(f"s{i}" for i in range(10))        # the shared span
    short = " ".join(f"s{i}" for i in range(5))       # below seed order
    rows = [
        (0, f"{run} a0 a1 a2", "en", "src0", 10),
        (1, f"b0 b1 {run} b2", "en", "src0", 10),
        (2, f"c0 {short} c1 c2 c3 c4 c5", "en", "src0", 10),
        (3, f"{run} d0 d1 {run}", "en", "src0", 10),
    ]
    sf = _write_corpus(tmp_path, "spans", rows)
    got = {(r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_len)
           for r in x1_dedup_substring_spans(spark, sf).collect()}
    assert (0, 1, 1, 3, 10) in got          # doc0 pos 1..10 == doc1 pos 3..12
    assert (0, 3, 1, 1, 10) in got          # first repeat
    assert (0, 3, 1, 13, 10) in got         # second repeat (other diagonal)
    assert not any(2 in (a, b) for a, b, *_ in got)  # 5-run never seeds
    assert (1, 3, 3, 1, 10) in got and (1, 3, 3, 13, 10) in got


def test_registered_dense_face_takes_blockpairs_on_real_corpus(spark):
    """The REGISTERED x1_dedup_jaccard_auto_dense face (VERDICT r7 item 7)
    must take the blockpairs branch on the real corpus -- the face raises
    if its derived boilerplate-flood shape ever selects ngram, so simply
    executing it is the pin -- and its output must be exactly the dense
    long-block pair set: every (lang, coarse-bucket) block of n_chars>=400
    docs pairs completely at jaccard 1.0 (all docs carry the block
    representative's text), and no sub-minimum doc ever appears."""
    from pyspark.sql import functions as F

    from multiagent_form_schema_etl_spark.catalog import load_table
    from multiagent_form_schema_etl_spark.operators.dedup import (
        x1_dedup_jaccard_auto_dense)

    rows = x1_dedup_jaccard_auto_dense(spark, SF_SMOKE).collect()
    assert rows and all(r["jaccard"] == 1.0 for r in rows)
    docs = load_table(spark, SF_SMOKE, "documents")
    blocks = {}
    for r in (docs.filter("n_chars >= 400")
              .select("doc_id", "lang",
                      F.floor(F.col("n_chars") / 400.0).alias("b"))
              .collect()):
        blocks.setdefault((r["lang"], r["b"]), []).append(r["doc_id"])
    want = set()
    for mem in blocks.values():
        mem = sorted(mem)
        want.update((a, b) for i, a in enumerate(mem) for b in mem[i + 1:])
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == want
