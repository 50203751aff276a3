"""STREAMING near-duplicate candidate generation (SURVEY §2.9 meets
§2.11 X1): the MinHash+LSH band-bucket index maintained as keyed
streaming state, so a corpus that arrives continuously (a landing zone,
a crawl) surfaces its near-dup candidate pairs AT INGEST instead of in a
nightly batch re-scan.

Design (idiomatic Structured Streaming, no reference analog -- the
reference processes documents one at a time and never deduplicates):

- signature + banding are STATELESS per row (`operators/dedup.
  minhash_band_buckets`: array-function MinHash, no shuffle), so the only
  stateful stage is the bucket membership itself;
- state = one ListState per (band, bucket) key holding the bucket's
  member doc_ids (bounded by ``cap``, the same frequent-bucket guard as
  the batch face: a bucket that big is non-discriminative);
- each arriving doc emits candidate pairs against the bucket's EXISTING
  members, then joins the list -- across micro-batches, a doc arriving
  today pairs with one ingested last week without any rescan.

Overflow semantics (documented divergence from the batch face): the
batch `x1_dedup_minhash_lsh` drops >cap buckets ENTIRELY (it sees final
sizes); a stream cannot retract already-emitted pairs, so this face
emits pairs among the first ``cap`` members and closes the bucket
(state stays bounded). On corpora where no bucket overflows, the two
candidate sets are IDENTICAL -- pinned in tests/test_streaming.py over a
multi-file stream that crosses micro-batch boundaries.

Downstream, candidates feed the same exact-Jaccard verification the
batch face uses (a stream-static or foreachBatch join). Candidate
emission is per-band (the raw face keeps band/bucket provenance);
`streaming_lsh_verified` collapses multi-band collisions with a chained
streaming dropDuplicates so its output matches the batch face's
DISTINCT row-for-row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import minhash_band_buckets

_CAND_SCHEMA = "band long, bucket long, doc_a long, doc_b long"
_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


# one symlink-wrapper dir per source FILE for the process lifetime --
# repeated probe/test invocations reuse it instead of littering /tmp
_STREAM_DIRS: dict[str, str] = {}


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over documents.parquet (directory-wrapped like
    stream_events; a real deployment reads a landing dir / topic)."""
    import tempfile

    src = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(src):
        d = src
    elif src in _STREAM_DIRS:
        d = _STREAM_DIRS[src]
    else:
        d = tempfile.mkdtemp(prefix="documents_stream_")
        os.symlink(src, os.path.join(d, "documents.parquet"))
        _STREAM_DIRS[src] = d
    return (spark.readStream.schema(_DOC_SCHEMA)
            .format("parquet").load(d))


def streaming_lsh_candidates(spark: SparkSession, sf_dir: str,
                             source: DataFrame | None = None,
                             cap: int = 50) -> DataFrame:
    """Live transformWithState plan: near-dup candidate pairs emitted the
    moment the second bucket member arrives. ``source`` lets tests inject
    a multi-file stream (maxFilesPerTrigger=1) proving bucket state
    survives micro-batch boundaries.

    Determinism: within a micro-batch new bucket members process in
    ascending doc_id order, and every pair is emitted (min, max)-
    normalized, so the collected output is reproducible and comparable
    set-wise to the batch face regardless of arrival interleaving.

    Environment gate: same protobuf requirement as the other
    transformWithState faces; satisfied by a real installation or the
    vendored wire-format shim (pbcompat)."""
    from .pbcompat import ensure_protobuf

    ensure_protobuf(spark)
    import pandas as pd
    from pyspark.sql.streaming import (StatefulProcessor,
                                       StatefulProcessorHandle)
    from pyspark.sql.types import LongType, StructField, StructType

    class BucketMembers(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._members = handle.getListState(
                "members", StructType([StructField("doc_id", LongType())]))

        def handleInputRows(self, key, rows, timerValues):
            band, bucket = int(key[0]), int(key[1])
            members = [int(r[0]) for r in self._members.get()]
            seen = set(members)
            out = []
            new_ids = sorted({int(x) for c in rows if len(c)
                              for x in c["doc_id"]} - seen)
            added: list[int] = []
            for d in new_ids:
                if len(members) >= cap:
                    break  # bucket closed: non-discriminative, state stays bounded
                out.extend((band, bucket, min(m, d), max(m, d))
                           for m in members)
                members.append(d)
                added.append(d)
            if added:
                # append only the DELTA: membership is append-only until
                # the bucket closes, and rewriting all ~cap rows per
                # micro-batch via put() would multiply state-store write
                # volume cap-fold on hot buckets
                self._members.appendList([[d] for d in added])
            yield pd.DataFrame(
                out, columns=["band", "bucket", "doc_a", "doc_b"])

        def close(self) -> None:
            pass

    docs = source if source is not None else stream_documents(spark, sf_dir)
    buckets = minhash_band_buckets(docs.select("doc_id", "text"))
    return buckets.groupBy("band", "bucket").transformWithStateInPandas(
        statefulProcessor=BucketMembers(),
        outputStructType=_CAND_SCHEMA,
        outputMode="Append",
        timeMode="None")


def stream_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over embeddings.parquet (same directory-wrap
    trick as stream_documents)."""
    import tempfile

    src = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(src):
        d = src
    elif src in _STREAM_DIRS:
        d = _STREAM_DIRS[src]
    else:
        d = tempfile.mkdtemp(prefix="embeddings_stream_")
        os.symlink(src, os.path.join(d, "embeddings.parquet"))
        _STREAM_DIRS[src] = d
    return (spark.readStream.schema(_EMB_SCHEMA)
            .format("parquet").load(d))


_SEMDECON_EVAL_MAX = 1_000_000  # held-out rows the closure may carry: a
#   1M x 64-dim float64 eval matrix is ~512 MB -- the outer limit of
#   "benchmark-sized" (real eval benches are thousands of rows); anything
#   larger indicates a broken split, not a bigger benchmark


def streaming_semantic_decon(spark: SparkSession, sf_dir: str,
                             source: DataFrame | None = None,
                             threshold: float = 0.42) -> DataFrame:
    """LIVE semantic decontamination: training examples arriving on a
    stream are flagged AT INGEST when their embedding sits within
    paraphrase distance (cosine >= ``threshold``) of any held-out/eval
    example -- the streaming twin of the batch
    `llmprep.x5_decontaminate_semantic`, for the landing-zone deployment
    where contaminated examples should never reach the corpus at all.

    Fully STATELESS past the source: the eval side is benchmark-sized by
    construction (the deterministic vec_id % 10 >= 8 split here; a real
    deployment pins its eval benches), so its L2-normalized matrix is
    collected once at plan build and rides the task closure -- each
    micro-batch pays one Arrow hop and one BLAS GEMM per batch, no
    state store, no shuffle. Output: (train_id, heldout_id, cosine) per
    hit, cosine rounded at 9 dp exactly like the batch face; per-pair
    rows (the batch face's pre-aggregation relation) so downstream can
    either drop flagged ids or aggregate as the batch face does.
    Pinned set-equal to the batch face over a 2-file micro-batched
    stream in tests/test_streaming.py."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from ..catalog import load_table

    held = (load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") % 10 >= 8)
            .select("vec_id", "embedding"))
    # Size-check BEFORE collecting (ADVICE r9): a count is executor-side
    # and cheap; collecting first would materialize a corpus-sized
    # relation on the driver before the guard could fire -- the very OOM
    # the bound exists to prevent.
    n_held = held.count()
    if n_held > _SEMDECON_EVAL_MAX:
        # the driver-side collect is bounded BY CONTRACT (eval benches
        # are benchmark-sized at any corpus scale); a misconfigured
        # split that sweeps a corpus-sized relation into the closure
        # must fail loudly here, not OOM the driver or executors
        raise ValueError(
            f"held-out side has {n_held} rows, exceeding the "
            f"benchmark-sized bound {_SEMDECON_EVAL_MAX} -- check the "
            "eval split; streaming_semantic_decon broadcasts the eval "
            "matrix in the task closure by design")
    held_rows = held.collect()
    h_ids = np.asarray([r["vec_id"] for r in held_rows], dtype=np.int64)
    hm = np.asarray([np.asarray(r["embedding"], dtype=np.float64)
                     for r in held_rows])
    hn = np.linalg.norm(hm, axis=1, keepdims=True)
    hn[hn == 0] = 1.0
    hm = hm / hn

    emb = source if source is not None else stream_embeddings(spark, sf_dir)
    train = emb.filter(F.col("vec_id") % 10 < 8)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf["embedding"]])
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1.0
            s = np.round((m / n) @ hm.T, 9)
            ii, jj = np.nonzero(s >= threshold)
            yield pd.DataFrame({"train_id": ids[ii],
                                "heldout_id": h_ids[jj],
                                "cosine": s[ii, jj]})

    return train.select("vec_id", "embedding").mapInPandas(
        score, "train_id long, heldout_id long, cosine double")


def streaming_lsh_verified(spark: SparkSession, sf_dir: str,
                           source: DataFrame | None = None,
                           cap: int = 50,
                           distinct_pairs: bool = True) -> DataFrame:
    """END-TO-END live near-dup: the stateful candidate stream above,
    verified by TRUE Jaccard >= 0.8 against the corpus token sets via a
    STREAM-STATIC join, then collapsed to ONE row per verified pair --
    the same DISTINCT the batch `x1_dedup_minhash_lsh` applies, as a
    chained streaming dropDuplicates (ADVICE r7: multi-band collisions
    used to multiply output rows vs the batch twin). Return contract:
    with the default ``distinct_pairs=True`` the output is row-for-row
    the batch face's verified-pair set restricted to prefix-cap
    candidates, and each pair appears in exactly one micro-batch (its
    first). State bound: the dedup operator keeps one row per DISTINCT
    verified pair -- the stream's own output, the minimum any exact
    pair-dedup can hold; pass ``distinct_pairs=False`` to trade duplicate
    emissions for zero extra state when the consumer dedups anyway.

    The static side is the CURRENT corpus snapshot (one sorted-distinct
    token array per doc, broadcastable per micro-batch); a live
    deployment refreshes it per batch or swaps in a foreachBatch lookup
    against the canonical store."""
    from pyspark.sql import functions as F

    from ..catalog import gated_broadcast, load_table, table_rowcount

    cands = streaming_lsh_candidates(spark, sf_dir, source=source, cap=cap)
    sets = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_sort(F.array_distinct(
            F.filter(F.split("text", " "), lambda w: w != "")))
         .alias("toks"))
    a = sets.select(F.col("doc_id").alias("doc_a"),
                    F.col("toks").alias("toks_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"),
                    F.col("toks").alias("toks_b"))
    # the token-set side is CORPUS-sized (one row per document): gate the
    # hint on the footer count (VERDICT r10); above the gate the candidate
    # relation (micro-batch-bounded) shuffle-joins on doc_id instead
    n_docs = table_rowcount(spark, sf_dir, "documents")
    j = (cands.join(gated_broadcast(a, n_docs), "doc_a")
         .join(gated_broadcast(b, n_docs), "doc_b")
         .withColumn("n_inter",
                     F.size(F.array_intersect("toks_a", "toks_b")))
         .withColumn("jaccard",
                     F.col("n_inter").cast("double")
                     / (F.size("toks_a") + F.size("toks_b")
                        - F.col("n_inter"))))
    out = (j.filter(F.col("jaccard") >= 0.8)
           .select("doc_a", "doc_b", "jaccard"))
    if distinct_pairs:
        out = out.dropDuplicates(["doc_a", "doc_b"])
    return out
