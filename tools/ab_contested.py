#!/usr/bin/env python
"""Same-session A/B of the two r14-contested rewrites (VERDICT r14 "Next
round" item 1): x5_repetition_stats (per-row sorted-array run-length folds
vs the old explode + groupBy/window shape) and x5_decontaminate_ngram
(single up-front repartition(gram) vs the old distinct-first layout).

The r14 builder's same-session A/B said both rewrites improved/flat; the
driver's cross-run cold comparison said both regressed >10%. Both
measurements ran on a box with documented +/-40% swings, so this probe
settles it: OLD and NEW shapes timed back-to-back IN THE SAME SESSION
(both sides see the same ambient), noop sink (guide §1.4), interleaved
O/N/O/N ... so a load ramp cannot favor one side, n passes per side,
/proc/stat steal telemetry over the whole window so the record
self-reports contamination.

Usage: python tools/ab_contested.py [--n 5] [--mult 10]
  --n     passes per side per face (default 5)
  --mult  also run on the tools/scale_probe.py x<mult>_linear replicated
          corpus (the "larger SF" datapoint the at-scale claims need);
          0 skips it.
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Prints one JSON line per (face, corpus) with per-side min/median seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from multiagent_form_schema_etl_spark.catalog import (  # noqa: E402
    gated_broadcast, load_table, table_rowcount)
from multiagent_form_schema_etl_spark.operators.llmprep import (  # noqa: E402
    _DECON_MAX_DF, _decon_gram_rows)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _steal() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return (v[7] if len(v) > 7 else 0, sum(v[:8]))


# --- OLD shapes, reconstructed verbatim from cc7985a~1 ----------------------

def repetition_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = (docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split("text", " "), lambda x: x != ""))
         .alias("pos", "tok")))
    tok_counts = (words.groupBy("doc_id", "tok")
                  .agg(F.count(F.lit(1)).alias("c")))
    per_doc_tok = (tok_counts.groupBy("doc_id")
                   .agg(F.sum("c").cast("long").alias("n_tokens"),
                        F.max("c").alias("top_tok")))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigram_counts = (words
                     .withColumn("nxt", F.lead("tok").over(w))
                     .filter(F.col("nxt").isNotNull())
                     .select("doc_id",
                             F.concat_ws(" ", "tok", "nxt").alias("bg"))
                     .groupBy("doc_id", "bg")
                     .agg(F.count(F.lit(1)).alias("c")))
    per_doc_bg = (bigram_counts.groupBy("doc_id")
                  .agg(F.max("c").alias("top_bigram")))
    j = per_doc_tok.join(per_doc_bg, "doc_id", "left")
    tok_frac = F.col("top_tok").cast("double") / F.col("n_tokens")
    bg_frac = (F.coalesce("top_bigram", F.lit(0)).cast("double")
               / F.greatest(F.col("n_tokens") - 1, F.lit(1)))
    return j.select(
        "doc_id", "n_tokens",
        F.round(tok_frac, 6).alias("top_token_frac"),
        F.round(bg_frac, 6).alias("top_bigram_frac"),
        ((tok_frac > 0.2) | (bg_frac > 0.18)).alias("is_repetitive"))


def decon_ngram_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = _decon_gram_rows(spark, sf_dir).distinct()
    train_grams = (grams.filter(~F.col("heldout"))
                   .groupBy("gram")
                   .agg(F.count(F.lit(1)).alias("train_df"))
                   .filter(F.col("train_df") <= _DECON_MAX_DF))
    held = grams.filter(F.col("heldout"))
    return (held.join(train_grams, "gram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared_grams"),
                 F.sum("train_df").cast("long").alias("n_train_hits")))


def jaccard_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r15 x1_dedup_jaccard_ngram, reconstructed verbatim (minus the
    track_persist, which would turn repeated noop passes into cache reads
    on both engines and time nothing)."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = table_rowcount(spark, sf_dir, "documents")
    attrs = docs.select(
        "doc_id", "lang",
        F.floor(F.col("n_chars") / 50.0).cast("long").alias("bucket"))
    tok = (docs.select("doc_id",
                       F.explode(F.split("text", " ")).alias("token"))
           .filter(F.col("token") != "").distinct()
           .join(gated_broadcast(attrs, n_docs), "doc_id"))
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token"))
               & (F.col("a.lang") == F.col("b.lang"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_tok").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_tok").alias("nb"))
    j = (inter.join(sa, "doc_a").join(sb, "doc_b")
         .withColumn("jaccard", F.col("n_inter").cast("double")
                     / (F.col("na") + F.col("nb") - F.col("n_inter"))))
    return j.filter(F.col("jaccard") >= 0.8).select("doc_a", "doc_b",
                                                    "jaccard")


def jaccard_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 x1_dedup_jaccard_ngram via the live helpers, minus the
    track_persist (same reason as above)."""
    from multiagent_form_schema_etl_spark.operators.dedup import (
        _jaccard_ngram_from, _tok_d_df)
    return _jaccard_ngram_from(_tok_d_df(spark, sf_dir))


def cosine_topk_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r15 x2_cosine_topk: separate corpus-wide norm scan re-attached
    through a size-gated join (vs the r15 fused match-side norm)."""
    from pyspark.sql import Window
    from multiagent_form_schema_etl_spark.operators.similarity import (
        _N_QUERIES, _TOP_K, _dec_dot, _dec_norm)
    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id",
                   F.transform("embedding", lambda x: x.cast("double"))
                   .alias("vec")))
    norms = emb.select("vec_id", _dec_norm("vec").alias("nrm"))
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv"))
    b = emb.select(F.col("vec_id").alias("match_id"),
                   F.col("vec").alias("mv"))
    dots = (F.broadcast(q).join(b, F.col("query_id") != F.col("match_id"))
            .select("query_id", "match_id", _dec_dot("qv", "mv").alias("dot")))
    na = (norms.filter(F.col("vec_id") < _N_QUERIES)
          .select(F.col("vec_id").alias("query_id"), F.col("nrm").alias("na")))
    nb = norms.select(F.col("vec_id").alias("match_id"),
                      F.col("nrm").alias("nb"))
    n_emb = table_rowcount(spark, sf_dir, "embeddings")
    cos = (dots.join(F.broadcast(na), "query_id")
           .join(gated_broadcast(nb, n_emb), "match_id")
           .select("query_id", "match_id",
                   F.round(F.col("dot") / (F.col("na") * F.col("nb")), 9)
                    .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("match_id"))
    return (cos.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= _TOP_K)
            .select("query_id", "match_id", "cosine", "rnk"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--no-base", action="store_true",
                    help="skip the sf0.1 corpus (scaled-only run)")
    ap.add_argument("--faces", default="",
                    help="comma-separated face subset (default: all)")
    args = ap.parse_args()

    import __spark_entry__ as e
    from multiagent_form_schema_etl_spark.session import get_spark

    spark = get_spark("ab_contested")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    corpora = [] if args.no_base else [("sf0.1", SF_DIR)]
    if args.mult:
        from tools import scale_probe
        corpora.append((f"x{args.mult}_linear",
                        scale_probe.build_dir(spark, args.mult, False)))

    faces = [
        ("x5_repetition_stats", repetition_old,
         qs["x5_repetition_stats"]),
        ("x5_decontaminate_ngram", decon_ngram_old,
         qs["x5_decontaminate_ngram"]),
        ("x1_dedup_jaccard_ngram", jaccard_old, jaccard_new),
        ("x2_cosine_topk", cosine_topk_old, qs["x2_cosine_topk"]),
    ]
    if args.faces:
        want = set(args.faces.split(","))
        faces = [f for f in faces if f[0] in want]

    def noop_time(df: DataFrame) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    for corpus, d in corpora:
        # warm parquet footers once per corpus
        load_table(spark, d, "documents").limit(1).collect()
        for face, old_fn, new_fn in faces:
            s0, t0 = _steal()
            times = {"old": [], "new": []}
            for i in range(args.n):
                for side, fn in (("old", old_fn), ("new", new_fn)):
                    spark.sparkContext.setJobDescription(
                        f"ab {face} {side} #{i} @{corpus}")
                    times[side].append(noop_time(fn(spark, d)))
            s1, t1 = _steal()
            med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
            print(json.dumps({
                "face": face, "corpus": corpus, "n": args.n,
                "old": times["old"], "new": times["new"],
                "old_min": min(times["old"]), "old_med": med(times["old"]),
                "new_min": min(times["new"]), "new_med": med(times["new"]),
                "steal_pct": round(100.0 * (s1 - s0) / max(1, t1 - t0), 2),
            }))


if __name__ == "__main__":
    main()
