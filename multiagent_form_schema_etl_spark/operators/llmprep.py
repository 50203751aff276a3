"""X5 -- training-data preparation operators over ``documents`` (the ops a
100 TB LLM-corpus pipeline runs after dedup/quality: deterministic corpus
splitting and context-window sequence packing).

Both are pure relational compositions (hash assignment, running-sum windows)
-- no UDFs, no driver loops -- so they scale as one pass over the corpus and
carry exact DuckDB oracles via the portable md5 hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register
from .dedup import _md5_int_sql

_SPLITS_SQL = """CASE WHEN bucket < 80 THEN 'train'
                      WHEN bucket < 90 THEN 'validation'
                      ELSE 'test' END"""


@register(
    "x5_train_test_split_hash",
    oracle=f"""
    WITH assigned AS (
      SELECT lang, n_chars,
             {_md5_int_sql('text', 'duck')} % 100 AS bucket
      FROM documents)
    SELECT lang, {_SPLITS_SQL} AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned
    GROUP BY lang, {_SPLITS_SQL}
    """,
)
def x5_train_test_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/validation/test corpus split by content
    hash: split membership is a pure function of the document text (stable
    under re-runs, re-partitioning, and corpus growth -- the property that
    matters for avoiding train/test leakage across pipeline versions). One
    narrow pass + a tiny per-(lang, split) rollup; the md5-derived bucket is
    portable so DuckDB computes the identical assignment."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_md5_int_sql("text", "spark")) % 100
    assigned = docs.select(
        "lang", "n_chars",
        F.when(bucket < 80, "train")
         .when(bucket < 90, "validation")
         .otherwise("test").alias("split"))
    return (assigned.groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


_PACK_BUDGET = 2048  # tokens per packed training sequence


@register(
    "x5_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(length(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_tokens
      FROM documents),
    packed AS (
      SELECT lang, doc_id, n_tokens,
             CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) AS BIGINT) // {_PACK_BUDGET} AS seq_id
      FROM toks)
    SELECT lang, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY lang, seq_id
    """,
)
def x5_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing for training: documents stream in doc_id
    order per language, and each lands in the context-window bin its running
    token offset falls into (offset DIV budget) -- the standard one-pass
    approximation of concat-and-chunk corpus packing. One running-sum window
    partitioned by lang + a per-(lang, seq) rollup; integer arithmetic
    end-to-end so both engines bin identically. At scale the window state is
    one counter per partition and documents never leave their lang
    partition."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
         .cast("long").alias("n_tokens"))
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = (toks.withColumn("running", F.sum("n_tokens").over(w))
              .withColumn("seq_id",
                          F.expr(f"CAST((running - n_tokens) DIV {_PACK_BUDGET}"
                                 " AS BIGINT)")))
    return (packed.groupBy("lang", "seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))
