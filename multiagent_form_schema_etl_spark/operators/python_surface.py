"""Python-native extension surface (SURVEY.md §2.10): the UDTF and UDAF
faces of the engine's UDF triad, oracle-backed.

The reference's only UDTF-shaped op is E1's word explode
(`layout_analysis/layout_structure.py:138-151` iterates words off each
block); its cascades U7/U8 are the UDAF-shaped ops. The engine's production
paths for both are declarative (posexplode / conditional aggregation —
JVM-side, whole-stage-codegen'd). This module exercises the *extension
points* a user reaches for when semantics genuinely can't be declared:

- ``f_udtf_word_explode`` — a real ``@udtf`` (Arrow-optimized) emitting
  (pos, word) rows, consumed through a SQL LATERAL join. Slow path by
  design: per-row Python generator. The docstring contract is "use
  posexplode unless you need imperative row logic"; the query exists so the
  surface is tested and gate-checked, and its oracle is the same
  parallel-unnest zip the E1 oracle uses.
- ``a_udaf_median_mad`` — grouped-agg ``pandas_udf`` UDAFs computing the
  discrete (lower) median and the median absolute deviation per group.
  MAD is a two-pass-over-the-group statistic with no Spark built-in;
  the grouped-agg UDAF receives the whole group as one Arrow batch, which
  is exactly the shape MAD needs. Engine parity is exact BY CONSTRUCTION:
  the lower median is pure element selection (``sorted[(n-1)//2]``, no
  interpolation arithmetic), matching DuckDB's ``quantile_disc(x, 0.5)``
  element-for-element, and |x - med| is an exact IEEE operation.

Scale notes: a grouped-agg pandas UDAF shuffles each group to one task and
materializes it as a pandas Series — fine for bounded per-group cardinality
(here: lineitem grouped by return flag at ~1/4 of the table per group is
the local-mode worst case; on a cluster you'd group by a higher-cardinality
key or pre-aggregate). The UDTF fans out rows 1→N through Arrow batches;
prefer posexplode (zero Python) whenever the emitted rows are a pure
function of array columns.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..catalog import load_table
from ..plans.registry import register


class SplitWords:
    """E1's word iteration as a table function: one (pos, word) row per
    non-empty whitespace-delimited token (reference
    layout_structure.py:138-151, which enumerates block.text.split()).
    Wrapped with ``udtf(..., useArrow=True)`` lazily inside the query --
    Arrow-optimized UDTF creation needs an active session."""

    def eval(self, text: str):
        if text is None:
            return
        pos = 0
        for w in text.split(" "):
            if w:
                yield (pos, w)
                pos += 1


@register(
    "f_udtf_word_explode",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word,
             unnest(range(len(list_filter(string_split(text, ' '),
                                          w -> w <> '')))) AS pos
      FROM documents WHERE doc_id < 20)
    SELECT doc_id, CAST(pos AS INTEGER) AS pos, word FROM toks
    """,
)
def f_udtf_word_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF through a SQL LATERAL join. Production path for this
    exact result is ``posexplode(filter(split(text,' '), w -> w != ''))`` —
    JVM-side, no Python; the UDTF covers the imperative-generator surface."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("split_words", udtf(
        SplitWords, returnType="pos int, word string", useArrow=True))
    return spark.sql("""
        SELECT d.doc_id, w.pos, w.word
        FROM udtf_docs d, LATERAL split_words(d.text) w
    """)


def _lower_median(s: pd.Series) -> float | None:
    """Lower (discrete) median: element at index (n-1)//2 of the sorted
    series — no interpolation, so cross-engine exact."""
    s = s.dropna().sort_values().reset_index(drop=True)
    if len(s) == 0:
        return None
    return float(s.iloc[(len(s) - 1) // 2])


def robust_udafs():
    """Grouped-agg pandas UDAFs (created lazily: pandas_udf parses its DDL
    return type against the active session)."""

    @pandas_udf("double")
    def median_disc(v: pd.Series) -> float:
        return _lower_median(v)

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    @pandas_udf("double")
    def mad_disc(v: pd.Series) -> float:
        """Median absolute deviation about the lower median, itself as a
        lower median. Two passes over the group — the UDAF shape."""
        med = _lower_median(v)
        if med is None:
            return None
        return _lower_median((v.dropna() - med).abs())

    return median_disc, mad_disc, n_rows


@register(
    "a_udaf_median_mad",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) AS median_price
      FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag, ANY_VALUE(m.median_price) AS median_price,
           quantile_disc(abs(l.l_extendedprice - m.median_price), 0.5) AS mad_price,
           COUNT(*) AS n_items
    FROM lineitem l JOIN m USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def a_udaf_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per return flag via grouped-agg pandas UDAFs:
    discrete median and MAD of extended price (the robust outlier scale a
    corpus-quality pipeline uses where stddev is skew-fragile)."""
    li = load_table(spark, sf_dir, "lineitem")
    median_disc, mad_disc, n_rows = robust_udafs()
    return (li.groupBy("l_returnflag")
            .agg(median_disc("l_extendedprice").alias("median_price"),
                 mad_disc("l_extendedprice").alias("mad_price"),
                 n_rows("l_extendedprice").alias("n_items"))
            .select("l_returnflag", "median_price", "mad_price", "n_items"))
