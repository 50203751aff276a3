"""Scalar-function layer queries (SURVEY.md §7 step 2; §2.8 F5-F9, §1.2 P7).

Each query exercises one scalar family over the shared literal fixture (or the
real ``events`` table for JSON) with a DuckDB oracle twin. All expressions are
built-in Column functions -- JVM-side, codegen-friendly, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..fixtures import SCALAR_COLS, SCALAR_ROWS, values_sql
from ..functions.scalars import (
    dec_avg,
    dec_sum,
    is_currency,
    is_email,
    nullify,
    parse_bool,
    parse_date_multi,
    parse_number,
)
from ..plans.registry import register

_SCALAR_SCHEMA = "id long, raw string"
_V = values_sql(SCALAR_ROWS, SCALAR_COLS)


def _scalar_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SCALAR_ROWS, _SCALAR_SCHEMA)


@register(
    "f5_date_parse_multi",
    oracle=f"""
    SELECT id,
           COALESCE(
             TRY_STRPTIME(TRIM(raw), '%Y-%m-%d'),
             TRY_STRPTIME(TRIM(raw), '%m/%d/%Y'),
             TRY_STRPTIME(TRIM(raw), '%B %d, %Y'),
             TRY_STRPTIME(TRIM(raw), '%d %B %Y')
           )::DATE AS parsed_date
    FROM {_V}
    """,
)
def f5_date_parse_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format date parse, first-format-wins (reference
    extraction/form_filler.py:147-163)."""
    return _scalar_df(spark).select(
        "id", parse_date_multi("raw").alias("parsed_date"))


@register(
    "f6_number_extract",
    oracle=f"""
    SELECT id,
           CAST(NULLIF(regexp_extract(raw, '(\\d+(?:\\.\\d+)?)', 1), '') AS DOUBLE) AS num
    FROM {_V}
    """,
)
def f6_number_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First numeric token as double (reference
    extraction/form_filler.py:165-171)."""
    return _scalar_df(spark).select("id", parse_number("raw").alias("num"))


@register(
    "f7_bool_null_normalize",
    oracle=f"""
    SELECT id,
           CASE WHEN lower(TRIM(raw)) IN ('true','yes','1','agree','agreed') THEN TRUE
                WHEN lower(TRIM(raw)) IN ('false','no','0','disagree') THEN FALSE
           END AS as_bool,
           CASE WHEN lower(TRIM(raw)) IN ('none','null','n/a','na','unknown','') THEN NULL
                ELSE raw END AS null_normalized
    FROM {_V}
    """,
)
def f7_bool_null_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truthy-word boolean parse (form_filler.py:173-174) + null-word
    normalization P7 (form_filler.py:142-143)."""
    return _scalar_df(spark).select(
        "id",
        parse_bool("raw").alias("as_bool"),
        nullify("raw").alias("null_normalized"),
    )


@register(
    "f8_email_currency_flags",
    oracle=f"""
    SELECT id,
           regexp_matches(raw, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}$') AS valid_email,
           regexp_matches(raw, '^[A-Z]{{3}}\\s+[\\d,]+(\\.\\d{{2}})?$') AS valid_currency
    FROM {_V}
    """,
)
def f8_email_currency_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-validity predicates P10 (utils/validation.py:82-94)."""
    return _scalar_df(spark).select(
        "id",
        is_email("raw").alias("valid_email"),
        is_currency("raw").alias("valid_currency"),
    )


@register(
    "f9_events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def f9_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column (F9;
    reference parses LLM JSON at extraction/extraction.py:130-146 -- same
    get-field-from-JSON-text semantics, here over a real table)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            dec_avg("value", "avg_value"),
        )
    )
