"""Scalar expression library (SURVEY.md §2.8).

All pure Column expressions -- JVM-side, whole-stage-codegen friendly; no
Python UDFs on these paths.

Oracle-determinism note: floating-point SUM/AVG are order-dependent, and Spark
and DuckDB will both aggregate in arbitrary partition order. ``dec_sum`` /
``dec_avg`` therefore route the accumulation through DECIMAL (exact, order
independent) and cast the final value back to DOUBLE, so the same query text
in both engines is bit-identical. At scale this costs nothing material:
decimal sums still combine map-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Null-word normalization (reference: extraction/form_filler.py:142-143,
# extraction/gemini_extractor.py:131-137, extraction/llama_extractor.py:145-151).
NULL_WORDS = ("none", "null", "n/a", "na", "unknown", "")

_DEC = "decimal(28,6)"


def dec_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM over a double column: exact decimal accumulation,
    double result. Oracle SQL twin:
    ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def dec_avg(col: Column | str, alias: str | None = None) -> Column:
    """AVG as exact-sum / count so both engines do one identical double
    division. Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(x)``."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def nullify(col: Column | str) -> Column:
    """Map the reference's null-words to NULL (SURVEY §1.2 / P7)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.lower(F.trim(c)).isin(*NULL_WORDS), F.lit(None)).otherwise(c)


# The reference accepts 4 date shapes (extraction/form_filler.py:147-163):
# ISO, MM/DD/YYYY, "Month D[,] YYYY", "D Month YYYY" -- re.search'd as a
# SUBSTRING anywhere in the value (e.g. "Effective 2021-03-05" parses), with
# IGNORECASE month names and an optional comma.
_MONTHS = ("(?:January|February|March|April|May|June|July|August|September"
           "|October|November|December)")
_DATE_TOKEN_PATTERNS: tuple[tuple[str, tuple[str, ...]], ...] = (
    (r"(\d{4}-\d{1,2}-\d{1,2})", ("yyyy-M-d",)),
    (r"(\d{1,2}/\d{1,2}/\d{4})", ("M/d/yyyy",)),
    (rf"({_MONTHS}\s+\d{{1,2}},?\s+\d{{4}})", ("MMMM d, yyyy", "MMMM d yyyy")),
    (rf"(\d{{1,2}}\s+{_MONTHS}\s+\d{{4}})", ("d MMMM yyyy",)),
)


def parse_date_multi(col: Column | str) -> Column:
    """First pattern whose extracted token parses wins (F5); NULL if none.
    The token is regexp-extracted first (reference re.search semantics --
    the date may sit anywhere in the value), then initcap-normalized so
    case-variant month names parse like the reference's IGNORECASE (the
    DuckDB twin needs no initcap: its strptime %B is case-insensitive)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    branches = []
    for pat, fmts in _DATE_TOKEN_PATTERNS:
        tok = F.regexp_extract(c, "(?i)" + pat, 1)
        tok = F.when(tok == "", F.lit(None)).otherwise(F.initcap(tok))
        branches.append(
            F.coalesce(*[F.try_to_timestamp(tok, F.lit(f)) for f in fmts]))
    return F.coalesce(*branches).cast("date")


def parse_number(col: Column | str) -> Column:
    """First numeric token in the text, as double (F6;
    extraction/form_filler.py:165-171). NULL when no numeric token."""
    c = F.col(col) if isinstance(col, str) else col
    tok = F.regexp_extract(c, r"(\d+(?:\.\d+)?)", 1)
    return F.when(tok == "", F.lit(None)).otherwise(tok).cast("double")


# Truthy strings per extraction/form_filler.py:173-174.
_TRUTHY = ("true", "yes", "1", "agree", "agreed")
_FALSY = ("false", "no", "0", "disagree")


def parse_bool(col: Column | str) -> Column:
    """Reference boolean semantics: explicit truthy/falsy word lists, NULL
    otherwise (stricter than Spark's permissive cast)."""
    c = F.col(col) if isinstance(col, str) else col
    lc = F.lower(F.trim(c))
    return (F.when(lc.isin(*_TRUTHY), F.lit(True))
             .when(lc.isin(*_FALSY), F.lit(False)))


# Validation regexes (utils/validation.py:82-94).
EMAIL_RE = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"
CURRENCY_RE = r"^[A-Z]{3}\s+[\d,]+(\.\d{2})?$"


def is_email(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(EMAIL_RE)


def is_currency(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(CURRENCY_RE)
