"""Corrupt-record-tolerant ingest (production landing-zone pattern).

The reference aborts on unreadable inputs (ingestion/ingestion.py raises
through main.py); a 100 TB landing zone cannot -- one malformed record in a
billion must not kill the job, and silently dropping it is worse. The Spark
pattern: PERMISSIVE read with a named corrupt-record column, split the
relation into (valid, quarantine), process the former, persist the latter
for triage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def read_json_with_quarantine(spark: SparkSession, path: str,
                              schema: StructType
                              ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """PERMISSIVE JSON read split into (valid, quarantined, raw) DataFrames.

    The declared schema gets the corrupt-record column appended (on a COPY
    -- StructType.add mutates in place, and the caller's schema must stay
    reusable); malformed lines land there verbatim with every data column
    NULL. The relation is cached before splitting: Spark refuses a query
    whose only referenced columns are the internal corrupt column (it would
    have nothing to parse), and caching also guarantees the two branches
    see one consistent read at one cost. The third return value is the
    cached relation itself -- call ``raw.unpersist()`` once both branches
    are consumed, or the cache pins the whole landing read for the session."""
    full = StructType(list(schema.fields)
                      + [StructField(_CORRUPT, StringType())])
    df = (spark.read.schema(full)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", _CORRUPT)
          .json(path)
          # file provenance must be captured BEFORE the cache boundary --
          # input_file_name() is scan-scoped and reads as '' afterwards
          .withColumn("_source_file", F.input_file_name())
          .cache())
    valid = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT, "_source_file")
    quarantined = (df.filter(F.col(_CORRUPT).isNotNull())
                   .select(F.col(_CORRUPT).alias("raw_record"),
                           F.col("_source_file").alias("source_file")))
    return valid, quarantined, df


def read_parquet_evolving(spark: SparkSession, path: str,
                          target: StructType | None = None) -> DataFrame:
    """Schema-evolution-tolerant parquet read: a long-lived stage directory
    accumulates files written under DIFFERENT schema versions (columns
    added over time, widened types dropped off old writers). A plain read
    takes one random footer's schema and silently DROPS newer columns from
    older-file rows' perspective -- or errors.

    ``mergeSchema`` unions every footer's schema (missing columns
    null-backfill per file, the parquet-native evolution contract).
    With ``target`` the result is additionally conformed to a declared
    contract schema: expected-but-absent columns materialize as typed
    NULLs, unexpected columns are dropped, and each column is cast to the
    target type -- so downstream plans compile against a stable schema no
    matter which vintage of files the directory holds. Per-file pruning
    and pushdown survive: the merge is metadata-level, not a rewrite."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if target is None:
        return df
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
