"""Public document-pipeline API (the engine's user-facing surface).

A user of the reference runs: ingest a document → clause segmentation →
schema-guided field extraction → validation/recovery → form output →
evaluation (SURVEY.md §3.1). This facade runs the same lifecycle over ANY
blocks/doc-form/schema inputs -- fixtures are only a default used by the
oracle-checked queries.

Schemas are late-bound data: pass either fixture-style rows or a directory
of JSON schema files (sources.schemas). They compile into generated Column
expressions at plan-build time (driver-side, KBs), never interpreted per row.

Typical use::

    from multiagent_form_schema_etl_spark.pipeline import DocumentPipeline

    pipe = DocumentPipeline(spark, schema_rows)        # or .from_schema_dir
    out = pipe.run(blocks_df, doc_forms_df)            # dict of stage DFs
    out["forms"].write.parquet(...)                    # EAV form rows
    scores = pipe.score(out["forms"], ground_truth_df) # J1+A4
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import document as D


class DocumentPipeline:
    """The reference's ContractOrchestrator (orchestration/orchestrator.py:
    40-68) re-expressed as a lineage factory: each method returns a lazy
    DataFrame; ``run`` assembles the full stage dict (the engine analog of
    the per-phase snapshots, main.py:154-208)."""

    def __init__(self, spark: SparkSession, schema_rows: list[tuple]):
        self.spark = spark
        self.schema_rows = list(schema_rows)

    @classmethod
    def from_schema_dir(cls, spark: SparkSession, schema_dir: str) -> "DocumentPipeline":
        """Late-bind schemas from a JSON directory (S4)."""
        from .sources.schemas import load_schemas

        schemas = load_schemas(spark, schema_dir)
        n = schemas.count()
        if n > 10_000:
            # schemas are compiled into plan-time expressions; a mis-pointed
            # directory (e.g. a data lake path) would OOM the driver here
            raise ValueError(
                f"schema_dir {schema_dir!r} holds {n} field rows -- "
                "refusing to collect (is this really a schema directory?)")
        rows = [
            (r["form_name"], r["field_name"], r["ftype"], r["section"],
             bool(r["required"]), r["keywords"], r["patterns"], r["examples"],
             r["c_min"], r["c_max"], r["c_pattern"], r["c_enum"],
             r["default_value"])
            for r in load_schemas(spark, schema_dir).collect()
        ]
        return cls(spark, rows)

    # -- stages ------------------------------------------------------------

    def words(self, blocks: DataFrame) -> DataFrame:
        return D.words_df(self.spark, blocks)

    def clauses(self, blocks: DataFrame) -> DataFrame:
        return D.clauses_df(self.spark, blocks)

    def full_text(self, blocks: DataFrame, doc_forms: DataFrame) -> DataFrame:
        return D.fulltext_df(self.spark, blocks, doc_forms)

    def extract(self, blocks: DataFrame, doc_forms: DataFrame) -> DataFrame:
        return D.extraction_df(self.spark, blocks, doc_forms, self.schema_rows)

    def validate(self, blocks: DataFrame, doc_forms: DataFrame) -> DataFrame:
        return D.validated_df(self.spark, blocks, doc_forms, self.schema_rows)

    def recover(self, blocks: DataFrame, doc_forms: DataFrame) -> DataFrame:
        return D.recovered_df(self.spark, blocks, doc_forms, self.schema_rows)

    def score(self, forms: DataFrame, ground_truth: DataFrame) -> DataFrame:
        return D.score_predictions(
            forms.select("doc_id", "field_name", "value"), ground_truth)

    def metrics(self, scored: DataFrame) -> DataFrame:
        return D.metrics_of(scored)

    # -- assembled lifecycle ----------------------------------------------

    def run(self, blocks: DataFrame, doc_forms: DataFrame) -> dict[str, DataFrame]:
        """Full lifecycle; every value is a lazy DataFrame sharing one
        lineage (write any subset as stage snapshots via sources.sinks)."""
        validated = self.validate(blocks, doc_forms)
        forms = self.recover(blocks, doc_forms)
        completeness = forms.groupBy("doc_id", "form_name").agg(
            F.bool_and(F.when(F.col("required"), F.col("value").isNotNull())
                        .otherwise(F.lit(True))).alias("is_complete"),
            F.count("value").alias("n_filled"))
        return {
            "words": self.words(blocks),
            "clauses": self.clauses(blocks),
            "full_text": self.full_text(blocks, doc_forms),
            "extractions": self.extract(blocks, doc_forms),
            "validation_errors": validated.selectExpr(
                "doc_id", "form_name", "field_name",
                f"stack({len(D._VIOL_RULES)}, "
                + ", ".join(f"'{r}', v_{r}" for r in D._VIOL_RULES)
                + ") AS (rule, viol)").filter("viol").drop("viol"),
            "forms": forms,
            "completeness": completeness,
        }
