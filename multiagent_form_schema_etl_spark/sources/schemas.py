"""Schema registry as JSON sources/sinks (SURVEY.md §2.1 S4/K3; reference
schema/schema.py:21-63,206-230).

Schemas are data: JSON files in a directory, loaded late-bound into the
long/EAV ``form_fields`` shape (FIXTURES.md A3) that every pipeline join
broadcasts. ``spark.read.json`` (multiLine) keeps the scan distributed and
schema-on-read; writing uses a single-partition JSON sink per form (schemas
are KBs -- coalesce(1) is correct here, never for data tables).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIELD_META_SCHEMA = (
    "form_name string, field_name string, ftype string, section string, "
    "required boolean, keywords array<string>, patterns array<string>, "
    "examples array<string>, c_min double, c_max double, c_pattern string, "
    "c_enum array<string>, default_value string"
)


def schema_rows_to_json(rows: list[tuple], form_name: str) -> dict:
    """Render fixture-style field rows into the reference's nested JSON
    schema shape (schema/schema.py:67-77)."""
    fields = {}
    for r in rows:
        if r[0] != form_name:
            continue
        constraints = {}
        for key, val in (("min", r[8]), ("max", r[9]), ("pattern", r[10]),
                         ("enum", r[11])):
            if val is not None:
                constraints[key] = val
        meta = {"type": r[2], "section": r[3], "required": r[4]}
        for key, val in (("keywords", r[5]), ("patterns", r[6]),
                         ("examples", r[7]), ("default", r[12])):
            if val is not None:
                meta[key] = val
        if constraints:
            meta["constraints"] = constraints
        fields[r[1]] = meta
    return {"form_name": form_name, "version": "1.0", "fields": fields}


def save_schema(schema: dict, schema_dir: str) -> str:
    """K3: persist one schema JSON (schema/schema.py:45-63)."""
    os.makedirs(schema_dir, exist_ok=True)
    path = os.path.join(schema_dir, f"{schema['form_name']}.json")
    with open(path, "w") as f:
        json.dump(schema, f, indent=2)
    return path


def load_schemas(spark: SparkSession, schema_dir: str) -> DataFrame:
    """S4: glob-load every schema JSON into the long/EAV form_fields shape.
    spark.read.json(multiLine) handles the nested dict; the dynamic
    ``fields`` map explodes into one row per field."""
    raw = spark.read.option("multiLine", "true").json(
        os.path.join(schema_dir, "*.json"))
    # `fields` is a struct of per-field structs whose inferred sub-schemas
    # differ per field (schema-on-read) -- introspect the inferred schema so
    # absent keys become typed NULLs instead of analysis errors.
    fields_type = raw.schema["fields"].dataType
    parts = []
    for sub in fields_type.fields:
        fn = sub.name
        present = {x.name for x in sub.dataType.fields}
        c_present: set[str] = set()
        if "constraints" in present:
            c_present = {x.name
                         for x in sub.dataType["constraints"].dataType.fields}
        f = F.col(f"fields.{fn}")

        def opt(key: str, typ: str) -> F.Column:
            if key.startswith("constraints."):
                sub_key = key.split(".", 1)[1]
                if sub_key not in c_present:
                    return F.lit(None).cast(typ)
                return f.getField("constraints").getField(sub_key).cast(typ)
            if key not in present:
                return F.lit(None).cast(typ)
            return f.getField(key).cast(typ)

        parts.append(raw.filter(f.isNotNull()).select(
            "form_name",
            F.lit(fn).alias("field_name"),
            opt("type", "string").alias("ftype"),
            opt("section", "string").alias("section"),
            opt("required", "boolean").alias("required"),
            opt("keywords", "array<string>").alias("keywords"),
            opt("patterns", "array<string>").alias("patterns"),
            opt("examples", "array<string>").alias("examples"),
            opt("constraints.min", "double").alias("c_min"),
            opt("constraints.max", "double").alias("c_max"),
            opt("constraints.pattern", "string").alias("c_pattern"),
            opt("constraints.enum", "array<string>").alias("c_enum"),
            opt("default", "string").alias("default_value"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def load_test_cases(spark: SparkSession, test_dir: str) -> DataFrame:
    """S5: glob-load golden test cases {pdf_path, ground_truth, schema}
    (evaluation/evaluator.py:138-153) into a (doc, field, true_value) long
    table."""
    raw = spark.read.option("multiLine", "true").json(
        os.path.join(test_dir, "*.json"))
    fields = raw.select("ground_truth.*").columns
    parts = [raw.select(
        F.col("doc_id"),
        F.lit(fn).alias("field_name"),
        F.col(f"ground_truth.{fn}").cast("string").alias("true_value"))
        for fn in fields]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
