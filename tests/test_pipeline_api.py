"""The public DocumentPipeline facade must (a) reproduce the fixture-bound
query results and (b) work on entirely new inputs + JSON-loaded schemas --
proving the engine is not fixture-hardwired."""

from __future__ import annotations

import tempfile

from multiagent_form_schema_etl_spark.fixtures import SCHEMA_ROWS
from multiagent_form_schema_etl_spark.operators import document as D
from multiagent_form_schema_etl_spark.pipeline import DocumentPipeline


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_pipeline_matches_fixture_queries(spark):
    pipe = DocumentPipeline(spark, SCHEMA_ROWS)
    blocks = D.blocks_df(spark)
    forms = D.doc_forms_df(spark)
    out = pipe.run(blocks, forms)
    assert _rows(out["extractions"]) == _rows(D.extraction_df(spark))
    assert _rows(out["forms"].select("doc_id", "field_name", "value")) == \
        _rows(D.recovered_df(spark).select("doc_id", "field_name", "value"))
    assert _rows(out["clauses"]) == _rows(D.clauses_df(spark))


def test_pipeline_on_fresh_input_with_json_schemas(spark):
    """New document, schema loaded from JSON on disk -- end to end."""
    from multiagent_form_schema_etl_spark.sources import schemas as sch

    with tempfile.TemporaryDirectory() as d:
        sch.save_schema(sch.schema_rows_to_json(SCHEMA_ROWS, "NDA_Form"), d)
        pipe = DocumentPipeline.from_schema_dir(spark, d)

    blocks = spark.createDataFrame(
        [
            (99, 0, 0, "1. Agreement", "paragraph", 1.0, "native"),
            (99, 0, 1,
             "This deal is effective on 2024-02-02 and the disclosing party "
             "means Zeta Ltd, while the receiving party means Eta GmbH, ok.",
             "paragraph", 1.0, "native"),
            (99, 0, 2,
             "It is governed by the laws of Bavaria, with a confidentiality "
             "period of 9 years in force.", "paragraph", 1.0, "native"),
        ],
        "doc_id long, page int, block_idx int, text string, label string, "
        "confidence double, source string")
    doc_forms = spark.createDataFrame([(99, "NDA_Form")],
                                      "doc_id long, form_name string")
    out = pipe.run(blocks, doc_forms)

    ext = {r["field_name"]: r["value"] for r in out["extractions"].collect()}
    assert ext["effective_date"] == "2024-02-02"
    assert ext["disclosing_party"] == "Zeta Ltd"
    assert ext["receiving_party"] == "Eta GmbH"
    assert ext["governing_law"] == "laws of Bavaria"
    assert ext["confidentiality_period"] == "9 years"

    clauses = {r["section_key"]: r["clause_text"] for r in out["clauses"].collect()}
    assert set(clauses) == {"1"}
    comp = out["completeness"].collect()[0]
    assert comp["is_complete"] is True

    gt = spark.createDataFrame(
        [(99, "effective_date", "2024-02-02"),
         (99, "governing_law", "Bavaria"),
         (99, "disclosing_party", "Zeta Ltd")],
        "doc_id long, field_name string, true_value string")
    m = pipe.metrics(pipe.score(out["forms"], gt)).collect()[0]
    assert m["recall"] == 1.0  # every truth field predicted
