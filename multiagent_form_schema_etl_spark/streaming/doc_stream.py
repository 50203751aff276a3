"""The document pipeline as a stream (SURVEY core meets §2.9).

The reference processes documents one at a time through its LangGraph DAG
(orchestration/orchestrator.py:40-68); the engine's streaming face does the
same thing incrementally at scale: block files LAND (one parquet file per
ingested document -- the per-file atomicity every landing zone gives you),
each microbatch runs the full extraction lifecycle on exactly the complete
documents it received, and the final form rows append through an
exactly-once foreachBatch sink (checkpointed batch ids make replays
idempotent).

This is stateless-per-document streaming: because a document's blocks
arrive atomically in one file, no cross-batch state is needed -- the whole
batch-mode lineage (words → clauses → cascade → validate → recover) reuses
unchanged inside the sink. Contrast with the stateful operators in
streaming.stateful, which genuinely accumulate across batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORM_COLS = ("doc_id", "form_name", "field_name", "value")


def stream_document_forms(spark: SparkSession, blocks_dir: str, out_dir: str,
                          schema_rows: list[tuple], doc_forms: DataFrame,
                          files_per_trigger: int = 1,
                          blocks_schema=None) -> str:
    """Drain the blocks landing directory through the full pipeline;
    returns the appended-forms output path. Uses availableNow so tests and
    backfills terminate; a live deployment drops that trigger and keeps
    running.

    Exactly-once: each microbatch lands in its own ``batch=<id>`` partition
    directory with overwrite mode, so a batch replayed after a crash (the
    checkpoint not yet recording it) rewrites the same directory instead of
    appending duplicates. Readers see the partition column via discovery
    and drop it.

    ``blocks_schema``: pass the statically known blocks schema to start the
    stream against an empty/not-yet-created landing directory; omitted, it
    is probed from existing files (backfill convenience only)."""
    from ..pipeline import DocumentPipeline

    pipe = DocumentPipeline(spark, schema_rows)
    if blocks_schema is None:
        blocks_schema = spark.read.parquet(blocks_dir).schema
    stream = (spark.readStream.schema(blocks_schema)
              .option("maxFilesPerTrigger", files_per_trigger)
              .parquet(blocks_dir))
    forms_path = os.path.join(out_dir, "forms")
    doc_forms = doc_forms.localCheckpoint()  # stable tiny dim across batches

    def sink(batch_blocks: DataFrame, batch_id: int) -> None:
        if batch_blocks.isEmpty():
            return
        batch_docs = batch_blocks.select("doc_id").distinct()
        batch_forms = doc_forms.join(F.broadcast(batch_docs), "doc_id")
        out = pipe.recover(batch_blocks, batch_forms).select(*_FORM_COLS)
        out.write.mode("overwrite").parquet(
            os.path.join(forms_path, f"batch={batch_id}"))

    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return forms_path
