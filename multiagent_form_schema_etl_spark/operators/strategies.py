"""Model/external-call strategy scaffolding (SURVEY.md §2.10 U1-U6, §7
step 8).

Every nondeterministic or environment-dependent stage of the reference
(LayoutLMv3 token classification U1, TinyLlama field decode U2, Gemini/Llama
vision U3-U5, tesseract OCR U6) sits behind a Strategy whose DEFAULT is
deterministic, so the oracle-checked path never touches a model or the
network (SURVEY §7: "everything deterministic is pure DataFrame/SQL").

The Spark execution shape is what matters here and is fully real:
- Arrow-batched ``mapInPandas`` with per-executor lazy init (the reference's
  model-singleton pattern, orchestration/orchestrator.py:230-238, maps to
  one model load per Python worker);
- batch-size control via ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- nondeterministic UDFs must be marked so Catalyst won't re-execute or
  reorder them past filters (§4 note).

Model weights / API clients are NOT available in this container, so the
model calls themselves are stubbed with deterministic rule-based stand-ins
(clearly marked); swapping in a real model is a one-function change.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sqlgen import SECNUM_PATTERNS

# ---------------------------------------------------------------------------
# U1 -- token layout classification
# ---------------------------------------------------------------------------

# LABEL_MAP, layout_analysis/layout_structure.py:14-21
LABEL_MAP = {0: "paragraph", 1: "heading", 2: "list_item",
             3: "table", 4: "caption", 5: "other"}

_SECNUM_RES = [re.compile(p, re.IGNORECASE) for p in SECNUM_PATTERNS]


def rule_based_token_labels(words: pd.Series) -> pd.Series:
    """Deterministic stand-in for LayoutLMv3 inference (U1): section-number
    words label as heading, everything else paragraph. This is the
    correctness-path default; a real model plugs into
    ``layout_classify_batch`` below unchanged."""
    return words.map(
        lambda w: "heading" if any(r.match(w) for r in _SECNUM_RES)
        else "paragraph")


_MODEL_CACHE: dict[str, object] = {}


def _get_layout_model():
    """Per-executor lazy model init (one load per Python worker -- the
    distributed analog of the reference's singleton, orchestrator.py:230-238).
    STUB: returns the rule-based classifier; a real deployment would load
    LayoutLMv3 weights here."""
    if "layout" not in _MODEL_CACHE:
        _MODEL_CACHE["layout"] = rule_based_token_labels
    return _MODEL_CACHE["layout"]


def layout_classify_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, pos, word, bbox_norm...) -> +label.
    Truncation to the model's 512-token budget happens per doc upstream
    (layout_structure.py:102-104 analog)."""
    model = _get_layout_model()
    for pdf in batches:
        out = pdf.copy()
        out["label"] = model(pdf["word"])
        yield out


def classify_words(words: DataFrame) -> DataFrame:
    """U1 entry: attach layout labels to a word table via Arrow-batched
    inference. Narrow transform -- partitioning is preserved."""
    schema = words.schema.simpleString().replace("struct<", "").rstrip(">") \
        + ",label string"
    return words.mapInPandas(layout_classify_batch, schema)


# ---------------------------------------------------------------------------
# U2 -- per-field LLM micro-decode (deterministic default: decline)
# ---------------------------------------------------------------------------

ExtractorFn = Callable[[str, str, str], str | None]


def null_llm_extractor(field_name: str, field_type: str, context: str) -> None:
    """Deterministic default for the cascade's LLM slot (U2,
    extraction/extraction.py:26-68): always None, so regex/keyword results
    are never overridden and the correctness path stays model-free."""
    return None


def make_llm_extract_udf(extractor: ExtractorFn = null_llm_extractor):
    """Build the pandas_udf for the LLM slot. Marked nondeterministic so
    Catalyst will not duplicate or reorder it past filters (§4). Context is
    truncated to the reference's 1000-char budget
    (extraction/extraction.py:102)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def llm_extract(field_name: pd.Series, field_type: pd.Series,
                    context: pd.Series) -> pd.Series:
        return pd.Series([
            extractor(fn, ft, (cx or "")[:1000])
            for fn, ft, cx in zip(field_name, field_type, context)
        ], dtype="object")

    return llm_extract.asNondeterministic()


# ---------------------------------------------------------------------------
# U6 -- OCR fallback
# ---------------------------------------------------------------------------

def ocr_page(image_bytes: bytes) -> str:
    """STUB -- tesseract is not in this container
    (ingestion/ingestion.py:113-140 shells out to it). Raises by contract."""
    raise NotImplementedError(
        "OCR requires tesseract; not available in this environment")


def fake_ocr_text(image_bytes: bytes) -> str:
    """Deterministic OCR stand-in: derives a marker string from payload
    size, letting the OCR *routing* (A1/S2) be exercised end-to-end."""
    return f"[ocr {len(image_bytes)} bytes]"


def ocr_pages_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel for the OCR branch: (doc_id, page, image) -> text
    with confidence 0.8 / source 'ocr' (ingestion/ingestion.py:133-134)."""
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "page": pdf["page"],
            "text": [fake_ocr_text(b) for b in pdf["image"]],
            "confidence": 0.8,
            "source": "ocr",
        })


def ocr_low_text_pages(blocks: DataFrame, page_images: DataFrame,
                       threshold: int = 50) -> DataFrame:
    """S2: pages whose text volume is under threshold get routed through the
    OCR kernel (conditional source branch). ``page_images`` carries
    (doc_id, page, image BINARY)."""
    volumes = (blocks.groupBy("doc_id", "page")
               .agg(F.sum(F.length("text")).alias("vol")))
    sparse = volumes.filter(F.col("vol") < threshold).select("doc_id", "page")
    need = page_images.join(sparse, ["doc_id", "page"], "left_semi")
    return need.mapInPandas(
        ocr_pages_batch,
        "doc_id long, page int, text string, confidence double, source string")
