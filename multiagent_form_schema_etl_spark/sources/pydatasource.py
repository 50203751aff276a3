"""Custom Python DataSource (Spark 4 DataSource API) — the modern face of
the reference's document ingestion (S1, `ingestion/ingestion.py:30-86`
walks a PDF and yields block records one document at a time).

``formdocs`` is a *partitioned, filter-pruning, Arrow-batched* source that
synthesizes an n-document corpus by cycling the four fixture documents
(`fixtures.BLOCK_ROWS` — the same literals every doc_* oracle is built
from). It demonstrates the three things a production source must get right
at 100 TB, all driver-side-cheap:

- **Partition planning**: ``partitions()`` splits the doc-id domain into
  contiguous ranges — each executor task generates (or in a real source,
  reads) only its slice; nothing is materialized on the driver.
- **Filter pushdown / partition pruning**: ``pushFilters`` intercepts
  doc_id range predicates, narrows the planned ranges, and returns every
  filter back to Spark (the source only PRUNES; Spark still evaluates the
  residual predicate, so pushdown can never change semantics).
- **Arrow batches**: ``read()`` yields one pyarrow RecordBatch per
  partition instead of Python tuples — columnar transfer, no per-row
  pickling.

The registered query aggregates through the source so the DuckDB oracle
can replay the generation rule in SQL (range × fixture VALUES join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    SimpleDataSourceStreamReader,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from .. import fixtures
from ..plans.registry import register

_N_FIXTURE_DOCS = 4

_SCHEMA = ("doc_id bigint, page int, block_idx int, text string, "
           "label string, confidence double, source string, "
           "x0 double, y0 double, x1 double, y1 double")


class _DocRange(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class FormDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 200))
        self.n_parts = int(options.get("partitions", 8))
        # Planned doc_id domain [lo, hi); pushFilters narrows it.
        self.lo, self.hi = 0, self.n_docs

    def pushFilters(self, filters):
        """Narrow the planned range with doc_id bounds; hand EVERY filter
        back to Spark (prune-only pushdown is always sound)."""
        for f in filters:
            if getattr(f, "attribute", None) == ("doc_id",):
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                elif isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
            yield f

    def partitions(self):
        """Contiguous doc-id ranges over the (possibly pruned) domain."""
        step = max(1, (self.n_docs + self.n_parts - 1) // self.n_parts)
        parts = []
        for lo in range(0, self.n_docs, step):
            hi = min(lo + step, self.n_docs)
            # Skip ranges the pushed-down bounds exclude entirely.
            if hi > self.lo and lo < self.hi:
                parts.append(_DocRange(lo, hi))
        return parts or [_DocRange(0, 0)]

    def read(self, part: _DocRange):
        import pyarrow as pa

        cols = {c: [] for c in ("doc_id", "page", "block_idx", "text",
                                "label", "confidence", "source",
                                "x0", "y0", "x1", "y1")}
        for d in range(part.lo, part.hi):
            fixture_doc = d % _N_FIXTURE_DOCS + 1
            for row in fixtures.BLOCK_ROWS:
                if row[0] != fixture_doc:
                    continue
                vals = (d,) + row[1:]
                for c, v in zip(cols, vals):
                    cols[c].append(v)
        yield pa.record_batch(
            [pa.array(cols["doc_id"], pa.int64()),
             pa.array(cols["page"], pa.int32()),
             pa.array(cols["block_idx"], pa.int32()),
             pa.array(cols["text"], pa.string()),
             pa.array(cols["label"], pa.string()),
             pa.array(cols["confidence"], pa.float64()),
             pa.array(cols["source"], pa.string()),
             pa.array(cols["x0"], pa.float64()),
             pa.array(cols["y0"], pa.float64()),
             pa.array(cols["x1"], pa.float64()),
             pa.array(cols["y1"], pa.float64())],
            names=list(cols))


class FormDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming face of the same source (Spark 4 Python
    streaming DataSource API): documents arrive in doc_id order, ``chunk``
    docs per micro-batch, offsets tracked as {"pos": next_doc_id} so a
    restarted query resumes (and replays uncommitted batches) exactly --
    readBetweenOffsets regenerates any [start, end) deterministically.

    This is the SIMPLE reader variant: rows materialize driver-side per
    batch, the right shape for low-volume control/metadata streams (and
    for demonstrating offset semantics). A high-volume production source
    implements DataSourceStreamReader with executor-side partitions
    instead -- the batch reader above shows that partition planning."""

    def __init__(self, options):
        self.cap = int(options.get("n_docs", 200))
        self.chunk = int(options.get("chunk", 8))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, lo: int, hi: int) -> list:
        # a LIST, not a generator: the simple-reader prefetch cache
        # copies/pickles the returned rows for replay
        return [(d,) + row[1:]
                for d in range(lo, hi)
                for row in fixtures.BLOCK_ROWS
                if row[0] == d % _N_FIXTURE_DOCS + 1]

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.chunk, self.cap)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["pos"], end["pos"])


class FormDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "formdocs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> FormDocsReader:
        return FormDocsReader(self.options)

    def simpleStreamReader(self, schema) -> FormDocsStreamReader:
        return FormDocsStreamReader(self.options)


def register_formdocs(spark: SparkSession) -> None:
    # Runtime-settable; required for a reader implementing pushFilters.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FormDocsDataSource)


def formdocs(spark: SparkSession, n_docs: int = 200,
             partitions: int = 8) -> DataFrame:
    register_formdocs(spark)
    return (spark.read.format("formdocs")
            .option("n_docs", n_docs).option("partitions", partitions)
            .load())


def formdocs_stream(spark: SparkSession, n_docs: int = 24,
                    chunk: int = 8) -> DataFrame:
    """The streaming face: same rows as formdocs(n_docs), arriving
    ``chunk`` docs per micro-batch with exact offset tracking."""
    register_formdocs(spark)
    return (spark.readStream.format("formdocs")
            .option("n_docs", n_docs).option("chunk", chunk).load())


@register(
    "s_pydatasource_formdocs",
    oracle=f"""
    SELECT (d.i % {_N_FIXTURE_DOCS}) + 1 AS fixture_doc, t.label,
           COUNT(*) AS n_blocks,
           CAST(SUM(length(t.text)) AS BIGINT) AS text_chars
    FROM range(40, 200) d(i)
    JOIN {fixtures.values_sql(fixtures.BLOCK_ROWS, fixtures.BLOCK_COLS)}
      ON t.doc_id = (d.i % {_N_FIXTURE_DOCS}) + 1
    GROUP BY 1, 2
    """,
)
def s_pydatasource_formdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the Python DataSource with a doc_id range predicate (pushed
    down: partitions covering doc_id < 40 are never planned) and roll up
    blocks per (fixture document, label). The oracle replays the generation
    rule relationally: range(40,200) × fixture VALUES."""
    df = formdocs(spark).filter(F.col("doc_id") >= 40)
    return (df.groupBy((F.col("doc_id") % _N_FIXTURE_DOCS + 1)
                       .cast("long").alias("fixture_doc"), "label")
            .agg(F.count(F.lit(1)).alias("n_blocks"),
                 F.sum(F.length("text")).alias("text_chars")))
