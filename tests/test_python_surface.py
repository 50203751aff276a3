"""UDTF / grouped-agg UDAF surface: each Python extension point must agree
with its declarative (JVM-side) production-path equivalent."""

from __future__ import annotations

from pyspark.sql import functions as F

from multiagent_form_schema_etl_spark.catalog import load_table
from multiagent_form_schema_etl_spark.operators import python_surface as ps
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_udtf_word_explode_equals_posexplode(spark):
    got = _rows(ps.f_udtf_word_explode(spark, SF_SMOKE))
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 20)
    want = _rows(docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split("text", " "), lambda w: w != ""))
        .alias("pos", "word")))
    assert got == want and len(got) > 0


def test_udaf_mad_equals_declarative_two_pass(spark):
    got = {r["l_returnflag"]: (r["median_price"], r["mad_price"], r["n_items"])
           for r in ps.a_udaf_median_mad(spark, SF_SMOKE).collect()}

    li = load_table(spark, SF_SMOKE, "lineitem")
    # lower median = exact percentile at the (n-1)//2 rank: use percentile
    # with discrete selection via sort + row_number.
    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = li.select("l_returnflag", "l_extendedprice",
                       F.row_number().over(w).alias("rn"),
                       F.count(F.lit(1)).over(
                           Window.partitionBy("l_returnflag")).alias("n"))
    med = (ranked.filter(F.col("rn") == F.floor((F.col("n") - 1) / 2) + 1)
           .select("l_returnflag", F.col("l_extendedprice").alias("med"),
                   "n"))
    dev = (li.join(med, "l_returnflag")
           .select("l_returnflag", "n", "med",
                   F.abs(F.col("l_extendedprice") - F.col("med")).alias("d")))
    w2 = Window.partitionBy("l_returnflag").orderBy("d")
    mad = (dev.select("l_returnflag", "med", "n", "d",
                      F.row_number().over(w2).alias("rn"))
           .filter(F.col("rn") == F.floor((F.col("n") - 1) / 2) + 1))
    want = {r["l_returnflag"]: (r["med"], r["d"], r["n"])
            for r in mad.collect()}
    assert got == want and len(got) == 3


def test_pydatasource_streaming_face_matches_batch(spark, tmp_path):
    """The Python DataSource's streaming face (Spark 4
    SimpleDataSourceStreamReader) must deliver EXACTLY the batch reader's
    rows across multiple micro-batches: 24 docs at 8 docs/chunk => >= 3
    non-empty batches, offset-tracked through a checkpoint."""
    import time

    from multiagent_form_schema_etl_spark.sources import pydatasource as pds

    want = sorted(map(tuple, pds.formdocs(spark, n_docs=24).collect()))
    stream = pds.formdocs_stream(spark, n_docs=24, chunk=8)
    q = (stream.writeStream.format("memory").queryName("fd_stream")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) n FROM fd_stream").collect()[0]["n"]
            if n >= len(want):
                break
            time.sleep(1)
        progressed = [p for p in q.recentProgress
                      if p["numInputRows"] > 0]
    finally:
        q.stop()
    got = sorted(map(tuple,
                     spark.sql("SELECT * FROM fd_stream").collect()))
    assert got == want
    assert len(progressed) >= 3  # the chunked offsets forced real batches
