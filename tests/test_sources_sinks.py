"""S4/S5/K1-K3 tests: schema JSON round-trip, stage sinks, strategies."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from multiagent_form_schema_etl_spark.fixtures import SCHEMA_ROWS
from multiagent_form_schema_etl_spark.sources import schemas as sch
from multiagent_form_schema_etl_spark.sources import sinks
from tests.conftest import SF_SMOKE


def test_schema_json_round_trip(spark):
    forms = sorted({r[0] for r in SCHEMA_ROWS})
    with tempfile.TemporaryDirectory() as d:
        for form in forms:
            sch.save_schema(sch.schema_rows_to_json(SCHEMA_ROWS, form), d)
        loaded = sch.load_schemas(spark, d)
        rows = {(r["form_name"], r["field_name"]): r for r in loaded.collect()}
        assert len(rows) == len(SCHEMA_ROWS)
        for r in SCHEMA_ROWS:
            got = rows[(r[0], r[1])]
            assert got["ftype"] == r[2]
            assert got["section"] == r[3]
            assert got["required"] == r[4]
            assert (got["keywords"] or None) == (r[5] or None)
            assert (got["patterns"] or None) == (r[6] or None)
            assert got["c_min"] == r[8]
            assert got["c_max"] == r[9]
            assert (got["c_enum"] or None) == (r[11] or None)
            assert got["default_value"] == r[12]


def test_stage_sink_round_trip(spark):
    from multiagent_form_schema_etl_spark.catalog import load_table

    nation = load_table(spark, SF_SMOKE, "nation")
    with tempfile.TemporaryDirectory() as d:
        sinks.write_stage(nation, d, "01_nation")
        back = sinks.read_stage(spark, d, "01_nation")
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))
        sinks.write_final_json(nation.groupBy().count(), d, "report")
        rep = spark.read.json(f"{d}/report")
        assert rep.collect()[0]["count"] == 25


def test_layout_optimized_sink_prunes(spark):
    """write_layout_optimized must produce range-disjoint, in-file-sorted
    parquet: every file's (min,max) on the range key is narrow and
    non-overlapping, so a point predicate prunes to one file -- unlike a
    hash-partitioned write of the same data, whose per-file stats span the
    whole key domain."""
    import glob

    import pyarrow.parquet as pq

    from multiagent_form_schema_etl_spark.catalog import load_table

    orders = load_table(spark, SF_SMOKE, "orders")

    def key_ranges(path):
        spans = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("o_orderkey")
            lo = min(md.row_group(g).column(idx).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max
                     for g in range(md.num_row_groups))
            spans.append((lo, hi))
        return spans

    with tempfile.TemporaryDirectory() as d:
        path = sinks.write_layout_optimized(orders, d, "orders_ranged",
                                            range_key="o_orderkey", n_files=4)
        spans = sorted(key_ranges(path))
        assert len(spans) == 4
        for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
            assert hi_prev < lo_next  # disjoint => min/max pruning works

        # contrast: hash-partitioned layout has full-domain stats per file
        hashed = orders.repartition(4, "o_orderkey")
        hashed.write.mode("overwrite").parquet(f"{d}/orders_hashed")
        hspans = key_ranges(f"{d}/orders_hashed")
        domain_lo = min(lo for lo, _ in hspans)
        domain_hi = max(hi for _, hi in hspans)
        assert all(hi - lo > (domain_hi - domain_lo) * 0.5 for lo, hi in hspans)

        # re-read correctness + in-file ordering
        back = spark.read.parquet(path)
        assert back.count() == orders.count()
        probe = back.filter(F.col("o_orderkey") == 1).collect()
        assert len(probe) == orders.filter(F.col("o_orderkey") == 1).count()
        one = pq.read_table(sorted(glob.glob(f"{path}/*.parquet"))[0],
                            columns=["o_orderkey"]).to_pandas()["o_orderkey"]
        assert one.is_monotonic_increasing


def test_zorder_sink_prunes_both_columns(spark):
    """write_zorder must buy min/max prunability on BOTH interleaved
    columns: for point probes on either key, only a minority of files'
    footer stats contain the probe -- while a single-key range layout of
    the same data prunes only its own key (the secondary column's stats
    span the full domain in ~every file)."""
    import glob

    import pyarrow.parquet as pq

    from multiagent_form_schema_etl_spark.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity")

    def file_spans(path, col):
        spans = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max
                     for g in range(md.num_row_groups))
            spans.append((lo, hi))
        return spans

    def hit_fraction(path, col, probes):
        spans = file_spans(path, col)
        fracs = [sum(1 for lo, hi in spans if lo <= p <= hi) / len(spans)
                 for p in probes]
        return sum(fracs) / len(fracs)

    probes = {c: [r[0] for r in (li.select(c).distinct()
                                 .orderBy(F.xxhash64(c)).limit(8).collect())]
              for c in ("l_orderkey", "l_partkey")}

    with tempfile.TemporaryDirectory() as d:
        zpath = sinks.write_zorder(li, d, "li_z",
                                   ["l_orderkey", "l_partkey"], n_files=16)
        assert len(glob.glob(f"{zpath}/*.parquet")) == 16
        # both interleaved keys prune: most files' stats exclude the probe
        z_ok = hit_fraction(zpath, "l_orderkey", probes["l_orderkey"])
        z_pk = hit_fraction(zpath, "l_partkey", probes["l_partkey"])
        assert z_ok <= 0.6, z_ok
        assert z_pk <= 0.6, z_pk

        # contrast: single-key range layout prunes only its own key
        rpath = sinks.write_layout_optimized(li, d, "li_r",
                                             range_key="l_orderkey",
                                             n_files=16)
        r_ok = hit_fraction(rpath, "l_orderkey", probes["l_orderkey"])
        r_pk = hit_fraction(rpath, "l_partkey", probes["l_partkey"])
        assert r_ok <= 0.2          # its own key: near-perfect pruning
        assert r_pk >= 0.9          # secondary key: full-domain stats
        # z-order beats range layout on the secondary key by a wide margin
        assert z_pk < r_pk / 1.5

        # re-read correctness: same rows, no transient key column
        back = spark.read.parquet(zpath)
        assert back.columns == ["l_orderkey", "l_partkey", "l_quantity"]
        assert back.count() == li.count()
        k = probes["l_partkey"][0]
        assert (back.filter(F.col("l_partkey") == k).count()
                == li.filter(F.col("l_partkey") == k).count())


def test_layout_classifier_strategy(spark):
    from multiagent_form_schema_etl_spark.operators.document import words_df
    from multiagent_form_schema_etl_spark.operators.strategies import classify_words

    w = words_df(spark).select("doc_id", "pos", "word")
    labeled = classify_words(w)
    got = {r["word"]: r["label"] for r in labeled.collect()}
    assert got["1."] == "heading"
    assert got["(3)"] == "heading"
    assert got["A."] == "heading"
    assert got["Parties"] == "paragraph"


def test_llm_strategy_default_is_null_and_nondeterministic_flagged(spark):
    from multiagent_form_schema_etl_spark.operators.strategies import make_llm_extract_udf

    udf = make_llm_extract_udf()
    df = spark.createDataFrame([("f", "string", "ctx")], "a string, b string, c string")
    out = df.select(udf("a", "b", "c").alias("v"))
    assert out.collect()[0]["v"] is None


def test_ocr_routing_strategy(spark):
    from multiagent_form_schema_etl_spark.operators.document import blocks_df
    from multiagent_form_schema_etl_spark.operators.strategies import ocr_low_text_pages

    blocks = blocks_df(spark).filter(F.trim("text") != "")
    images = (blocks.select("doc_id", "page").distinct()
              .withColumn("image", F.lit("fakepayload").cast("binary")))
    ocred = ocr_low_text_pages(blocks, images)
    rows = {(r["doc_id"], r["page"]): r for r in ocred.collect()}
    # doc1 page2 (45 chars) and page3 (4 chars) are under the 50-char threshold
    assert (1, 2) in rows and (1, 3) in rows
    assert all(r["source"] == "ocr" and r["confidence"] == 0.8 for r in rows.values())
    assert rows[(1, 3)]["text"].startswith("[ocr ")


def test_golden_test_case_scan(spark):
    """S5: glob-load golden records (evaluation/evaluator.py:138-153)."""
    import json
    import os

    with tempfile.TemporaryDirectory() as d:
        for doc_id, fields in ((1, {"effective_date": "2021-03-15",
                                    "governing_law": "California"}),
                               (2, {"effective_date": None,
                                    "governing_law": "New York"})):
            with open(os.path.join(d, f"case_{doc_id}.json"), "w") as f:
                json.dump({"doc_id": doc_id, "pdf_path": f"doc{doc_id}.pdf",
                           "ground_truth": fields,
                           "schema": {"form_name": "NDA_Form"}}, f)
        gt = sch.load_test_cases(spark, d)
        rows = {(r["doc_id"], r["field_name"]): r["true_value"]
                for r in gt.collect()}
        assert rows[(1, "governing_law")] == "California"
        assert rows[(2, "effective_date")] is None
        assert len(rows) == 4


def test_pydatasource_formdocs_matches_driver_side_generation(spark):
    """The Arrow-batched Python DataSource must emit exactly the rows its
    generation rule describes (fixture blocks cycled over doc ids)."""
    from multiagent_form_schema_etl_spark import fixtures
    from multiagent_form_schema_etl_spark.sources.pydatasource import (
        _N_FIXTURE_DOCS, formdocs)

    got = sorted(tuple(r) for r in formdocs(spark, n_docs=12).collect())
    want = sorted(
        (d,) + row[1:]
        for d in range(12)
        for row in fixtures.BLOCK_ROWS
        if row[0] == d % _N_FIXTURE_DOCS + 1)
    assert got == want and len(got) > 0


def test_pydatasource_pushdown_prunes_partitions(spark):
    """doc_id range predicates reach pushFilters and shrink the planned
    partition set; the residual filter still runs in Spark (correct rows)."""
    from pyspark.sql import functions as F

    from multiagent_form_schema_etl_spark.sources.pydatasource import formdocs

    full = formdocs(spark, n_docs=200, partitions=8)
    assert full.rdd.getNumPartitions() == 8
    pruned = (formdocs(spark, n_docs=200, partitions=8)
              .filter(F.col("doc_id") < 50))
    assert pruned.rdd.getNumPartitions() == 2
    assert pruned.select(F.max("doc_id")).collect()[0][0] == 49
    point = (formdocs(spark, n_docs=200, partitions=8)
             .filter(F.col("doc_id") == 130))
    assert point.rdd.getNumPartitions() == 1
    assert point.count() > 0


def test_partitioned_stage_sink_prunes_partitions(spark):
    """A stage written with partitionBy must let a re-read filter prune at
    the directory level: the scan's PartitionFilters carry the predicate
    and only the matching partition's rows are read."""
    from multiagent_form_schema_etl_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    with tempfile.TemporaryDirectory() as d:
        sinks.write_stage(ev, d, "by_type", partition_by=["event_type"])
        back = sinks.read_stage(spark, d, "by_type")
        q = back.filter(F.col("event_type") == "click")
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted")
        part_lines = [ln for ln in plan.splitlines()
                      if "PartitionFilters" in ln]
        assert part_lines and any("event_type" in ln for ln in part_lines)
        assert q.count() == ev.filter(F.col("event_type") == "click").count()


def test_compact_stage_reduces_files_preserves_rows(spark):
    """Compaction must collapse a many-small-files stage to the target
    file count with identical content, and leave no scratch directories."""
    import glob
    import os

    from multiagent_form_schema_etl_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    with tempfile.TemporaryDirectory() as d:
        ev.repartition(64).write.parquet(os.path.join(d, "noisy"))
        assert len(glob.glob(f"{d}/noisy/*.parquet")) == 64
        sinks.compact_stage(spark, d, "noisy", n_files=4)
        assert len(glob.glob(f"{d}/noisy/*.parquet")) == 4
        assert not glob.glob(f"{d}/noisy__*")
        back = sinks.read_stage(spark, d, "noisy")
        assert back.count() == ev.count()
        assert (back.agg(F.sum(F.xxhash64(*ev.columns).cast("decimal(38,0)"))).first()[0]
                == ev.agg(F.sum(F.xxhash64(*ev.columns).cast("decimal(38,0)"))).first()[0])


def test_json_quarantine_splits_bad_records(spark):
    """Malformed JSON lines must land in quarantine verbatim (with their
    source file), never kill the read, and never leak into the valid side."""
    import os

    from pyspark.sql.types import LongType, StringType, StructType

    from multiagent_form_schema_etl_spark.sources.robust import (
        read_json_with_quarantine,
    )

    schema = (StructType().add("doc_id", LongType()).add("text", StringType()))
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "landing.json")
        with open(p, "w") as f:
            f.write('{"doc_id": 1, "text": "ok one"}\n')
            f.write('{"doc_id": 2, "text": "ok two"}\n')
            f.write('{"doc_id": 3, "text": BROKEN}\n')
            f.write('not json at all\n')
        n_schema_fields = len(schema.fields)
        valid, bad, raw = read_json_with_quarantine(spark, p, schema)
        assert len(schema.fields) == n_schema_fields  # caller schema untouched
        assert sorted((r.doc_id, r.text) for r in valid.collect()) == \
            [(1, "ok one"), (2, "ok two")]
        quarantined = bad.collect()
        assert len(quarantined) == 2
        assert {r.raw_record for r in quarantined} == \
            {'{"doc_id": 3, "text": BROKEN}', 'not json at all'}
        assert all(r.source_file.endswith("landing.json") for r in quarantined)
        raw.unpersist()
        # reusing the same schema object must not accumulate corrupt columns
        valid2, bad2, raw2 = read_json_with_quarantine(spark, p, schema)
        assert valid2.count() == 2 and bad2.count() == 2
        raw2.unpersist()


def test_compact_stage_self_heals_after_simulated_crash(spark):
    """A crash between the two swap renames strands the stage at
    __precompact; the next compaction call must restore and complete."""
    import glob
    import os

    from multiagent_form_schema_etl_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    with tempfile.TemporaryDirectory() as d:
        ev.repartition(16).write.parquet(os.path.join(d, "st"))
        # simulate: previous run crashed after rename(src, old)
        os.rename(os.path.join(d, "st"), os.path.join(d, "st__precompact"))
        os.makedirs(os.path.join(d, "st__compacting"))  # stale scratch too
        sinks.compact_stage(spark, d, "st", n_files=2)
        assert len(glob.glob(f"{d}/st/*.parquet")) == 2
        assert not glob.glob(f"{d}/st__*")
        assert sinks.read_stage(spark, d, "st").count() == ev.count()


def test_overwrite_partitions_replaces_only_touched_partition(spark):
    """Dynamic partition overwrite must replace exactly the partitions the
    backfill batch carries; full-stage overwrite (static mode) would wipe
    the others."""
    from multiagent_form_schema_etl_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    with tempfile.TemporaryDirectory() as d:
        sinks.write_stage(ev, d, "by_type", partition_by=["event_type"])
        before = {r.event_type: r.n for r in
                  sinks.read_stage(spark, d, "by_type")
                  .groupBy("event_type").agg(F.count("*").alias("n")).collect()}

        # backfill: reprocess ONLY clicks, deduplicated to half the rows
        clicks = (ev.filter(F.col("event_type") == "click")
                  .limit(before["click"] // 2))
        sinks.overwrite_partitions(clicks, d, "by_type",
                                   partition_by=["event_type"])
        after = {r.event_type: r.n for r in
                 sinks.read_stage(spark, d, "by_type")
                 .groupBy("event_type").agg(F.count("*").alias("n")).collect()}
        assert after["click"] == before["click"] // 2
        assert {k: v for k, v in after.items() if k != "click"} == \
            {k: v for k, v in before.items() if k != "click"}


def test_parquet_schema_evolution_read(spark):
    """A stage directory holding files from two schema vintages must read
    as the union schema (null backfill for old files), and conforming to a
    declared contract schema must add missing columns as typed NULLs, drop
    extras, and cast the rest."""
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    from multiagent_form_schema_etl_spark.sources.robust import (
        read_parquet_evolving,
    )

    with tempfile.TemporaryDirectory() as d:
        v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
        v2 = spark.createDataFrame([(3, "c", 1.5), (4, "d", 2.5)],
                                   "id long, name string, score double")
        v1.write.parquet(f"{d}/stage/part=v1")
        v2.write.parquet(f"{d}/stage/part=v2")

        merged = read_parquet_evolving(spark, f"{d}/stage")
        assert set(merged.columns) == {"id", "name", "score", "part"}
        rows = {r["id"]: r for r in merged.collect()}
        assert rows[1]["score"] is None and rows[3]["score"] == 1.5

        # plain read without mergeSchema picks one footer and can miss
        # 'score' entirely -- the failure mode the helper exists for
        plain_cols = set(spark.read.parquet(f"{d}/stage").columns)
        assert plain_cols in ({"id", "name", "part"},
                              {"id", "name", "score", "part"})

        contract = StructType([
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
            StructField("flagged", StringType()),   # not present anywhere
        ])
        conformed = read_parquet_evolving(spark, f"{d}/stage", contract)
        assert conformed.columns == ["id", "name", "score", "flagged"]
        assert all(r["flagged"] is None for r in conformed.collect())
        # pushdown survives the conform projection
        assert conformed.filter(F.col("id") == 3).count() == 1


def test_versioned_publish_time_travel_rollback(spark):
    """publish_stage must give atomic snapshot semantics on plain parquet:
    immutable version dirs, pointer-controlled current version, readable
    history (time travel), pointer rollback, and vacuum that never deletes
    the referenced version."""
    from multiagent_form_schema_etl_spark.catalog import load_table

    nation = load_table(spark, SF_SMOKE, "nation")
    with tempfile.TemporaryDirectory() as d:
        v0 = sinks.publish_stage(nation.filter(F.col("n_nationkey") < 10),
                                 d, "dim")
        v1 = sinks.publish_stage(nation, d, "dim")
        assert (v0, v1) == (0, 1)
        assert sinks.published_version(d, "dim") == 1
        assert sinks.read_stage_version(spark, d, "dim").count() == 25
        # time travel to the pre-publish snapshot
        assert sinks.read_stage_version(spark, d, "dim", 0).count() == 10

        # rollback flips the pointer; both versions stay on disk
        sinks.rollback_stage(d, "dim", 0)
        assert sinks.read_stage_version(spark, d, "dim").count() == 10
        assert sinks.read_stage_version(spark, d, "dim", 1).count() == 25

        # a new publish moves the pointer forward again
        v2 = sinks.publish_stage(nation.limit(5), d, "dim")
        assert sinks.published_version(d, "dim") == v2

        # vacuum keeps the pointer-referenced version even when old
        sinks.rollback_stage(d, "dim", 1)
        gone = sinks.vacuum_stage(d, "dim", keep=1)
        assert gone == [0]  # v1 survives (referenced), v2 survives (newest)
        assert sinks.read_stage_version(spark, d, "dim").count() == 25
        assert sinks.read_stage_version(spark, d, "dim", v2).count() == 5
        import pytest as _pytest
        with _pytest.raises(FileNotFoundError):
            sinks.rollback_stage(d, "dim", 99)


def test_zorder_quantile_cells_beat_uniform_on_skew(spark):
    """On a skewed column, a uniform Z-grid collapses the dense value
    region into one cell, so nearly every file holds dense-region rows and
    carries min/max stats covering it -- probes where the data actually
    lives prune nothing. Equi-depth (quantile) cells spread the dense
    region across most cells, keeping per-file stats narrow there. Probes
    drawn from the dense region must see a far lower file-hit fraction
    under quantile cells; both layouts use the same 8-bit interleave."""
    import glob

    import pyarrow.parquet as pq

    n = 20000
    # 95% of y-values dense in [0, 100); 5% spread out to ~1e9.
    # x is uncorrelated (hash-shuffled ids).
    df = spark.range(n).select(
        F.xxhash64("id").alias("x"),
        F.when(F.col("id") % 20 != 0, F.col("id") % 100)
         .otherwise(F.col("id") * 50000).alias("y_skewed"))

    def hit_fraction(path, probes):
        spans = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("y_skewed")
            lo = min(md.row_group(g).column(idx).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max
                     for g in range(md.num_row_groups))
            spans.append((lo, hi))
        fracs = [sum(1 for lo, hi in spans if lo <= p_ <= hi) / len(spans)
                 for p_ in probes]
        return sum(fracs) / len(fracs)

    probes = list(range(5, 100, 10))  # dense-region values
    with tempfile.TemporaryDirectory() as d:
        upath = sinks.write_zorder(df, d, "uniform", ["x", "y_skewed"],
                                   n_files=16, bits=8)
        qpath = sinks.write_zorder(df, d, "quantile", ["x", "y_skewed"],
                                   n_files=16, bits=8, quantile=True)
        u = hit_fraction(upath, probes)
        q = hit_fraction(qpath, probes)
        assert q < u / 2, (q, u)   # quantile cells prune the dense region
        assert u >= 0.8, u         # uniform grid ~fails to prune there
        # correctness: same rows either way
        back = spark.read.parquet(qpath)
        assert back.count() == n
        import pytest as _pytest
        with _pytest.raises(ValueError):
            sinks.zorder_key(df, ["x", "y_skewed"], bits=16, quantile=True)


def test_write_audit_publish_gates_bad_data(spark):
    """publish_stage_audited must flip the pointer only when every audit
    passes against the WRITTEN files; a failing audit quarantines the
    version and readers keep the previous snapshot."""
    import os

    from multiagent_form_schema_etl_spark.catalog import load_table

    nation = load_table(spark, SF_SMOKE, "nation")
    audits = {
        "nonempty": lambda d: d.count() > 0,
        "all_keys_present": lambda d: d.select("n_nationkey").distinct()
                                       .count() == d.count(),
    }
    with tempfile.TemporaryDirectory() as d:
        v, res = sinks.publish_stage_audited(nation, d, "dim", audits)
        assert v == 0 and all(res.values())
        assert sinks.read_stage_version(spark, d, "dim").count() == 25

        # a batch that fails an audit must NOT become visible
        dupes = nation.union(nation)  # duplicate keys
        v2, res2 = sinks.publish_stage_audited(dupes, d, "dim", audits)
        assert v2 == 0                      # pointer still on the good one
        assert res2["all_keys_present"] is False
        assert sinks.read_stage_version(spark, d, "dim").count() == 25
        assert os.path.exists(f"{d}/dim/v=1/_QUARANTINED")

        # a first-ever publish that fails audits reports no live version
        v3, res3 = sinks.publish_stage_audited(
            nation.limit(0), d, "empty_stage", audits)
        assert v3 == -1 and res3["nonempty"] is False
