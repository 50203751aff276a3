"""Bucketing and salting: verify the physical plans, not just the results."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from multiagent_form_schema_etl_spark.catalog import load_table
from multiagent_form_schema_etl_spark.operators import partitioning as P
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped in the finally block
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        orders = load_table(spark, SF_SMOKE, "orders")
        li = load_table(spark, SF_SMOKE, "lineitem")
        P.write_bucketed(orders, "b_orders", "o_orderkey")
        P.write_bucketed(li.withColumnRenamed("l_orderkey", "lk"), "b_lineitem", "lk")
        j = P.bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey", "lk")
        plan = _plan(j)
        assert "Exchange hashpartitioning" not in plan, plan
        # sanity: co-located join still returns the right row count
        expect = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert j.count() == expect
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_sum_matches_direct_aggregation(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    direct = {r["l_returnflag"]: r["total"] for r in
              li.groupBy("l_returnflag")
              .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)"))
                   .cast("double").alias("total")).collect()}
    salted = {r["l_returnflag"]: r["total"] for r in
              P.salted_sum(li, "l_returnflag", "l_quantity", "total").collect()}
    assert salted == direct  # decimal accumulation => bit-identical


def test_salted_join_matches_direct_join(spark):
    """The shared salted_join helper (fact scatter + dim replicate on
    (key, salt)) must reproduce the plain equi join's multiset of rows
    exactly — salting is semantics-free because every fact row's salt
    meets its replicated dim row once."""
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey")
    sup = load_table(spark, SF_SMOKE, "supplier").select(
        "s_suppkey", "s_nationkey")
    direct = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["s_nationkey"])
        for r in li.join(sup, li.l_suppkey == sup.s_suppkey).collect())
    joined = P.salted_join(li, sup, "l_suppkey", "s_suppkey")
    salted = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["s_nationkey"])
        for r in joined.collect())
    assert salted == direct
    # output contract (ADVICE r6): original columns only, no salt residue,
    # dim join key dropped -- select('*') sees an unsalted join's shape
    assert joined.columns == ["l_orderkey", "l_linenumber", "l_suppkey",
                              "s_nationkey"]


def test_salted_join_preserves_user_salt_column(spark):
    """A caller's own '_salt' column must pass through salted_join
    untouched (the helper salts under an internal name)."""
    li = (load_table(spark, SF_SMOKE, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_suppkey")
          .withColumn("_salt", F.col("l_orderkey") % 7))
    sup = load_table(spark, SF_SMOKE, "supplier").select(
        "s_suppkey", "s_nationkey")
    joined = P.salted_join(li, sup, "l_suppkey", "s_suppkey")
    assert joined.columns == ["l_orderkey", "l_linenumber", "l_suppkey",
                              "_salt", "s_nationkey"]
    assert all(r["_salt"] == r["l_orderkey"] % 7
               for r in joined.collect())


def test_referential_integrity_flags_orphans(spark, tmp_path):
    """On a corpus constructed WITH orphans the audit reports them exactly
    (rows and distinct keys) and fails the intact verdict; the clean edges
    stay intact."""
    from multiagent_form_schema_etl_spark.operators.joins import (
        etl_referential_integrity)

    (spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, 98), (5, 99)],
        "l_linenumber long, l_orderkey long")
     .write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet")))
    (spark.createDataFrame([(10, 100)], "o_orderkey long, o_custkey long")
     .write.mode("overwrite").parquet(str(tmp_path / "orders.parquet")))
    (spark.createDataFrame([(100, 0)], "c_custkey long, c_nationkey long")
     .write.mode("overwrite").parquet(str(tmp_path / "customer.parquet")))
    (spark.createDataFrame([(0,)], "n_nationkey long")
     .write.mode("overwrite").parquet(str(tmp_path / "nation.parquet")))
    got = {r["fk"]: r for r in
           etl_referential_integrity(spark, str(tmp_path)).collect()}
    li = got["lineitem.l_orderkey -> orders.o_orderkey"]
    assert (li["n_orphans"], li["n_orphan_keys"], li["intact"]) == (3, 2,
                                                                    False)
    assert got["orders.o_custkey -> customer.c_custkey"]["intact"]
    assert got["customer.c_nationkey -> nation.n_nationkey"]["intact"]


def test_key_skew_profile_is_window_free_and_consistent(spark):
    """The skew profile's physical plan must contain NO Window node (the
    first cut's fact-sized CUME_DIST sort is the regression this pins),
    and its stats must be internally consistent."""
    from multiagent_form_schema_etl_spark.operators.aggregates import (
        a_key_skew_profile)

    df = a_key_skew_profile(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    [r] = df.collect()
    assert r["min_rows_per_key"] <= r["p50"] <= r["p99"] \
        <= r["max_rows_per_key"]
    assert abs(r["avg_rows_per_key"] - r["n_rows"] / r["n_keys"]) < 1e-4
    assert 0 < r["top_key_share"] <= 1.0 and r["skew_factor"] >= 1.0
