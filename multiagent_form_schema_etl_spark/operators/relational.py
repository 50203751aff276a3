"""Core relational slice (SURVEY.md §7 step 1): scans + filter + multi-way
equi-join + hash aggregation + top-k over the driver's TPC-H-ish tables.

Scale notes:
- Dimension chains (region→nation→customer) are tiny relative to fact tables;
  ``broadcast`` hints keep the lineitem⋈orders join the only real shuffle.
  AQE would pick this up from stats, but at 100 TB the hint removes the risk
  of a mis-estimated sort-merge join over a 5-row dim.
- Aggregations are expressed as single groupBy so Spark plans partial
  (map-side) aggregation before the shuffle.
- Top-k = orderBy + limit which Spark plans as TakeOrderedAndProject (no
  global sort materialization).
- Double sums route through DECIMAL for order-independence (see
  functions.scalars.dec_sum) -- required for oracle hash-equality and, at
  scale, for run-to-run reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import gated_broadcast, load_table, table_rowcount
from ..functions.scalars import dec_avg, dec_sum
from ..plans.registry import register


def _gb(spark: SparkSession, sf_dir: str, df: DataFrame, table: str) -> DataFrame:
    """Size-gated broadcast hint for the CORPUS-GROWING TPC-H relations
    (customer/supplier/part): conventionally "dimensions" and
    measured-right to broadcast at gate scale, but they grow linearly
    with the corpus, so the hint is gated on the table's parquet-footer
    row count (VERDICT r10) -- under the gate the plan is unchanged;
    above it AQE picks the strategy from runtime sizes. nation/region
    keep raw hints: fixed at 25/5 rows at every scale factor by the
    TPC-H spec. `df` may be a filtered projection of `table`; the footer
    count of the parent table upper-bounds it."""
    return gated_broadcast(df, table_rowcount(spark, sf_dir, table))


_DEC = "decimal(28,6)"


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter → hash agg with partial aggregation.

    Exercises A1/A4-style conditional-free sums and the engine's exact
    double-sum discipline. Filter pushes to the Parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(charge, "sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k.

    customer is broadcast (small side), so only orders⋈lineitem shuffles;
    top-k plans as TakeOrderedAndProject. Tie-break on l_orderkey keeps the
    LIMIT deterministic across engines.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_gb(spark, sf_dir, cust, "customer"), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY §7 step 1): 6-way star join + filter + agg + sort.

    All dimension sides (region/nation/supplier/customer) are broadcast; the
    only shuffle is lineitem⋈orders plus the final 25-group aggregation.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_gb(spark, sf_dir, cust, "customer"), orders.o_custkey == cust.c_custkey)
        .join(_gb(spark, sf_dir, supp, "supplier"),
              (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q06_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-global-agg; every predicate pushes to
    the Parquet reader (PushedFilters), no shuffle beyond the final reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by returned-item revenue."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_gb(spark, sf_dir, cust, "customer"), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec_sum(revenue, "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q02_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    mins AS (SELECT partkey, MIN(cost) AS min_cost FROM costs GROUP BY partkey)
    SELECT c.partkey AS p_partkey, p.p_name, MIN(c.suppkey) AS best_suppkey, m.min_cost
    FROM costs c
    JOIN mins m ON c.partkey = m.partkey AND c.cost = m.min_cost
    JOIN part p ON c.partkey = p.p_partkey
    WHERE p.p_size >= 40
    GROUP BY c.partkey, p.p_name, m.min_cost
    """,
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-cost supplier (correlated-subquery
    semantics decorrelated into an aggregate + self-join -- the plan Spark's
    own subquery rewrite would produce). Min-suppkey tie-break keeps it
    deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    costs = (li.groupBy(F.col("l_partkey").alias("partkey"),
                        F.col("l_suppkey").alias("suppkey"))
             .agg(dec_sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                          "cost")))
    mins = (costs.groupBy("partkey")
            .agg(F.min("cost").alias("min_cost"))
            .withColumnRenamed("partkey", "m_partkey"))
    return (costs.join(mins, (costs.partkey == mins.m_partkey)
                       & (costs.cost == mins.min_cost))
            .join(_gb(spark, sf_dir, part, "part"), costs.partkey == part.p_partkey)
            .groupBy(F.col("partkey").alias("p_partkey"), "p_name", "min_cost")
            .agg(F.min("suppkey").alias("best_suppkey"))
            .select("p_partkey", "p_name", "best_suppkey", "min_cost"))


@register(
    "q04_order_priority_checking",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, then count by priority."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    semi = orders.join(
        li, (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi")
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q07_volume_shipping",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('NATION_1','NATION_2') AND sn.n_name IN ('NATION_1','NATION_2')
      AND cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)
    """,
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    pair = ("NATION_1", "NATION_2")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_gb(spark, sf_dir, cust, "customer"), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("c_nk"))
        .join(_gb(spark, sf_dir, supp, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("s_nk"))
        .filter(F.col("cust_nation").isin(*pair) & F.col("supp_nation").isin(*pair)
                & (F.col("cust_nation") != F.col("supp_nation")))
        .groupBy("cust_nation", "supp_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(dec_sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                     "volume"))
    )


@register(
    "q09_product_type_profit",
    oracle="""
    SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - 0.8 * p_retailprice * l_quantity
                         AS DECIMAL(28,6))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
    """,
)
def q09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus a supply-cost proxy, 80% of
    retail) by supplier nation and order year for a part-name family."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
              - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_gb(spark, sf_dir, part, "part"), li.l_partkey == part.p_partkey)
        .join(_gb(spark, sf_dir, supp, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(dec_sum(profit, "profit"))
    )


@register(
    "q12_priority_shipping_classes",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_priority_shipping_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → returnflag: the corpus carries no
    shipmode column): priority class counts per flag."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count")))


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                         AS DECIMAL(28,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
           * 100 AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share -- conditional / total sums in
    one aggregation over a broadcast part join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    return (li.join(_gb(spark, sf_dir, part, "part"), li.l_partkey == part.p_partkey)
            .agg((dec_sum(promo) / dec_sum(rev) * 100).alias("promo_revenue_pct")))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON supplier_no = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) hitting the max quarterly revenue --
    the scalar subquery becomes a broadcast of a 1-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(dec_sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                            "total_revenue")))
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (revenue.join(F.broadcast(mx), revenue.total_revenue == mx.mx)
            .join(_gb(spark, sf_dir, supp, "supplier"), F.col("supplier_no") == supp.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue"))


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (10, 20, 30, 40, 50)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per part attribute combo."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(10, 20, 30, 40, 50))
    return (li.join(_gb(spark, sf_dir, part, "part"), li.l_partkey == part.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH avgs AS (
      SELECT l_partkey AS pk, 0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                                     / COUNT(l_quantity)) AS half_avg
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN avgs ON l_partkey = pk
    WHERE l_quantity < half_avg
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: below-half-average-quantity revenue; the correlated
    per-part average decorrelates into an aggregate joined back to the
    fact."""
    li = load_table(spark, sf_dir, "lineitem")
    avgs = (li.groupBy(F.col("l_partkey").alias("pk"))
            .agg((F.lit(0.5) * dec_avg("l_quantity")).alias("half_avg")))
    return (li.join(avgs, li.l_partkey == avgs.pk)
            .filter(F.col("l_quantity") < F.col("half_avg"))
            .agg((dec_sum("l_extendedprice") / 7.0).alias("avg_yearly")))


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150)
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered keys semi-joined back to the
     3-way join, top-20 by price."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
           .filter(F.col("q") > 150).select("l_orderkey"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "bk"),
              orders.o_orderkey == F.col("bk"), "left_semi")
        .join(_gb(spark, sf_dir, cust, "customer"), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dec_sum("l_quantity", "total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 30 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 60 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 100 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate (Catalyst factors the
    common p_partkey equi-condition out so the join stays hash-based)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(_gb(spark, sf_dir, part, "part"), li.l_partkey == part.p_partkey)
    clause = lambda brand, s0, s1, q0, q1: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s0, s1)
        & F.col("l_quantity").between(q0, q1))
    cond = (clause("Brand#1", 1, 30, 1, 20)
            | clause("Brand#2", 10, 60, 10, 30)
            | clause("Brand#3", 20, 100, 20, 40))
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return j.filter(cond).agg(dec_sum(rev, "revenue"))


@register(
    "q22_inactive_customer_balance",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(c_acctbal) AS ab
      FROM customer WHERE c_acctbal > 0),
    inactive AS (
      SELECT * FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT'))
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS totacctbal
    FROM inactive, avg_bal
    WHERE c_acctbal > ab
    GROUP BY c_nationkey
    """,
)
def q22_inactive_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders -- anti join plus a broadcast scalar average threshold (every
    customer in this corpus has SOME order, so plain inactivity is empty)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0)
               .agg(dec_avg("c_acctbal", "ab")))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    inactive = cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
    return (inactive.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("ab"))
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 dec_sum("c_acctbal", "totacctbal")))


@register(
    "q11_important_stock_share",
    oracle="""
    WITH vals AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS part_value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey),
    total AS (SELECT CAST(SUM(CAST(part_value AS DECIMAL(28,6))) AS DOUBLE) AS tv FROM vals)
    SELECT l_partkey, part_value
    FROM vals, total
    WHERE part_value > 0.002 * tv
    """,
)
def q11_important_stock_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose value exceeds a fraction of the national
    total -- group sums compared against a broadcast global scalar."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    vals = (li.join(_gb(spark, sf_dir, supp, "supplier"), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .groupBy("l_partkey")
            .agg(dec_sum(F.col("l_extendedprice") * F.col("l_quantity"),
                         "part_value")))
    total = vals.agg(dec_sum("part_value", "tv"))
    return (vals.crossJoin(F.broadcast(total))
            .filter(F.col("part_value") > 0.002 * F.col("tv"))
            .select("l_partkey", "part_value"))


@register(
    "q13_customer_order_distribution",
    oracle="""
    WITH counts AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM counts GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count histogram INCLUDING zero-order customers
    (left outer join preserves them; COUNT(col) skips their NULLs)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED")
    counts = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
              .groupBy("c_custkey")
              .agg(F.count("o_orderkey").alias("c_count")))
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q21_waiting_supplier_orders",
    oracle="""
    SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM lineitem l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON l1.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
)
def q21_waiting_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone shipped late on multi-supplier
    finalized orders -- stacked EXISTS (semi) and NOT EXISTS (anti) joins
    against the same fact table. Late = >60 days after the order date."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    l1 = (li.join(orders, li.l_orderkey == orders.o_orderkey)
          .filter(F.col("l_shipdate") > late_cut)
          .select("l_orderkey", "l_suppkey", "o_orderdate"))
    others = li.select(F.col("l_orderkey").alias("ok"),
                       F.col("l_suppkey").alias("sk"))
    # some other supplier on the order...
    semi = l1.join(others, (l1.l_orderkey == others.ok)
                   & (l1.l_suppkey != others.sk), "left_semi")
    # ...but no OTHER supplier was late on it
    late_others = (li.join(orders, li.l_orderkey == orders.o_orderkey)
                   .filter(F.col("l_shipdate") > late_cut)
                   .select(F.col("l_orderkey").alias("lok"),
                           F.col("l_suppkey").alias("lsk")))
    lone = semi.join(late_others, (semi.l_orderkey == late_others.lok)
                     & (semi.l_suppkey != late_others.lsk), "left_anti")
    return (lone.join(_gb(spark, sf_dir, supp, "supplier"), lone.l_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.countDistinct("l_orderkey").alias("numwait")))


@register(
    "q08_market_share",
    oracle="""
    WITH volumes AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'EUROPE')
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END
                         AS DECIMAL(28,6))) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS mkt_share
    FROM volumes GROUP BY o_year
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's yearly order volume
    (conditional-sum / total-sum ratio in a single aggregation)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cn = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_regionkey").alias("c_rk"))
    sn = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    volumes = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_gb(spark, sf_dir, cust, "customer"), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(_gb(spark, sf_dir, supp, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("s_nk"))
        .select(F.year("o_orderdate").cast("long").alias("o_year"),
                vol.alias("volume"), "supp_nation"))
    target = F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(F.lit(0))
    return volumes.groupBy("o_year").agg(
        (dec_sum(target) / dec_sum("volume")).alias("mkt_share"))


@register(
    "q20_excess_stock_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_shipped
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey),
    heavy AS (
      SELECT DISTINCT l_suppkey AS hk FROM shipped
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%gear%' AND total_shipped > 40)
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier WHERE EXISTS (SELECT 1 FROM heavy WHERE hk = s_suppkey)
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved heavy volume of a part family in
    a year -- nested aggregate threshold feeding a semi join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = load_table(spark, sf_dir, "supplier")
    shipped = (li.groupBy("l_suppkey", "l_partkey")
               .agg(dec_sum("l_quantity", "total_shipped")))
    heavy = (shipped.join(_gb(spark, sf_dir, part, "part"), shipped.l_partkey == part.p_partkey)
             .filter(F.col("total_shipped") > 40)
             .select(F.col("l_suppkey").alias("hk")).distinct())
    return (supp.join(heavy, supp.s_suppkey == heavy.hk, "left_semi")
            .select("s_suppkey", "s_name", "s_acctbal"))
