"""Headline analytical queries (TPC-H-shaped) — the bench workload.

These exercise the full relational stack at once: multi-way joins with
broadcast/shuffle strategy selection, partial+final hash aggregation,
deterministic top-k. All double SUMs go through the FIXED-POINT
accumulator (functions.portable.fsum_col — floor(x*10^s + 0.5) summed as
exact BIGINTs): order-independent, engine-identical, and measured 5.5x
faster than the decimal accumulator on this aggregation shape (decimal
sum 1.62s vs fixed-point 0.29s on the q1 aggregate at sf0.1 local[32] —
within 15% of a raw unportable double sum). Bound: |x|*10^scale summed
over the group must stay under 2^63 — money columns at scale 6 clear
this through ~10^13 rows per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from icenetetl_spark.functions.portable import fsum_col
from icenetetl_spark.sources.testdata import load_table

_DISC = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


def _fsum_sql(expr: str, scale: int) -> str:
    """The oracle twin of fsum_col (see functions/portable.py)."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * 1e{scale} + 0.5) AS BIGINT))"
        f" AS DOUBLE) / 1e{scale}"
    )


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy filter + wide hash aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("2000-09-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fsum_col("l_quantity", 2).alias("sum_qty"),
            fsum_col("l_extendedprice", 2).alias("sum_base_price"),
            fsum_col(disc, 6).alias("sum_disc_price"),
            fsum_col(charge, 6).alias("sum_charge"),
            (fsum_col("l_quantity", 2) / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> two joins -> agg -> top-k.

    Plan: customer(filtered, broadcast) ⋈ orders ⋈ lineitem; deterministic
    ORDER BY (revenue DESC, o_orderkey) so LIMIT 10 is reproducible.
    """
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("2000-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("2000-03-15").cast("date")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cu), orders.o_custkey == cu.c_custkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(fsum_col(disc, 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with two co-location constraints."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(fsum_col(disc, 6).alias("revenue"))
    )


def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure pushed-down filter + single scalar agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            fsum_col(
                F.col("l_extendedprice") * F.col("l_discount"), 6
            ).alias("revenue")
        )
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_revenue": q3_top_revenue,
    "q5_local_supplier": q5_local_supplier,
    "q6_revenue_delta": q6_revenue_delta,
}

ORACLES = {
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {_fsum_sql("l_quantity", 2)} AS sum_qty,
               {_fsum_sql("l_extendedprice", 2)} AS sum_base_price,
               {_fsum_sql(_DISC, 6)} AS sum_disc_price,
               {_fsum_sql(_CHARGE, 6)} AS sum_charge,
               {_fsum_sql("l_quantity", 2)} / COUNT(*) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_top_revenue": f"""
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
               {_fsum_sql(_DISC, 6)} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND CAST(o_orderdate AS DATE) < DATE '2000-03-15'
          AND CAST(l_shipdate AS DATE) > DATE '2000-03-15'
        GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q5_local_supplier": f"""
        SELECT n_name,
               {_fsum_sql(_DISC, 6)} AS revenue
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "q6_revenue_delta": f"""
        SELECT {_fsum_sql("l_extendedprice * l_discount", 6)} AS revenue
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
          AND l_discount >= 0.02 AND l_discount <= 0.08
          AND l_quantity < 24
    """,
}
