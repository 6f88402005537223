"""Extended relational coverage beyond the reference's own surface: semi
joins, outer-join distributions, distinct aggregates, HAVING-gated subquery
joins, disjunctive pushdown, set operations — the remaining vocabulary a
user migrating arbitrary SQL onto this engine needs. TPC-H-shaped where a
classic query fits the testdata columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from icenetetl_spark.functions.portable import fsum_col
from icenetetl_spark.sources.testdata import load_table

_DISC = "l_extendedprice * (1 - l_discount)"


def q4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS -> left semi join, then rollup."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    big_items = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(
            big_items, orders.o_orderkey == big_items.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join + two-level aggregation (orders per
    customer, then customers per order-count)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q16_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) under a selective dim filter."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 14, 23, 45)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-gated aggregate subquery joined back."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(fsum_col("l_quantity", 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return orders.join(big, orders.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        "o_totalprice",
        "sum_qty",
    )


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across join sides (tests
    CNF conversion / partial pushdown)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    pred = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40))
    )
    return joined.filter(pred).agg(fsum_col(disc, 6).alias("revenue"))


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = customer.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey")
    )
    spenders = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey")
    )
    return rich.union(spenders).distinct()


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    spenders = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return rich.intersect(spenders)


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance customers with NO high-value order (EXCEPT)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = customer.filter(F.col("c_acctbal") > 2000).select(
        F.col("c_custkey").alias("custkey")
    )
    big_orders = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return rich.exceptAll(big_orders.distinct()).distinct()


def j_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join vocabulary: rich customers vs big-spender order
    rollups — rows survive from BOTH unmatched sides (rich customers with
    no big orders, big spenders below the balance cut)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = customer.filter(F.col("c_acctbal") > 8000).select(
        F.col("c_custkey").alias("custkey"), "c_acctbal"
    )
    big = (
        orders.filter(F.col("o_totalprice") > 450000)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_big_orders"))
    )
    return rich.join(big, "custkey", "full_outer").select(
        "custkey", "c_acctbal", "n_big_orders"
    )


def p10_first_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 parity (processor.py:368-370): the single distinct scalar of a
    one-file-equivalent slice (one order's date)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") == 1)
        .select(F.to_date("o_orderdate").alias("date_generated"))
        .distinct()
    )


def j_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join (operators/scale.salted_join) — must produce exactly
    the plain join's rows; the DuckDB oracle IS the plain join, so the gate
    proves the salting rewrite is result-transparent."""
    from icenetetl_spark.operators.scale import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    out = salted_join(
        li, supp.withColumnRenamed("s_suppkey", "l_suppkey"), ["l_suppkey"],
        salt_buckets=8,
    )
    return out.select("l_orderkey", "l_linenumber", "l_suppkey", "s_name")


def j_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi join (operators/scale.bloom_semi_join):
    lineitem rows whose order cleared a selective price bar. The bitmap of
    qualifying orderkeys is built distributed and collected bounded by the
    BITMAP size (2^16 bits), then probe rows are bit-tested inside the scan
    stage before any exchange — Bloom (CACM 1970) as Spark's runtime-filter
    idea (SPARK-32268) made an explicit, reusable operator. The DuckDB
    oracle is the plain EXISTS semi join, so the gate proves the bloom path
    (false positives + exact-join cleanup) is result-transparent."""
    from icenetetl_spark.operators.scale import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders")
    build = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    return bloom_semi_join(li, build, "l_orderkey")


QUERIES = {
    "j_salted_join": j_salted_join,
    "j_bloom_semi_join": j_bloom_semi_join,
    "q4_semi_join": q4_semi_join,
    "q13_cust_distribution": q13_cust_distribution,
    "q16_distinct_suppliers": q16_distinct_suppliers,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive": q19_disjunctive,
    "set_union_distinct": set_union_distinct,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "j_full_outer": j_full_outer,
    "p10_first_distinct": p10_first_distinct,
}

ORACLES = {
    "j_bloom_semi_join": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_orderkey = l_orderkey
                        AND o_totalprice > 400000)
    """,
    "j_salted_join": """
        SELECT l_orderkey, l_linenumber, l_suppkey, s_name
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    """,
    "q4_semi_join": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority
    """,
    "q13_cust_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "q16_distinct_suppliers": """
        SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size IN (1, 14, 23, 45)
        GROUP BY p_brand, p_size
    """,
    "q18_large_orders": """
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
               o_totalprice, sum_qty
        FROM orders
        JOIN (
            SELECT l_orderkey,
                   CAST(SUM(CAST(FLOOR(l_quantity * 1e2 + 0.5) AS BIGINT))
                        AS DOUBLE) / 1e2 AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(FLOOR(l_quantity * 1e2 + 0.5) AS BIGINT))
                        AS DOUBLE) / 1e2 > 200
        ) ON o_orderkey = l_orderkey
    """,
    "q19_disjunctive": f"""
        SELECT CAST(SUM(CAST(FLOOR(({_DISC}) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1e6 AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 20)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity >= 10 AND l_quantity <= 30)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    "set_union_distinct": """
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
        UNION
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
    """,
    "set_intersect": """
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
    "set_except": """
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 2000
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
    "j_full_outer": """
        SELECT coalesce(r.custkey, b.custkey) AS custkey,
               r.c_acctbal, b.n_big_orders
        FROM (SELECT c_custkey AS custkey, c_acctbal FROM customer
              WHERE c_acctbal > 8000) r
        FULL OUTER JOIN
             (SELECT o_custkey AS custkey, count(*) AS n_big_orders
              FROM orders WHERE o_totalprice > 450000
              GROUP BY o_custkey) b
          ON r.custkey = b.custkey
    """,
    "p10_first_distinct": """
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS date_generated
        FROM orders WHERE o_orderkey = 1
    """,
}


def er_fuzzy_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs: customer names within edit
    distance 1, found by SymSpell deletion blocking + exact levenshtein
    verification (operators/fuzzy.py) — never an all-pairs join."""
    from icenetetl_spark.operators.fuzzy import fuzzy_name_pairs

    return fuzzy_name_pairs(
        load_table(spark, sf_dir, "customer"), "c_custkey", "c_name"
    )


QUERIES["er_fuzzy_customer_pairs"] = er_fuzzy_customer_pairs


def _fuzzy_oracle() -> str:
    from icenetetl_spark.operators.fuzzy import fuzzy_pairs_oracle_sql

    return fuzzy_pairs_oracle_sql("customer", "c_custkey", "c_name")


ORACLES["er_fuzzy_customer_pairs"] = _fuzzy_oracle()
