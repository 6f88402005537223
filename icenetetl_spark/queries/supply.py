"""Supply-chain TPC-H shapes completing the 22/22 family coverage: Q2, Q9,
Q11, Q12, Q20 — the five forms `warehouse.py` left out, adapted to the
testdata schema (no partsupp / c_phone / l_shipmode columns, so the supply
relation is derived from lineitem: one row per (part, supplier) offer with
MIN(l_extendedprice) as its supply cost).

Shapes exercised (and their scale story):

- Q2: correlated MIN subquery over the supply relation, decorrelated into
  a per-part aggregate broadcast back; every dim (part-filter, supplier ⋈
  nation ⋈ region) is broadcast, so the only shuffle is the supply
  aggregation itself.
- Q9: LIKE-filtered part dim over a profit expression combining fact
  columns with a dim column, rolled up by (nation, year). Fixed-point sum
  (fsum_col) because the profit expression is an arbitrary float.
- Q11: group-by HAVING against a scalar-subquery fraction of the global
  total — the classic "important stock" form; the scalar total is a 1-row
  broadcast, never a window.
- Q12: conditional CASE counts by a line attribute with a date-range
  predicate pushed to the fact scan; counts are exact ints.
- Q20: nested IN/EXISTS chain — part filter → per-(supplier,part)
  quantity vs a correlated per-part threshold → distinct-supplier
  semi-join, nation-filtered. All subquery sides shrink before any join.

Reference parity: the reference (alan-turing-institute/IceNetETL) delegates
all SQL to Postgres; these shapes complete the decision-support vocabulary
a user would run there. Aggregates follow functions/portable.py so the
DuckDB oracles hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from icenetetl_spark.functions.portable import fsum_col
from icenetetl_spark.sources.testdata import load_table

_DISC = "l_extendedprice * (1 - l_discount)"

_Q2_REGION = "EUROPE"
_Q2_TYPE = "STANDARD"
_Q2_MAX_SIZE = 10
_Q9_NAME_FRAG = "red"
_Q9_COST_RATE = 0.1
_Q11_NATION = "NATION_7"
_Q11_FRACTION = 0.001
_Q20_NAME_PREFIX = "small"
_Q20_NATION = "NATION_3"
_Q20_SHARE = 0.5
_HI_PRIO = ("1-URGENT", "2-HIGH")


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived supply relation: one row per (part, supplier) pair that
    ever shipped, costed at its cheapest observed line price. MIN is exact
    (no accumulation-order sensitivity), so no decimal detour is needed."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supplycost"))
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the in-region supplier(s)
    offering the minimum supply cost. The correlated
    ``= (SELECT MIN(...) WHERE same part)`` is decorrelated into a per-part
    MIN aggregate joined back (broadcast — one row per qualifying part)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == _Q2_TYPE) & (F.col("p_size") <= _Q2_MAX_SIZE)
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q2_REGION
    )
    elig = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        _supply(spark, sf_dir)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(elig), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    min_cost = offers.groupBy(F.col("p_partkey").alias("pk")).agg(
        F.min("supplycost").alias("min_cost")
    )
    return (
        offers.join(F.broadcast(min_cost), offers.p_partkey == min_cost.pk)
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supplycost"
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on LIKE-matched parts by supplier nation and
    order year. Cost proxy = p_retailprice * rate * quantity (testdata has
    no ps_supplycost). Profit mixes money with a float product, so the sum
    is fixed-point (fsum_col) — decimal casts of arbitrary floats round
    differently across engines."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(_Q9_NAME_FRAG)
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        _Q9_COST_RATE
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("o_orderdate")).alias("o_year"),
        )
        .agg(fsum_col(amount, scale=6).alias("sum_profit"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value restricted to one nation's
    suppliers, HAVING value > fraction * the same restricted global total.
    The scalar total is a 1-row aggregate broadcast back — never a global
    window — and the nation restriction shrinks the supplier side to a
    broadcast before the fact scan is touched."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == _Q11_NATION
    )
    li = load_table(spark, sf_dir, "lineitem")
    nat_supp = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    value = F.col("l_extendedprice") * F.col("l_quantity")
    scoped = li.join(
        F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey")
    )
    per_part = scoped.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        fsum_col(value, 2).alias("value")
    )
    total = per_part.agg(
        (fsum_col("value", 2) * F.lit(_Q11_FRACTION)).alias("__threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("__threshold"))
        .select("p_partkey", "value")
        .orderBy(F.col("value").desc(), "p_partkey")
    )


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-conditional priority counts by a line attribute
    (l_linestatus stands in for the absent l_shipmode) over a one-year ship
    window pushed to the fact scan. Exact integer counts — trivially
    oracle-portable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.when(
        F.col("o_orderpriority").isin(*_HI_PRIO), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested IN-subquery chain. Suppliers in one
    nation who DOMINATE supply of a prefix-matched part — their shipped
    quantity of that part exceeds half the part's total shipped quantity
    (the stand-in for ``ps_availqty > 0.5 * sum(l_quantity)``). Correlated
    threshold decorrelated into a per-part total broadcast back; the outer
    IN becomes a distinct-supplier semi-join."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(_Q20_NAME_PREFIX)
    )
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == _Q20_NATION
    )
    scoped = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_pair = scoped.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    per_part = scoped.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum("l_quantity") * F.lit(_Q20_SHARE)).alias("part_threshold")
    )
    dominant = (
        per_pair.join(F.broadcast(per_part), per_pair.l_partkey == per_part.pk)
        .filter(F.col("supp_qty") > F.col("part_threshold"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(dominant),
            supplier.s_suppkey == F.col("l_suppkey"),
            "leftsemi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_priority_lines": q12_priority_lines,
    "q20_excess_suppliers": q20_excess_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": f"""
        WITH supply AS (
            SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supplycost
            FROM lineitem GROUP BY 1, 2
        ),
        elig AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = '{_Q2_REGION}'
        ),
        offers AS (
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
            FROM supply
            JOIN part ON l_partkey = p_partkey
            JOIN elig ON l_suppkey = s_suppkey
            WHERE p_type = '{_Q2_TYPE}' AND p_size <= {_Q2_MAX_SIZE}
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
        FROM offers o
        WHERE supplycost = (
            SELECT MIN(supplycost) FROM offers i
            WHERE i.p_partkey = o.p_partkey
        )
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS INTEGER)
                   AS o_year,
               CAST(SUM(CAST(FLOOR(
                   ({_DISC} - {_Q9_COST_RATE} * p_retailprice * l_quantity)
                   * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%{_Q9_NAME_FRAG}%'
        GROUP BY 1, 2
    """,
    "q11_important_parts": f"""
        WITH scoped AS (
            SELECT l_partkey, l_extendedprice * l_quantity AS v
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = '{_Q11_NATION}'
        ),
        per_part AS (
            SELECT l_partkey AS p_partkey,
                   CAST(SUM(CAST(FLOOR((v) * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) / 1e2 AS value
            FROM scoped GROUP BY 1
        )
        SELECT p_partkey, value
        FROM per_part
        WHERE value > (
            SELECT CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) / 1e2
                   * {_Q11_FRACTION}
            FROM per_part
        )
        ORDER BY value DESC, p_partkey
    """,
    "q12_priority_lines": f"""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN
                        ('{_HI_PRIO[0]}', '{_HI_PRIO[1]}')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN
                        ('{_HI_PRIO[0]}', '{_HI_PRIO[1]}')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "q20_excess_suppliers": f"""
        WITH scoped AS (
            SELECT l_partkey, l_suppkey, l_quantity
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '{_Q20_NAME_PREFIX}%'
        ),
        per_pair AS (
            SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
            FROM scoped GROUP BY 1, 2
        ),
        per_part AS (
            SELECT l_partkey AS pk,
                   SUM(l_quantity) * {_Q20_SHARE} AS part_threshold
            FROM scoped GROUP BY 1
        ),
        dominant AS (
            SELECT DISTINCT l_suppkey
            FROM per_pair JOIN per_part ON l_partkey = pk
            WHERE supp_qty > part_threshold
        )
        SELECT s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = '{_Q20_NATION}'
          AND s_suppkey IN (SELECT l_suppkey FROM dominant)
        ORDER BY s_name
    """,
}
