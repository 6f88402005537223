"""Reference-parity relational operators (SURVEY.md §2) expressed over the
driver's TPC-H-ish testdata, per the mapping in FIXTURES.md §6.

Each query cites the reference operator it re-expresses
(file:line into /root/reference/azfunctions/InputBlobTrigger/).

Scale posture, common to all: filters/projections are written directly against
the parquet scan so Catalyst pushes them down; small dimensions are broadcast
explicitly; aggregations are partial+final hash aggs (no driver collects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from icenetetl_spark.functions.geo import build_cell_grid
from icenetetl_spark.operators.relational import (
    latest_snapshot,
    insert_missing,
    rename_normalize,
)
from icenetetl_spark.sources.testdata import load_table


# --- P1/P2/P5-P8: filter + null-drop + derive + project -----------------
# Reference: processor.py:158-180 (sic_mean>0 mask, dropna, km->m downcast,
# time + leadtime date arithmetic, column drops).
def q_filter_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 25) & F.col("l_shipdate").isNotNull())
        .na.drop(subset=["l_discount", "l_extendedprice"])
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.to_date("l_shipdate").alias("ship_date"),
            F.date_add(F.to_date("l_shipdate"), 30).alias("due_date"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            F.floor(F.col("l_quantity") * 1000).cast("int").alias("qty_milli"),
        )
    )


# --- P4: conditional rename normalization (processor.py:125-133) --------
def q_rename_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Mapping includes a column absent from the input — must be a no-op,
    # exactly like the reference's old-format compatibility shim.
    renamed = rename_normalize(li, {"l_quantity": "qty", "mean": "sic_mean"})
    return renamed.select("l_orderkey", "l_linenumber", "qty")


# --- P9: hemisphere classification routing predicate (processor.py:137-153)
def q_route_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.when(F.col("c_acctbal") > 8000, F.lit("north"))
        .when(F.col("c_acctbal") < 1000, F.lit("south"))
        .when(F.lower(F.col("c_mktsegment")).contains("house"), F.lit("north"))
        .otherwise(F.lit("unknown"))
        .alias("hemisphere"),
    )


# --- J1: broadcast left equi-join on composite-ish key (processor.py:314-321)
# The reference pre-loads the small cell table and pandas-hash-joins each
# batch against it — i.e. a hand-rolled broadcast hash join.
def q_broadcast_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left"
    ).select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")


# --- J2: inner enrich join (matview join, processor.py:427-429) ---------
def q_inner_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.to_date("o_orderdate").alias("order_date"),
            "p_brand",
            "l_quantity",
        )
    )


# --- J3/A3: latest-snapshot scalar-subquery filter (processor.py:430) ---
def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return latest_snapshot(orders, "o_orderdate").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("order_date")
    )


# --- J4: insert-anti-join dedup-on-write (ON CONFLICT DO NOTHING,
#     processor.py:249-256, 326-333) --------------------------------------
def q_anti_join_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    incoming = orders.filter(F.col("o_totalprice") > 200000)
    return insert_missing(incoming, existing, ["o_orderkey"]).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# --- J5 + A6 + F1/F2: grid generation cross join + spacing + WKT --------
# Reference: processor.py:218-236 (nested loops + shapely) -> cross join of
# distinct centroid frames + column-arithmetic WKT.
def q_grid_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    xs = nation.select((F.col("n_nationkey") * 25000).alias("centroid_x")).distinct()
    ys = region.select((F.col("r_regionkey") * 25000).alias("centroid_y")).distinct()
    return build_cell_grid(xs, ys).drop("half_step")


# --- A1: meta rollup group-by MIN/MAX/COUNT (processor.py:375-394) ------
def q_meta_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min(F.to_date("l_shipdate")).alias("first_ship"),
        F.max(F.to_date("l_shipdate")).alias("last_ship"),
        F.count(F.lit(1)).alias("n_records"),
    )


# --- A4/A5: distinct (processor.py:369,431) -----------------------------
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderpriority").distinct()


# --- A6: grid-spacing statistic (utils.py:47-48) ------------------------
def q_grid_spacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    distinct_sizes = part.select("p_size").distinct()
    return distinct_sizes.agg(
        ((F.max("p_size") - F.min("p_size")).cast("double") / (F.count("p_size") - 1)).alias(
            "mean_step"
        )
    )


# --- W1: deterministic row_number surrogate id (processor.py:420) -------
# The reference's matview row_number has NO ORDER BY (nondeterministic); we
# add explicit ordering keys — documented deviation per SURVEY §7 hard-part 1.
def q_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey", "o_custkey", F.row_number().over(w).alias("forecast_id")
    )


QUERIES = {
    "p_filter_derive": q_filter_derive,
    "p_rename_normalize": q_rename_normalize,
    "p_route_classify": q_route_classify,
    "j1_broadcast_left_join": q_broadcast_left_join,
    "j2_inner_enrich": q_inner_enrich,
    "j3_latest_snapshot": q_latest_snapshot,
    "j4_anti_join_upsert": q_anti_join_upsert,
    "j5_grid_wkt": q_grid_wkt,
    "a1_meta_rollup": q_meta_rollup,
    "a4_distinct": q_distinct,
    "a6_grid_spacing": q_grid_spacing,
    "w1_row_number": q_row_number,
}

ORACLES = {
    "p_filter_derive": """
        SELECT l_orderkey, l_linenumber, l_quantity,
               CAST(l_shipdate AS DATE) AS ship_date,
               CAST(l_shipdate AS DATE) + 30 AS due_date,
               l_extendedprice * (1 - l_discount) AS net_price,
               CAST(FLOOR(l_quantity * 1000) AS INTEGER) AS qty_milli
        FROM lineitem
        WHERE l_quantity > 25 AND l_shipdate IS NOT NULL
          AND l_discount IS NOT NULL AND l_extendedprice IS NOT NULL
    """,
    "p_rename_normalize": """
        SELECT l_orderkey, l_linenumber, l_quantity AS qty FROM lineitem
    """,
    "p_route_classify": """
        SELECT c_custkey,
               CASE WHEN c_acctbal > 8000 THEN 'north'
                    WHEN c_acctbal < 1000 THEN 'south'
                    WHEN lower(c_mktsegment) LIKE '%house%' THEN 'north'
                    ELSE 'unknown' END AS hemisphere
        FROM customer
    """,
    "j1_broadcast_left_join": """
        SELECT o_orderkey, o_custkey, c_name, c_mktsegment
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    "j2_inner_enrich": """
        SELECT l_orderkey, l_linenumber, CAST(o_orderdate AS DATE) AS order_date,
               p_brand, l_quantity
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
    """,
    "j3_latest_snapshot": """
        SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date
        FROM orders
        WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)
    """,
    "j4_anti_join_upsert": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders incoming
        WHERE o_totalprice > 200000
          AND NOT EXISTS (
            SELECT 1 FROM orders existing
            WHERE existing.o_orderdate < DATE '1998-01-01'
              AND existing.o_orderkey = incoming.o_orderkey)
    """,
    "j5_grid_wkt": """
        WITH xs AS (SELECT DISTINCT n_nationkey * 25000 AS centroid_x FROM nation),
             ys AS (SELECT DISTINCT r_regionkey * 25000 AS centroid_y FROM region),
             sx AS (SELECT CAST(max(centroid_x) - min(centroid_x) AS DOUBLE)
                           / (count(*) - 1) AS step_x FROM xs),
             sy AS (SELECT CAST(max(centroid_y) - min(centroid_y) AS DOUBLE)
                           / (count(*) - 1) AS step_y FROM ys)
        SELECT CAST(centroid_x AS INTEGER) AS centroid_x,
               CAST(centroid_y AS INTEGER) AS centroid_y,
               printf('POLYGON((%d %d, %d %d, %d %d, %d %d, %d %d))',
                      centroid_x - h, centroid_y + h,
                      centroid_x + h, centroid_y + h,
                      centroid_x + h, centroid_y - h,
                      centroid_x - h, centroid_y - h,
                      centroid_x - h, centroid_y + h) AS geom_laea_wkt
        FROM xs, ys,
             (SELECT CAST((step_x + step_y) / 2 / 2 AS BIGINT) AS h FROM sx, sy)
    """,
    "a1_meta_rollup": """
        SELECT l_returnflag,
               CAST(min(l_shipdate) AS DATE) AS first_ship,
               CAST(max(l_shipdate) AS DATE) AS last_ship,
               count(*) AS n_records
        FROM lineitem GROUP BY l_returnflag
    """,
    "a4_distinct": """
        SELECT DISTINCT o_orderpriority FROM orders
    """,
    "a6_grid_spacing": """
        SELECT CAST(max(p_size) - min(p_size) AS DOUBLE) / (count(*) - 1) AS mean_step
        FROM (SELECT DISTINCT p_size FROM part)
    """,
    "w1_row_number": """
        SELECT o_orderkey, o_custkey,
               CAST(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS INTEGER)
                   AS forecast_id
        FROM orders
    """,
}
