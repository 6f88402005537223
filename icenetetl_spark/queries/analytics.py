"""Analytics-breadth queries: ordered statistics, grouping sets, pivot,
string functions — engine vocabulary beyond the reference's surface that any
migrating workload expects. Median/percentile interpolation verified
bit-identical between Spark and DuckDB (both linear-interpolate order stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from icenetetl_spark.functions.portable import fsum_col
from icenetetl_spark.sources.testdata import load_table


def a_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_extendedprice").alias("median_price"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


def a_rollup_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotal rows carry NULL group
    markers; counts at every grouping level."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), fsum_col("l_quantity", 2).alias("sum_qty"))
    )


def a_pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per return flag; oracle expresses the same thing as
    conditional aggregates (the portable form of PIVOT)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("l_quantity").cast("double") * F.lit(1e2)
                        + F.lit(0.5)
                    ).cast("long")
                ).cast("double")
                / F.lit(1e2)
            )
        )
        .withColumnsRenamed({"A": "qty_a", "N": "qty_n", "R": "qty_r"})
    )


def f_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string vocabulary: LIKE pushdown, case mapping, substring,
    concat, replace, length."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_type").like("%BRASS%")).select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.substring("p_brand", 7, 2).alias("brand_code"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.length("p_name").alias("name_len"),
    )


def w_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame (ROWS BETWEEN): 3-order moving average per customer.
    Frame sum via fixed-point BIGINT accumulation / frame count — order-independent and
    engine-exact like every other aggregate here."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    ma = (
        F.sum(
            F.floor(
                F.col("o_totalprice").cast("double") * F.lit(1e2) + F.lit(0.5)
            ).cast("long")
        )
        .over(w)
        .cast("double")
        / F.lit(1e2)
        / F.count(F.lit(1)).over(w)
    )
    return orders.select("o_orderkey", "o_custkey", ma.alias("moving_avg_price"))


def a_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (the relational form of the reference's P3 melt stage):
    two measure columns rotated into (measure, value) rows via the native
    DataFrame.unpivot — a zero-shuffle Expand node, NOT a self-union that
    would scan the table once per measure."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "measure", "value")


def w_lag_lead_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining window vocabulary in one pass: lag/lead/first_value/ntile
    over the per-customer order sequence, rank/dense_rank over price. Both
    window specs share the o_custkey hash partitioning, so the plan is ONE
    shuffle with two sorts — Spark collapses same-partitioning windows into
    adjacent Window nodes over a single exchange."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice", 1).over(seq).alias("prev_price"),
        F.lead("o_totalprice", 1).over(seq).alias("next_price"),
        F.first_value("o_totalprice").over(seq).alias("first_price"),
        F.ntile(4).over(seq).alias("quartile"),
        F.rank().over(price).alias("price_rank"),
        F.dense_rank().over(price).alias("price_dense_rank"),
    )


def w_cume_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution windows (cume_dist / percent_rank) — the last
    window-function family not yet in the vocabulary. Ordering includes
    the unique o_orderkey so tie groups are single rows and both engines
    agree exactly."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
    )


def a_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with grouping_id — completes the
    grouping-sets family beyond a_rollup_grouping (ROLLUP). The bitmask
    disambiguates real NULL group values from subtotal markers."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        fsum_col("l_quantity", 2).alias("sum_qty"),
    )


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality profile of lineitem (operators/quality.py)."""
    from icenetetl_spark.operators.quality import profile

    li = load_table(spark, sf_dir, "lineitem")
    return profile(li, ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"])


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation (operators/quality.expect — the Deequ shape):
    nullability, key uniqueness, and value-range expectations as a
    (check, n_violations) report. Each check is a full-scan aggregate or
    a keyed groupBy — no driver-side row iteration; the report is k rows
    for k checks."""
    from icenetetl_spark.operators.quality import expect

    li = load_table(spark, sf_dir, "lineitem")
    return expect(
        li,
        not_null=["l_orderkey", "l_quantity", "l_shipdate"],
        unique=[["l_orderkey", "l_linenumber"]],
        ranges={"l_quantity": (1.0, 50.0), "l_discount": (0.0, 0.1)},
    )


def dq_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier report (operators/quality.
    outlier_stats): fixed-point moments, E[x²]-E[x]² variance in a fixed
    op order, stats broadcast back for the flag count — the numeric-drift
    check run next to dq_expectations."""
    from icenetetl_spark.operators.quality import outlier_stats

    ev = load_table(spark, sf_dir, "events")
    return outlier_stats(ev, "event_type", "value", z=3.0, scale=6)


QUERIES = {
    "a_median_percentile": a_median_percentile,
    "dq_outliers": dq_outliers,
    "a_rollup_grouping": a_rollup_grouping,
    "a_pivot_returnflag": a_pivot_returnflag,
    "f_string_funcs": f_string_funcs,
    "w_moving_avg": w_moving_avg,
    "w_lag_lead_rank": w_lag_lead_rank,
    "w_cume_percent": w_cume_percent,
    "a_cube_grouping": a_cube_grouping,
    "dq_expectations": dq_expectations,
    "a_unpivot_measures": a_unpivot_measures,
    "dq_profile": dq_profile,
}

ORACLES = {
    # Mirrors quality.outlier_stats: same fixed-point moment sums (scale
    # 6), same divide order, same E[x²]-E[x]² identity and strict->
    # threshold, so the flag decisions agree bitwise.
    "dq_outliers": """
        WITH stats AS (
            SELECT event_type, count(*) AS n,
                   CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT))
                        AS DOUBLE) / 1000000.0 / count(*) AS mean_v,
                   CAST(SUM(CAST(FLOOR(value * value * 1000000.0 + 0.5)
                                 AS BIGINT))
                        AS DOUBLE) / 1000000.0 / count(*) AS ex2
            FROM events GROUP BY event_type
        ),
        s2 AS (
            SELECT event_type, n, mean_v,
                   sqrt(greatest(ex2 - mean_v * mean_v, 0.0)) AS sigma
            FROM stats
        ),
        fl AS (
            SELECT e.event_type,
                   count(*) FILTER (abs(e.value - s.mean_v) > 3.0 * s.sigma)
                       AS n_outliers
            FROM events e JOIN s2 s USING (event_type)
            GROUP BY e.event_type
        )
        SELECT s.event_type, n, mean_v, sigma, n_outliers,
               CAST(n_outliers AS DOUBLE) / CAST(n AS DOUBLE) AS outlier_frac
        FROM s2 s JOIN fl USING (event_type)
    """,
    "a_median_percentile": """
        SELECT l_returnflag,
               median(l_extendedprice) AS median_price,
               quantile_cont(l_extendedprice, 0.9) AS p90_price,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "a_rollup_grouping": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(SUM(CAST(FLOOR(l_quantity * 1e2 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1e2 AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "dq_expectations": """
        SELECT 'not_null:l_orderkey' AS check,
               CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'not_null:l_quantity',
               CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'not_null:l_shipdate',
               CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'unique:l_orderkey,l_linenumber',
               CAST(COALESCE(SUM(__n - 1), 0) AS BIGINT)
        FROM (
            SELECT count(*) AS __n FROM lineitem
            GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
        )
        UNION ALL
        SELECT 'range:l_quantity',
               CAST(SUM(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'range:l_discount',
               CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 0.1
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
    """,
    "w_cume_percent": """
        SELECT o_orderkey, o_orderpriority,
               cume_dist() OVER w AS cd,
               percent_rank() OVER w AS pr
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    """,
    "a_cube_grouping": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               count(*) AS n,
               CAST(SUM(CAST(FLOOR(l_quantity * 1e2 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1e2 AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "a_pivot_returnflag": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN l_returnflag = 'A'
                        THEN CAST(FLOOR(l_quantity * 1e2 + 0.5) AS BIGINT)
                        END) AS DOUBLE) / 1e2 AS qty_a,
               CAST(SUM(CASE WHEN l_returnflag = 'N'
                        THEN CAST(FLOOR(l_quantity * 1e2 + 0.5) AS BIGINT)
                        END) AS DOUBLE) / 1e2 AS qty_n,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(FLOOR(l_quantity * 1e2 + 0.5) AS BIGINT)
                        END) AS DOUBLE) / 1e2 AS qty_r
        FROM lineitem GROUP BY l_linestatus
    """,
    "f_string_funcs": """
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               substring(p_brand, 7, 2) AS brand_code,
               concat_ws('/', p_brand, p_type) AS brand_type,
               replace(p_type, ' ', '_') AS type_slug,
               CAST(length(p_name) AS INTEGER) AS name_len
        FROM part
        WHERE p_type LIKE '%BRASS%'
    """,
    "w_moving_avg": """
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 0.5) AS BIGINT))
                        OVER (
                        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / 1e2
               / COUNT(*) OVER (
                        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS moving_avg_price
        FROM orders
    """,
    "a_unpivot_measures": """
        SELECT p_partkey, 'p_size' AS measure,
               CAST(p_size AS DOUBLE) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE)
        FROM part
    """,
    "w_lag_lead_rank": """
        SELECT o_orderkey, o_custkey,
               lag(o_totalprice, 1) OVER seq AS prev_price,
               lead(o_totalprice, 1) OVER seq AS next_price,
               first_value(o_totalprice) OVER seq AS first_price,
               CAST(ntile(4) OVER seq AS INTEGER) AS quartile,
               CAST(rank() OVER price AS INTEGER) AS price_rank,
               CAST(dense_rank() OVER price AS INTEGER) AS price_dense_rank
        FROM orders
        WINDOW seq AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey),
               price AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    """,
    "dq_profile": " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name, count(*) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM lineitem
        """
        for c in ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]
    ),
}
