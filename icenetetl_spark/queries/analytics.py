"""Analytics-breadth queries: ordered statistics, grouping sets, pivot,
string functions — engine vocabulary beyond the reference's surface that any
migrating workload expects. Median/percentile interpolation verified
bit-identical between Spark and DuckDB (both linear-interpolate order stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from icenetetl_spark.functions.portable import dsum
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
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty"))
    )


def a_pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per return flag; oracle expresses the same thing as
    conditional aggregates (the portable form of PIVOT)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
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


QUERIES = {
    "a_median_percentile": a_median_percentile,
    "a_rollup_grouping": a_rollup_grouping,
    "a_pivot_returnflag": a_pivot_returnflag,
    "f_string_funcs": f_string_funcs,
}

ORACLES = {
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
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "a_pivot_returnflag": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN l_returnflag = 'A'
                        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
               CAST(SUM(CASE WHEN l_returnflag = 'N'
                        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
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
}
