"""Approximate aggregates — the 100-TB read path's first reach.

At scale, COUNT(DISTINCT) is a full shuffle of every distinct key and an
exact percentile is a full sort; the sketch forms (HyperLogLog++ for
cardinality, Greenwald-Khanna for quantiles) are one pass, fixed memory,
and map-side combinable. Spark exposes both as built-ins
(``approx_count_distinct``, ``percentile_approx``) — these queries are the
approx twins of ``q16_distinct_suppliers`` and ``a_median_percentile``.

Gating: Spark's HLL++ and DuckDB's HLL hash differently, so the sketch
VALUES can't hash-match an oracle. The registered queries therefore emit
(a) the EXACT aggregate — hash-gated against the oracle like any other
query — and (b) a boolean per sketch asserting the approx value landed
within its documented error bound, which the oracle pins to TRUE. The
bound booleans are deterministic on fixed data (both sketches are
deterministic for a given input), so the gate is stable; the tighter
rank-error contract of percentile_approx is asserted in
tests/test_approx.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from icenetetl_spark.sources.testdata import load_table

# HLL++ with rsd=0.02 has a 3-sigma relative error of 6%; gate at 10% (or
# an absolute slack of 1 for tiny groups, where the sparse representation
# is exact anyway).
HLL_RSD = 0.02
HLL_REL_BOUND = 0.10
# percentile_approx at accuracy=10000 guarantees rank error <= n/10000;
# on the testdata price distributions that is well inside 0.5% in value.
PCTL_ACCURACY = 10000
PCTL_REL_BOUND = 0.005


def approx_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape with an HLL++ twin: exact COUNT(DISTINCT) per group
    (hash-gated) plus a bound flag on approx_count_distinct."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 14, 23, 45)
    )
    li = load_table(spark, sf_dir, "lineitem")
    exact = F.countDistinct("l_suppkey")
    approx = F.approx_count_distinct("l_suppkey", rsd=HLL_RSD)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(
            exact.alias("supplier_cnt"),
            (
                F.abs(approx - exact)
                <= F.greatest(F.lit(1.0), F.lit(HLL_REL_BOUND) * exact)
            ).alias("approx_ok"),
        )
    )


def approx_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a_median_percentile shape with sketch twins: exact interpolated
    median/p90 (hash-gated) plus bound flags on percentile_approx."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    ap50 = F.percentile_approx(price, F.lit(0.5), F.lit(PCTL_ACCURACY))
    ap90 = F.percentile_approx(price, F.lit(0.9), F.lit(PCTL_ACCURACY))
    p50 = F.median(price)
    p90 = F.percentile(price, F.lit(0.9))
    return li.groupBy("l_returnflag").agg(
        p50.alias("median_price"),
        p90.alias("p90_price"),
        (F.abs(ap50 - p50) <= F.lit(PCTL_REL_BOUND) * p50).alias(
            "approx_median_ok"
        ),
        (F.abs(ap90 - p90) <= F.lit(PCTL_REL_BOUND) * p90).alias(
            "approx_p90_ok"
        ),
    )


# heavy hitters over o_orderpriority. freqItems (Karp/Misra-Gries
# streaming summary) keeps a map of floor(1/support) counters, so its
# CONTAINMENT guarantee covers items with frequency > n/floor(1/support)
# — NOT merely > support*n. The "truly frequent" filter below uses the
# map-size threshold, otherwise an item in [support, 1/floor(1/support))
# could legitimately be evicted and flip the oracle-pinned TRUE flag.
HH_SUPPORT = 0.15
_HH_MAP_SIZE = int(1.0 / HH_SUPPORT)  # Spark's sizeOfMap, = 6


def approx_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters — the streaming-sketch side of the approx family.
    The emitted rows are the values above the sketch's guarantee
    threshold with their exact counts (hash-gated, fully lazy plan); the
    booleans assert the sketch's guarantees on them: containment (every
    such value is in the sketch result) and the bounded candidate set.
    Only the fixed-size sketch itself is driver-held (the df.stat API
    returns it eagerly) — same class as partition metadata."""
    orders = load_table(spark, sf_dir, "orders")
    col = "o_orderpriority"
    sketch_items = set(
        orders.stat.freqItems([col], support=HH_SUPPORT).first()[0]
    )
    bounded = len(sketch_items) <= _HH_MAP_SIZE
    total = orders.agg(F.count(F.lit(1)).alias("__total"))
    counts = orders.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") > F.col("__total") / _HH_MAP_SIZE)
        .select(
            col,
            "n",
            F.col(col).isin(sorted(sketch_items)).alias("in_sketch"),
            F.lit(bounded).alias("sketch_bounded"),
        )
    )


QUERIES = {
    "approx_distinct_suppliers": approx_distinct_suppliers,
    "approx_price_percentiles": approx_price_percentiles,
    "approx_heavy_hitters": approx_heavy_hitters,
}

ORACLES = {
    # The oracle recomputes the EXACT aggregates independently and pins the
    # bound flags to TRUE — i.e. the gate is "exact values match AND
    # Spark's sketch landed inside its documented bound".
    "approx_distinct_suppliers": """
        SELECT p_brand, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt,
               TRUE AS approx_ok
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size IN (1, 14, 23, 45)
        GROUP BY p_brand, p_size
    """,
    "approx_price_percentiles": """
        SELECT l_returnflag,
               median(l_extendedprice) AS median_price,
               quantile_cont(l_extendedprice, 0.9) AS p90_price,
               TRUE AS approx_median_ok,
               TRUE AS approx_p90_ok
        FROM lineitem GROUP BY l_returnflag
    """,
    "approx_heavy_hitters": f"""
        SELECT o_orderpriority, count(*) AS n,
               TRUE AS in_sketch, TRUE AS sketch_bounded
        FROM orders
        GROUP BY o_orderpriority
        HAVING count(*) > (SELECT count(*) FROM orders) / {_HH_MAP_SIZE}
    """,
}
