"""Approximate aggregates: the error-bound contracts behind the
approx_* registry queries (queries/approx.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _li(spark):
    return spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")


def test_percentile_approx_rank_error_bound(spark):
    """percentile_approx(accuracy=A) guarantees a rank error <= n/A
    (Greenwald-Khanna): the fraction of rows at or below the returned
    value must sit within [q - 1/A - slack, q + 1/A + slack], slack for
    duplicate values (prices are near-unique here)."""
    acc = 10000
    li = _li(spark)
    for q in (0.5, 0.9):
        per_group = li.groupBy("l_returnflag").agg(
            F.percentile_approx("l_extendedprice", F.lit(q), F.lit(acc)).alias(
                "ap"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        checked = (
            li.join(F.broadcast(per_group), "l_returnflag")
            .groupBy("l_returnflag")
            .agg(
                (
                    F.sum(
                        (F.col("l_extendedprice") <= F.col("ap")).cast("long")
                    )
                    / F.first("n")
                ).alias("frac"),
            )
            .collect()
        )
        for row in checked:
            assert abs(row["frac"] - q) <= 1.0 / acc + 0.005, (q, row)


def test_hll_error_shrinks_with_rsd(spark):
    """approx_count_distinct's relative error tracks the requested rsd:
    at rsd=0.01 the estimate must be at least as close to exact as the
    3-sigma bound; the loose-rsd estimate stays within ITS bound too."""
    li = _li(spark)
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    for rsd in (0.01, 0.05):
        approx = li.select(
            F.approx_count_distinct("l_partkey", rsd=rsd)
        ).first()[0]
        assert abs(approx - exact) <= 3 * rsd * exact, (rsd, approx, exact)


def test_registry_bound_flags_all_true(spark):
    """The registered approx queries' bound booleans must all be TRUE on
    the driver's sf0.01 data (this is exactly what the oracle pins)."""
    from icenetetl_spark.queries.approx import (
        approx_distinct_suppliers,
        approx_price_percentiles,
    )

    sf = "/root/testdata/sf0.01"
    for row in approx_distinct_suppliers(spark, sf).collect():
        assert row["approx_ok"], row
    for row in approx_price_percentiles(spark, sf).collect():
        assert row["approx_median_ok"] and row["approx_p90_ok"], row
