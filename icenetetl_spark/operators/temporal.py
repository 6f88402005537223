"""Temporal joins Spark lacks natively, composed from built-in operators.

``asof_join``: for each left row, attach the most recent right row with
``right.time <= left.time`` within the same key — the point-in-time join of
market data, feature stores, and training-label alignment.

Plan shape (the scalable composition): tag both sides, UNION them, and run
one ``last(value, ignorenulls=True)`` carry-forward window per key ordered
by (time, side) — a single hash-shuffle on the key + per-key sort, identical
cost profile to any windowed aggregation and fully distributed. This beats
the naive theta-join formulation (left ⋈ right on key AND right.t <= left.t,
then max-per-left), which explodes to O(|left| x |right per key|) pairs
before pruning.

The DuckDB oracle uses its *native* ASOF JOIN — two independent
implementations, one semantic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def range_join_points_to_intervals(
    points: DataFrame,
    intervals: DataFrame,
    time_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 300,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Point-in-interval join (t in [start, end]) without a nested-loop
    cross product: quantize time into bins, explode each interval to the
    bins it covers, equi-join points to interval-bins on (keys…, bin), then
    refine with the exact range predicate and dedup.

    Cost: |points| + Σ interval_len/bin rows through ONE hash shuffle —
    the OSS replacement for a range-join hint. Pick ``bin_seconds`` near the
    median interval length: too small explodes interval rows, too large
    inflates the refine fan-in.
    """
    keys = list(keys)
    pts = points.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(time_col).cast("timestamp")) / bin_seconds)
    )
    ivs = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(
                    F.unix_timestamp(F.col(start_col).cast("timestamp")) / bin_seconds
                ),
                F.floor(
                    F.unix_timestamp(F.col(end_col).cast("timestamp")) / bin_seconds
                ),
            )
        ),
    )
    joined = pts.join(ivs, [*keys, "__bin"]).filter(
        (F.col(time_col) >= F.col(start_col)) & (F.col(time_col) <= F.col(end_col))
    )
    return joined.drop("__bin").distinct()


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus for each of ``value_cols``
    the value from the latest ``right`` row at-or-before its time (NULL when
    no such row — left-join semantics).

    ``right`` should be unique per (by, time_col); pre-dedup if not (ties at
    identical timestamps are otherwise order-ambiguous in ANY asof engine).
    """
    by = list(by)
    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = right.select(
        *by, time_col, *[F.col(c).alias(f"__v_{c}") for c in value_cols]
    ).withColumn("__side", F.lit(0))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at equal time -> inclusive (<=) match
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(time_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        u = u.withColumn(
            f"{c}{suffix}", F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w)
        )
    return u.filter(F.col("__side") == 1).drop(
        "__side", *[f"__v_{c}" for c in value_cols]
    )
