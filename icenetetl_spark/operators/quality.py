"""Data-quality profiling and expectation checks — the validation layer a
training-data pipeline runs before anything expensive (decode, dedup,
training) touches a batch.

All checks compile to ONE aggregation pass over the input (no per-check
scans): a single groupBy-less agg with per-column expressions, so profiling
100 TB costs one read. The report comes back long-form (column, metric,
value) for easy thresholding/alerting joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Long-form profile: (col_name, n_rows, n_null, n_distinct, min, max).

    min/max stringified so heterogeneous column types share one schema —
    profile output is for humans/thresholds, not further arithmetic.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    pieces = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            F.col(f"__dist_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*pieces)).alias("p")).select("p.*")


def expect(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[Sequence[str]] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Expectation report: (check, n_violations). Empty-violation rows are
    kept so the report schema is stable for alert joins."""
    checks = []
    for c in not_null:
        checks.append(
            df.agg(
                F.lit(f"not_null:{c}").alias("check"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_violations"),
            )
        )
    for key in unique:
        key = list(key)
        dup = (
            df.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .agg(
                F.lit("unique:" + ",".join(key)).alias("check"),
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                .cast("long")
                .alias("n_violations"),
            )
        )
        checks.append(dup)
    for c, (lo, hi) in (ranges or {}).items():
        checks.append(
            df.agg(
                F.lit(f"range:{c}").alias("check"),
                F.sum(
                    F.when((F.col(c) < lo) | (F.col(c) > hi), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_violations"),
            )
        )
    if not checks:
        # Stable empty report: same (check, n_violations) schema for joins.
        return df.sparkSession.createDataFrame(
            [], "check string, n_violations long"
        )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z: float = 3.0,
    scale: int = 6,
) -> DataFrame:
    """Per-group z-score outlier report: ``(group, n, mean_v, sigma,
    n_outliers, outlier_frac)`` with |x - mean| > z*sigma as the outlier
    rule — the numeric-drift check a DQ gate runs next to ``expect``.

    Two passes, both distributed: one partial-aggregated groupBy computes
    the moments, then the k-row stats frame broadcasts back onto the scan
    for the outlier count (never a window over the data). Moments use
    fixed-point sums (functions.portable.fsum_col) so the report is
    order-independent and engine-portable; variance is the E[x²]-E[x]²
    identity evaluated in a fixed op order. The fixed-point bound
    n * max(x²) * 10^scale < 2^63 holds comfortably here (x <= ~6e2,
    scale 6); for wider domains lower ``scale`` or pre-scale the column.
    """
    from icenetetl_spark.functions.portable import fsum_col

    n = F.count(F.lit(1))
    stats = df.groupBy(group_col).agg(
        n.alias("n"),
        (fsum_col(value_col, scale) / n).alias("mean_v"),
        (
            fsum_col(F.col(value_col) * F.col(value_col), scale) / n
        ).alias("ex2"),
    ).select(
        group_col,
        "n",
        "mean_v",
        F.sqrt(
            F.greatest(
                F.col("ex2") - F.col("mean_v") * F.col("mean_v"), F.lit(0.0)
            )
        ).alias("sigma"),
    )
    flagged = (
        df.select(group_col, value_col)
        .join(F.broadcast(stats), group_col)
        .groupBy(group_col)
        .agg(
            F.count(
                F.when(
                    F.abs(F.col(value_col) - F.col("mean_v"))
                    > F.lit(z) * F.col("sigma"),
                    1,
                )
            ).alias("n_outliers")
        )
    )
    return stats.join(flagged, group_col).select(
        group_col,
        "n",
        "mean_v",
        "sigma",
        "n_outliers",
        (F.col("n_outliers").cast("double") / F.col("n").cast("double")).alias(
            "outlier_frac"
        ),
    )


def drift_psi(
    df: DataFrame,
    group_col: str,
    value_col: str,
    period: Column,
    lo: float = 0.0,
    hi: float = 500.0,
    n_bins: int = 10,
    smooth: float = 0.5,
    quant: int = 9,
    threshold: float = 0.2,
) -> DataFrame:
    """Per-group population stability index between two periods — the
    standard production drift monitor (PSI; > 0.2 = significant shift).

    ``period`` is a boolean column: False = baseline window (A), True =
    current window (B). Bins are FIXED-WIDTH over [lo, hi) with clamped
    edges — data-independent, so the report is deterministic and the
    DuckDB oracle reproduces it (quantile bins would couple the histogram
    to a global sort). Missing (group, bin) cells are restored from an
    exploded grid (types x bins, broadcast nested-loop on two tiny sides)
    and Laplace-smoothed so empty bins contribute finite terms.

    Output: (group, n_a, n_b, psi, drifted). PSI terms are quantized at
    10^-quant before the sum (BIGINT accumulation — order-independent;
    also absorbs the 1-ulp Java-vs-libm ln() divergence, the
    text_tfidf_keywords precedent). One data-sized groupBy is the only
    corpus shuffle; everything after runs on groups x bins rows.
    """
    spark = df.sparkSession
    width = (hi - lo) / n_bins
    q = float(10**quant)
    bin_expr = (
        F.least(
            F.greatest(
                F.floor(
                    (F.col(value_col).cast("double") - F.lit(lo))
                    / F.lit(width)
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(n_bins - 1),
        )
    )
    counts = (
        df.select(F.col(group_col), bin_expr.alias("bin"), period.alias("is_b"))
        .groupBy(group_col, "bin")
        .agg(
            F.count(F.when(~F.col("is_b"), 1)).alias("cnt_a"),
            F.count(F.when(F.col("is_b"), 1)).alias("cnt_b"),
        )
    )
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    grid = df.select(group_col).distinct().crossJoin(F.broadcast(bins))
    filled = (
        grid.join(counts, [group_col, "bin"], "left")
        .select(
            group_col,
            "bin",
            F.coalesce("cnt_a", F.lit(0).cast("long")).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0).cast("long")).alias("cnt_b"),
        )
    )
    tot = filled.groupBy(group_col).agg(
        F.sum("cnt_a").alias("tot_a"), F.sum("cnt_b").alias("tot_b")
    )
    pa = (F.col("cnt_a").cast("double") + F.lit(smooth)) / (
        F.col("tot_a").cast("double") + F.lit(smooth * n_bins)
    )
    pb = (F.col("cnt_b").cast("double") + F.lit(smooth)) / (
        F.col("tot_b").cast("double") + F.lit(smooth * n_bins)
    )
    term_q = F.floor((pa - pb) * F.log(pa / pb) * F.lit(q) + F.lit(0.5)).cast(
        "long"
    )
    return (
        filled.join(F.broadcast(tot), group_col)
        .groupBy(group_col)
        .agg(
            F.max("tot_a").alias("n_a"),
            F.max("tot_b").alias("n_b"),
            (F.sum(term_q).cast("double") / F.lit(q)).alias("psi"),
        )
        .withColumn("drifted", F.col("psi") > F.lit(threshold))
    )
