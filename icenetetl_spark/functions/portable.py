"""Column expressions whose results are bit-identical across Spark and the
DuckDB oracle — the correctness gate hashes values, so aggregates must be
order-independent and engine-independent.

Key idea: floating-point SUM is order-dependent (Spark sums per partition then
merges; DuckDB sums in its own order), so every SUM/AVG over doubles goes
through an exact DECIMAL accumulator (associative + commutative), then back to
double. Per-row arithmetic (x*(1-d), comparisons) is IEEE-identical everywhere
and stays raw double.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dsum(col: Column | str, alias: str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM of a double column via decimal accumulation.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) AS alias``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: decimal SUM cast to double, divided by COUNT.

    Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x) AS alias``.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
    return (s / F.count(c)).alias(alias)


def epoch_bucket(ts: Column | str, seconds: int, alias: str) -> Column:
    """Tumbling-window bucket as epoch seconds (BIGINT) — timezone-proof.

    Equivalent of ``F.window(ts, ...)`` for oracle comparison; session TZ is
    pinned to UTC (session.py) so naive timestamps round-trip identically.
    Oracle twin: ``CAST(FLOOR(EPOCH(ts)/N)*N AS BIGINT)``.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return (F.floor(F.unix_timestamp(c.cast("timestamp")) / seconds) * seconds).cast(
        "long"
    ).alias(alias)


def portable_hash64(col: Column | str, bits: int = 32) -> Column:
    """Deterministic non-negative integer hash computable identically in
    DuckDB: integer value of the first ``bits/4`` hex chars of md5.

    Spark:  conv(substring(md5(s), 1, k), 16, 10)::long
    DuckDB: CAST('0x' || substr(md5(s), 1, k) AS BIGINT)

    Used for MinHash / SimHash / bucketing where both engines must agree.
    (At 100 TB scale prefer ``F.xxhash64`` — same plan shape, cheaper hash;
    md5 is chosen here only because DuckDB can reproduce it.)
    """
    c = F.col(col) if isinstance(col, str) else col
    k = bits // 4
    return F.conv(F.substring(F.md5(c), 1, k), 16, 10).cast("long")


def portable_hash64_sql(expr: str, bits: int = 32) -> str:
    """DuckDB twin of :func:`portable_hash64`."""
    k = bits // 4
    return f"CAST('0x' || substr(md5({expr}), 1, {k}) AS BIGINT)"
