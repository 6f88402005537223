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


def dsum_col(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Unaliased :func:`dsum` — for composing into ratios/conditionals where
    the alias goes on the composite expression. Keeping every decimal
    accumulator behind this one definition means a precision change can
    never silently diverge between call sites and their oracle mirrors."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dsum(col: Column | str, alias: str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM of a double column via decimal accumulation.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) AS alias``.
    """
    return dsum_col(col, scale, precision).alias(alias)


def davg(col: Column | str, alias: str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: decimal SUM cast to double, divided by COUNT.

    Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x) AS alias``.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
    return (s / F.count(c)).alias(alias)


def fsum_col(col: Column | str, scale: int = 9) -> Column:
    """Order-independent AND engine-portable SUM of an arbitrary-float
    column via FIXED-POINT integer accumulation: each value is quantized
    with ``floor(x * 10^scale + 0.5)`` — plain IEEE double ops every
    engine performs identically — then summed as exact BIGINTs and
    rescaled.

    Use this instead of :func:`dsum_col` whenever the column can hold
    arbitrary floats (ratios, float32-derived values, distances): coarse
    dyadic inputs (e.g. 0.1494140625 = 153/1024) land EXACTLY on decimal
    half-boundaries where Spark's HALF_UP and DuckDB's HALF_EVEN
    double->decimal casts disagree. Decimal stays correct for
    fixed-2-decimal money columns. Valid for |x| < 2^53 / 10^scale.

    Oracle twin::

        CAST(SUM(CAST(FLOOR(x * 1e<scale> + 0.5) AS BIGINT)) AS DOUBLE)
            / 1e<scale>
    """
    c = F.col(col) if isinstance(col, str) else col
    q = F.floor(
        c.cast("double") * F.lit(float(10**scale)) + F.lit(0.5)
    ).cast("long")
    return F.sum(q).cast("double") / F.lit(float(10**scale))


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


# Which hash backs portable_hash64 by default: 'md5' is DuckDB-reproducible
# (the oracle gate needs bit-identical values in both engines); 'xxhash64'
# is the production swap — same plan shape, JVM-native, an order of
# magnitude cheaper per ROW (end-to-end: 1.2-1.5x measured on the dedup
# suite, widening with data size — see SCALING.md), but not reproducible
# in the SQL oracle. Flip
# once at deployment with set_default_hash_impl('xxhash64'); every MinHash /
# SimHash / bucketing / split call site follows.
_DEFAULT_HASH_IMPL = "md5"


def set_default_hash_impl(impl: str) -> str:
    """Set the process-wide default ('md5' | 'xxhash64'); returns the
    previous value so callers/tests can restore it.

    HAZARD — this hash PARTITIONS PERSISTED DATA. Every split_by_hash
    bucket, dedup fingerprint, and MinHash/SimHash signature computed under
    one impl is incompatible with the other: flipping the default between
    runs silently reassigns every document's train/val/test split (train→test
    contamination) and invalidates stored signatures, with no error anywhere.
    Flip it ONCE at deployment bootstrap, record the choice alongside any
    persisted outputs, and never change it for a corpus that already has
    materialized splits/signatures. Per-call-site ``impl=`` overrides exist
    for mixed regimes. The md5 default is what the DuckDB oracles mirror —
    gated environments must keep it."""
    global _DEFAULT_HASH_IMPL
    if impl not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash impl {impl!r}: use 'md5' or 'xxhash64'")
    prev, _DEFAULT_HASH_IMPL = _DEFAULT_HASH_IMPL, impl
    return prev


def portable_hash64(
    col: Column | str, bits: int = 32, impl: str | None = None
) -> Column:
    """Deterministic non-negative ``bits``-bit integer hash.

    impl='md5' (default): computable identically in DuckDB —
      Spark:  conv(substring(md5(s), 1, k), 16, 10)::long
      DuckDB: CAST('0x' || substr(md5(s), 1, k) AS BIGINT)
    impl='xxhash64': production swap (pmod(xxhash64(s), 2^bits)) — same
      plan shape and value range, ~10x cheaper per row (1.2-1.5x
      end-to-end on the dedup suite, SCALING.md), no SQL-oracle twin.

    Used for MinHash / SimHash / bucketing where determinism matters;
    ``impl=None`` follows the process default (set_default_hash_impl).
    """
    c = F.col(col) if isinstance(col, str) else col
    impl = impl or _DEFAULT_HASH_IMPL
    if impl == "xxhash64":
        return F.pmod(F.xxhash64(c), F.lit(1 << bits)).cast("long")
    k = bits // 4
    return F.conv(F.substring(F.md5(c), 1, k), 16, 10).cast("long")


def portable_hash64_sql(expr: str, bits: int = 32) -> str:
    """DuckDB twin of :func:`portable_hash64`."""
    k = bits // 4
    return f"CAST('0x' || substr(md5({expr}), 1, {k}) AS BIGINT)"
