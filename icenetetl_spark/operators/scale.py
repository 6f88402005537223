"""Scale-out helpers: the explicit knobs you reach for when AQE's automatic
handling isn't enough at 100 TB — key-salting for skewed joins, posting-list
capping for inverted-index self-joins, bucketed tables for shuffle-free
repeated joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side with a
    uniform random bucket and replicate the small side across all buckets,
    so one hot key spreads over ``salt_buckets`` tasks instead of one.

    AQE's skew-join split handles most cases automatically (enabled in
    session.py); explicit salting remains necessary when the skew is in an
    aggregation-before-join or the small side is too big to broadcast but
    small enough to replicate 16x.

    Only inner/left/left_semi are supported: the replicated right side would
    emit unmatched right rows once PER BUCKET under right/full/anti joins —
    silently wrong, so we refuse.

    The salt is DETERMINISTIC — a hash of the whole row, not rand(): a seeded
    rand() is partition-layout-dependent, so a task retry or upstream
    repartition could re-salt the same row differently mid-job. A row hash is
    retry-stable. Rows identical in every column share a bucket (harmless for
    correctness; spreading only degrades under massive full-row duplication —
    pass a unique id column upstream if that is the actual workload).
    """
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: "
            "the replicated right side breaks right/full/anti semantics"
        )
    salt = F.pmod(F.xxhash64(*skewed.columns), F.lit(salt_buckets)).cast(
        "int"
    ).alias("__salt")
    salted_left = skewed.select("*", salt)
    buckets = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("__salt")
    replicated_right = small.select("*", buckets)
    out = salted_left.join(replicated_right, [*on, "__salt"], how)
    return out.drop("__salt")


def cap_document_frequency(
    postings: DataFrame,
    max_df: int,
    term_col: str = "shingle",
) -> DataFrame:
    """Drop terms whose posting list exceeds ``max_df`` documents before an
    inverted-index self-join (dedup.jaccard_pairs / minhash candidates).

    A boilerplate shingle occurring in 10^6 documents would contribute
    10^12 candidate pairs — the classic quadratic blowup. Capping is both a
    performance guard and standard dedup practice (ubiquitous shingles carry
    no signal).

    Implemented as a count window over ``term_col`` rather than a
    groupBy+join: ONE hash shuffle instead of two, and the output stays
    hash-partitioned by the term — a downstream inverted-index self-join on
    the same key starts from the already-partitioned exchange instead of
    reshuffling (ReuseExchange then shares it across both join sides).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(term_col)
    return (
        postings.withColumn("__df", F.count(F.lit(1)).over(w))
        .filter(F.col("__df") <= max_df)
        .drop("__df")
    )


def _spread_bits(x: F.Column) -> F.Column:
    """Spread the low 32 bits of ``x`` so bit i lands at position 2i (the
    standard mask-shift Morton spread) — pure codegen arithmetic."""
    x = (x.bitwiseOR(F.shiftleft(x, 16))).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x3333333333333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x5555555555555555))
    return x


def morton_code(x: F.Column, y: F.Column) -> F.Column:
    """Interleave the bits of two non-negative bucket ids into one Z-order
    key: points close in BOTH dimensions get close codes, so sorting by the
    code co-locates them — the mechanism behind Delta's OPTIMIZE ZORDER.
    Inputs must already be bounded non-negative ints (bucketed ranks or
    scaled values); see ``zorder_key`` for the scaling wrapper."""
    return _spread_bits(x.cast("long")).bitwiseOR(
        F.shiftleft(_spread_bits(y.cast("long")), 1)
    )


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16
) -> F.Column:
    """Z-order key over two columns: each column is min/max-scaled to a
    ``bits``-bit bucket (one 1-row aggregate collected as metadata — the
    same k-row-driver-state pattern as the prefix-sum operators), then
    Morton-interleaved. Linear scaling assumes roughly uniform columns; for
    heavily skewed ones substitute range-bucketed ranks (what Delta does
    with boundary sampling) — same interleave."""
    if len(cols) != 2:
        raise ValueError("zorder_key interleaves exactly 2 columns")
    # bits=32 would spread a bucket's bit 31 to position 62, and the y side's
    # extra shift lands it on the int64 SIGN bit — high-y rows would sort
    # before low-y ones, silently destroying the clustering. Beyond 32 the
    # spread masks drop bits. 31 is the widest sign-safe width.
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    stats = df.agg(*aggs).collect()[0]
    if any(stats[f"__mn_{c}"] is None or stats[f"__mx_{c}"] is None for c in cols):
        # empty table or an all-null clustering column: nothing to order —
        # a constant key makes cluster_by a no-op instead of a TypeError
        return F.lit(0).cast("long")
    buckets = []
    for c in cols:
        lo, hi = stats[f"__mn_{c}"], stats[f"__mx_{c}"]
        span = max(float(hi) - float(lo), 1e-300)
        scaled = (
            (F.col(c).cast("double") - F.lit(float(lo)))
            / F.lit(span)
            * F.lit((1 << bits) - 1)
        )
        buckets.append(F.floor(scaled).cast("long"))
    return morton_code(buckets[0], buckets[1])


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int = 32,
) -> None:
    """Persist as a bucketed+sorted managed table: repeated equi-joins or
    aggregations on ``keys`` between co-bucketed tables run WITHOUT a
    shuffle (the sort-merge join reads pre-partitioned, pre-sorted buckets).

    This is the Spark equivalent of the co-location the reference gets
    implicitly from Postgres-side joins, and the standing replacement for
    its B-tree indexes on join keys (processor.py:286-288).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a dropped-from-catalog table can leave its managed location behind
    # (e.g. fresh in-memory metastore over a reused warehouse dir)
    import os
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(wh.removeprefix("file:"), table.lower())
    if wh and os.path.isdir(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )
