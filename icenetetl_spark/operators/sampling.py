"""Deterministic sampling & splitting for training-data pipelines.

Random sampling is the wrong tool at 100 TB: non-reproducible across
retries, unstable under re-partitioning, and impossible to audit. These
operators key every decision on a content/ID hash, so the same row always
lands in the same split on any cluster, any run — and the DuckDB oracle can
reproduce the assignment bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from icenetetl_spark.functions.portable import portable_hash64


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the portable hash of ``key``.
    (Production swap: xxhash64 — same note as every portable-hash site.)"""
    return portable_hash64(key.cast("string"), bits=32) % buckets


def split_by_hash(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, int],
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash-bucket ranges, e.g.
    ``{"train": 90, "val": 5, "test": 5}`` (percentages, must sum to 100).
    Keying on a stable ID (or content fingerprint — which also keeps
    near-identical dups out of both train AND test) makes the split a pure
    function of the data."""
    assert sum(fractions.values()) == 100, "fractions must sum to 100"
    bucket = hash_bucket(F.col(key_col), 100)
    expr = None
    lo = 0
    for name, pct in fractions.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += pct
    return df.withColumn(split_col, expr)


def _range_partition_pinned(
    df: DataFrame, order_by: Sequence[str], num_partitions: int | None
) -> DataFrame:
    """Range-partition + sort on the order keys, tag ``__pid``, and PIN the
    result with an eager localCheckpoint. The pin matters: RangePartitioner
    samples boundaries with a per-execution seed, so without it the
    offsets-collect job and the downstream result job could assign rows to
    different ``__pid``s — silently misaligning the prefix sum. Checkpointing
    makes both jobs read the same materialized partitions (same pattern as
    connected_components' lineage truncation).

    Cluster note: ``localCheckpoint`` stores UNREPLICATED executor-local
    blocks — if an executor is lost (dynamic allocation, preemption) the
    pinned partitions are unrecoverable and the job fails. On a real cluster
    swap to reliable ``df.checkpoint()`` with
    ``sparkContext.setCheckpointDir`` on HDFS/object storage: same pinning
    semantics, fault-tolerant, one extra write. localCheckpoint is chosen
    here because the single-JVM test environment has no checkpoint dir and
    cannot lose executors."""
    order_cols = [F.col(c) for c in order_by]
    n = num_partitions or max(df.sparkSession.sparkContext.defaultParallelism, 2)
    part = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    return part.localCheckpoint(eager=True)


def _with_offset(part: DataFrame, totals: dict[int, int]) -> DataFrame:
    """Join the exclusive prefix offsets (k driver rows, k = #partitions —
    metadata, not data) back onto ``part`` as ``__off`` via a BROADCAST join
    on __pid. A nested CASE expression would grow linearly deep with the
    partition count (thousands of WHEN branches at cluster scale — codegen
    blowup); the broadcast hash join is O(1) depth regardless of k."""
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    spark = part.sparkSession
    off_df = spark.createDataFrame(
        offsets or [], schema="__pid int, __off long"
    )
    # inner join is exact: the offsets are computed FROM part's own pids,
    # so every row's __pid is covered (empty partitions contribute no rows)
    return part.join(F.broadcast(off_df), "__pid")


def pack_contiguous(
    df: DataFrame,
    size_col: str,
    window: int,
    order_by: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign rows to fixed-budget packs by running-sum position: row i goes
    to pack floor(exclusive_cumsum / window) in the given deterministic
    order — the relational form of contiguous sequence packing for training
    batches (greedy first-fit is inherently sequential; contiguous packing
    is its standard distributed approximation).

    Implemented as a DISTRIBUTED PREFIX SUM — a global-ORDER BY window would
    drag every row into one partition (Spark even warns). Instead:
    range-partition on the order keys (pinned — see _range_partition_pinned),
    cumsum within each partition, and add each partition's starting offset.
    Output is identical to the sequential definition and independent of the
    partitioning.

    Adds ``pack_id`` and ``pack_offset`` (row's start in the global stream).
    """
    order_cols = [F.col(c) for c in order_by]
    part = _range_partition_pinned(df, order_by, num_partitions)
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_local = part.withColumn(
        "__cum", F.sum(F.col(size_col).cast("long")).over(w)
    )
    totals = {
        r["__pid"]: r["t"]
        for r in part.groupBy("__pid")
        .agg(F.sum(F.col(size_col).cast("long")).alias("t"))
        .collect()
    }
    cum_exclusive = F.col("__off") + F.col("__cum") - F.col(size_col)
    return (
        _with_offset(with_local, totals)
        .withColumn("pack_id", F.floor(cum_exclusive / window).cast("long"))
        .withColumn("pack_offset", cum_exclusive.cast("long"))
        .drop("__pid", "__cum", "__off")
    )


def sequential_id(
    df: DataFrame,
    order_by: Sequence[str],
    id_col: str = "id",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous ``start..start+N-1`` ids in the given total order — the
    SERIAL / ``row_number() OVER (ORDER BY ...)`` contract — WITHOUT the
    single-partition global window (WindowExec would move every row to one
    task; at 100 TB that is the whole table through one executor).

    Same distributed prefix sum as :func:`pack_contiguous`: partition-local
    ``row_number`` plus a k-row per-partition count offset. The order keys
    must be a total order (ties broken by a unique column) for the ids to be
    deterministic."""
    order_cols = [F.col(c) for c in order_by]
    part = _range_partition_pinned(df, order_by, num_partitions)
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    counts = {
        r["__pid"]: r["c"]
        for r in part.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    numbered = part.withColumn("__rn", F.row_number().over(w).cast("long"))
    return (
        _with_offset(numbered, counts)
        .withColumn(
            id_col,
            (F.col("__off") + F.col("__rn") + F.lit(start - 1)).cast("long"),
        )
        .drop("__pid", "__rn", "__off")
    )


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    n_per_stratum: int,
    key_col: str,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by hash ranking — deterministic, shuffle-partitioned by
    stratum, no driver-side sampling state."""
    w = Window.partitionBy(*strata).orderBy(
        portable_hash64(F.col(key_col).cast("string"), bits=32), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def source_mixture(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    key_col: str,
    default_weight: float = 1.0,
) -> DataFrame:
    """Weighted data-mixture materialization (the Pile / LLaMA-recipe
    source reweighting): source s with N_s rows contributes
    ``round(w_s * N_s)`` examples — upsampled sources (w > 1) repeat whole
    epochs plus a deterministic fractional subset, downsampled sources
    (w < 1) keep a deterministic subset, w == 0 drops the source. Adds an
    ``epoch`` column (0-based copy index) so a downstream shuffle/pack can
    interleave repeats instead of streaming them back-to-back.

    Determinism: rows within a source are ranked by
    ``(portable_hash64(key), key)`` — re-runs and the SQL oracle reproduce
    the same subset; changing nothing but ``weights`` preserves prefix
    containment per source (a rank-k row stays selected when the target
    only grows), which keeps incremental re-mixes append-only.

    Plan: one rank window per source (hash-shuffle on the source key —
    the stratified_sample pattern) and an explode over
    ``sequence(0, copies-1)``; no driver state, no collect. The epoch
    fan-out multiplies rows by at most ``ceil(max(w))`` — the output is
    the mixture's actual size, there is nothing smaller to materialize.
    """
    from icenetetl_spark.functions.portable import portable_hash64

    # refuse inputs already carrying the output/internal column names —
    # silently overwriting caller data is worse than an error (the
    # assign_shards lesson, ADVICE r7/r8)
    taken = {"epoch", "__rk", "__copies"} & set(df.columns)
    if taken:
        raise ValueError(
            f"source_mixture would overwrite existing column(s) "
            f"{sorted(taken)}; rename or drop them first"
        )

    wmap = F.create_map(
        *[
            x
            for k, v in sorted(weights.items())
            for x in (F.lit(k), F.lit(float(v)))
        ]
    )
    w = F.coalesce(wmap[F.col(source_col)], F.lit(float(default_weight)))
    rk_w = Window.partitionBy(source_col).orderBy(
        portable_hash64(F.col(key_col).cast("string"), bits=32), F.col(key_col)
    )
    cnt_w = Window.partitionBy(source_col)
    full = F.floor(w).cast("long")
    n_s = F.count(F.lit(1)).over(cnt_w)
    # fractional target: round-half-up of frac * N_s, deterministic
    n_frac = F.floor((w - full) * n_s + F.lit(0.5)).cast("long")
    ranked = df.withColumn("__rk", F.row_number().over(rk_w)).withColumn(
        "__copies",
        full + F.when(F.col("__rk") <= n_frac, F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        ranked.filter(F.col("__copies") > 0)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(0), (F.col("__copies") - 1).cast("int"))),
        )
        .drop("__rk", "__copies")
    )


def token_budget_head(
    df: DataFrame,
    size_col: str,
    budget: int,
    key_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """The first rows of the hash-shuffled corpus whose cumulative
    ``size_col`` stays within ``budget`` — "give me a deterministic ~N-token
    slice of the corpus" (ablation runs, curriculum stages, debug
    subsets). A row is kept iff the EXCLUSIVE running sum before it is
    < budget, so the head always includes the boundary row and is
    non-empty for any positive budget; rows are returned with their
    ``cum_end`` (inclusive running total) for downstream bookkeeping.

    Order is ``(portable_hash64(key), key)`` — the same epoch-salt-free
    shuffled order doc_global_shuffle uses, so the slice is an unbiased
    sample, stable across re-runs, and PREFIX-MONOTONE in the budget: a
    bigger budget strictly extends the same sequence (token-count
    curricula compose). Plan: the pack_contiguous distributed prefix sum
    (range partition on the hash key + k-row offsets) — never a
    single-partition global window.
    """
    from icenetetl_spark.functions.portable import portable_hash64

    hashed = df.withColumn(
        "__h", portable_hash64(F.col(key_col).cast("string"), bits=32)
    )
    packed = pack_contiguous(
        hashed,
        size_col=size_col,
        window=budget,
        order_by=["__h", key_col],
        num_partitions=num_partitions,
    )
    return (
        packed.filter(F.col("pack_offset") < budget)
        .withColumn(
            "cum_end",
            (F.col("pack_offset") + F.col(size_col).cast("long")),
        )
        .drop("__h", "pack_id", "pack_offset")
    )
