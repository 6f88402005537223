"""Training-shard sink: the LAST step of a training-data pipeline — write
the curated corpus as N balanced shard files in a deterministic, epoch-salted
shuffled order, so a training job can stream shard k without coordinating
with the other readers and re-runs produce byte-identical shards.

Design (100 TB posture):
- Order comes from the same distributed prefix sum as ``doc_global_shuffle``
  (``operators/sampling.sequential_id``: range-partition on the salted hash
  key + k-row per-partition offsets) — never a single-partition
  ``row_number`` window.
- Shard assignment is round-robin on the global position
  (``(position-1) % n_shards``), which balances shard sizes to within one
  row BY CONSTRUCTION — no second pass, no sampling, no skew risk: the
  positions are already a permutation, so every shard receives every
  n_shards-th row of the shuffled order.
- The write repartitions BY THE SHARD COLUMN and partitions the output by
  it, so each task writes whole shards and a shard is one directory a
  trainer can own end-to-end. Rows inside a shard are sorted by position,
  making within-shard read order identical across re-runs (parquet keeps
  row order; re-salting re-permutes everything reproducibly).

The reference has no training sink (its sink is Postgres upserts,
azfunctions/InputBlobTrigger/processor.py:249-256); this is part of the
LLM-pipeline extension surface. The shard-assignment arithmetic sits under
the driver's value gate via the ``doc_shard_manifest`` query, whose DuckDB
oracle replays position and shard from the identical md5 ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from icenetetl_spark.operators.sampling import sequential_id


def assign_shards(
    df: DataFrame,
    n_shards: int,
    salt: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add ``position`` (1-based global shuffled order) and ``shard``
    (round-robin over positions) columns. Deterministic in (salt, ids):
    any worker can recompute any row's placement independently.

    Refuses an input that already carries one of the output (or internal)
    column names — silently overwriting caller data is worse than an
    error (ADVICE r7)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    taken = {"position", "shard", "__shuffle_key"} & set(df.columns)
    if taken:
        raise ValueError(
            f"assign_shards would overwrite existing column(s) "
            f"{sorted(taken)}; rename or drop them first"
        )
    keyed = df.withColumn(
        "__shuffle_key",
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
    )
    pos = sequential_id(keyed, ["__shuffle_key", id_col], id_col="position")
    return pos.withColumn(
        "shard", ((F.col("position") - 1) % n_shards).cast("int")
    ).drop("__shuffle_key")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    salt: str,
    id_col: str = "doc_id",
) -> None:
    """Write ``df`` as ``path/shard=k/`` parquet directories, balanced to
    within one row and internally sorted by shuffled position."""
    out = assign_shards(df, n_shards, salt, id_col=id_col)
    # repartitionByRange, not hash repartition: hashing n_shards distinct
    # values into n_shards partitions is balls-in-bins (~37% of tasks
    # would sit idle while others serialize 2-3 whole shards); range
    # partitioning keeps shards MOSTLY one-per-task. Not a guarantee:
    # the range bounds come from sampling, so two adjacent shard ids can
    # occasionally co-locate (ADVICE r7) — correctness of the partitioned
    # write is unaffected (partitionBy splits the files either way), it
    # only costs that task double serialization work.
    (
        out.repartitionByRange(n_shards, "shard")
        .sortWithinPartitions("shard", "position")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def read_training_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read the shard set back; ``shard`` returns as a partition column."""
    return spark.read.parquet(path)
