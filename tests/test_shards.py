"""Training-shard sink tests: balance-by-construction, deterministic
placement and within-shard order, lossless roundtrip, epoch re-salting."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from icenetetl_spark.sources.shards import (
    assign_shards,
    read_training_shards,
    write_training_shards,
)


def _docs(spark, n=103):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
    )


def test_shards_balanced_within_one_row(spark):
    out = assign_shards(_docs(spark, 103), 8, "epoch0:")
    sizes = [r["c"] for r in out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("c")).collect()]
    assert len(sizes) == 8
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == 103


def test_shard_placement_matches_pure_python_model(spark):
    """position = 1-based rank of md5(salt||doc_id) with doc_id tiebreak;
    shard = (position-1) % n — recomputed independently in pure Python."""
    n, k, salt = 50, 4, "epoch3:"
    rows = assign_shards(_docs(spark, n), k, salt).collect()
    order = sorted(
        range(n),
        key=lambda d: (hashlib.md5(f"{salt}{d}".encode()).hexdigest(), d),
    )
    expect = {d: (p + 1, p % k) for p, d in enumerate(order)}
    got = {r["doc_id"]: (r["position"], r["shard"]) for r in rows}
    assert got == expect


def test_write_read_roundtrip_is_lossless_and_ordered(spark, tmp_path):
    docs = _docs(spark, 64)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, 4, "epoch1:")
    back = read_training_shards(spark, path)
    assert back.count() == 64
    assert {r["doc_id"] for r in back.collect()} == set(range(64))
    assert {r["shard"] for r in back.select("shard").distinct().collect()} == {
        0, 1, 2, 3,
    }
    # within-shard file order IS position order (trainer reads sequentially)
    for shard in range(4):
        part = spark.read.parquet(f"{path}/shard={shard}")
        positions = [r["position"] for r in part.collect()]
        assert positions == sorted(positions)


def test_resalt_changes_permutation_deterministically(spark, tmp_path):
    docs = _docs(spark, 64)
    a1 = {(r["doc_id"], r["position"])
          for r in assign_shards(docs, 4, "epoch1:").collect()}
    a2 = {(r["doc_id"], r["position"])
          for r in assign_shards(docs, 4, "epoch2:").collect()}
    a1_again = {(r["doc_id"], r["position"])
                for r in assign_shards(docs, 4, "epoch1:").collect()}
    assert a1 == a1_again
    assert a1 != a2


def test_assign_shards_rejects_bad_count(spark):
    import pytest

    with pytest.raises(ValueError):
        assign_shards(_docs(spark, 4), 0, "s")


def test_assign_shards_refuses_column_collisions(spark):
    """Pre-existing position/shard columns would be silently overwritten
    (corrupting caller data) — refuse instead."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from icenetetl_spark.sources.shards import assign_shards

    base = spark.range(10).selectExpr("id AS doc_id")
    for bad in ("position", "shard", "__shuffle_key"):
        df = base.withColumn(bad, F.lit(1))
        with _pytest.raises(ValueError, match=bad):
            assign_shards(df, 4, "s1")
