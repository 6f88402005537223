"""Sampling/splitting/packing operator laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from icenetetl_spark.operators.sampling import (
    pack_contiguous,
    sequential_id,
    split_by_hash,
    stratified_sample,
)


def test_split_covers_all_rows_once(spark):
    df = spark.range(1000).select(F.col("id").alias("k"))
    out = split_by_hash(df, "k", {"train": 80, "val": 10, "test": 10})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 1000
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]


def test_stratified_caps_small_strata(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 50 else "small") for i in range(55)], "k long, s string"
    )
    out = stratified_sample(df, ["s"], 10, "k")
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 10, "small": 5}  # small stratum has only 5


def test_pack_contiguous_invariants_and_partition_independence(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 10).alias("n")
    )
    out = pack_contiguous(df, "n", 256, ["doc_id"], num_partitions=7).collect()
    rows = sorted((r["doc_id"], r["n"], r["pack_id"], r["pack_offset"]) for r in out)
    # offsets are the exact exclusive prefix sums in doc_id order
    acc = 0
    for doc_id, n, pack_id, off in rows:
        assert off == acc
        assert pack_id == acc // 256
        acc += n
    # result independent of partition count
    out3 = pack_contiguous(df, "n", 256, ["doc_id"], num_partitions=3).collect()
    assert rows == sorted(
        (r["doc_id"], r["n"], r["pack_id"], r["pack_offset"]) for r in out3
    )


def test_sequential_id_contiguous_and_ordered(spark):
    """sequential_id must hand out exactly 1..N following the total order,
    for any partition count — the SERIAL contract without the global
    window."""
    df = spark.createDataFrame(
        [((i * 37) % 211, f"r{i}") for i in range(211)], "k long, v string"
    )
    for n_parts in (1, 3, 8):
        out = sequential_id(df, ["k"], id_col="rid", num_partitions=n_parts)
        rows = sorted((r["k"], r["rid"]) for r in out.collect())
        assert [rid for _, rid in rows] == list(range(1, 212))
        # id order == key order
        assert [k for k, _ in rows] == sorted(k for k, _ in rows)


def test_sequential_id_start_offset(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    out = sequential_id(df, ["k"], id_col="rid", start=100)
    assert sorted(r["rid"] for r in out.collect()) == list(range(100, 110))


def test_production_hash_impl_swap(spark):
    """The xxhash64 production swap: same plan shape and value contract
    (deterministic, non-negative, bits-bounded), cheap JVM hash. Split
    fractions stay approximately honored under the swapped hash."""
    from pyspark.sql import functions as F

    from icenetetl_spark.functions.portable import (
        portable_hash64,
        set_default_hash_impl,
    )
    from icenetetl_spark.operators.sampling import split_by_hash

    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    h = df.select(portable_hash64(F.col("k"), bits=32, impl="xxhash64").alias("h"))
    vals = [r["h"] for r in h.collect()]
    assert all(0 <= v < 2**32 for v in vals)
    assert vals == [r["h"] for r in h.collect()]  # deterministic

    prev = set_default_hash_impl("xxhash64")
    try:
        out = split_by_hash(
            df.withColumn("id", F.col("k")), "k",
            {"train": 90, "val": 5, "test": 5},
        )
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert 0.85 <= counts["train"] / 2000 <= 0.95
        assert counts["train"] + counts.get("val", 0) + counts.get("test", 0) == 2000
        # run-to-run determinism under the swapped default
        again = {r["split"]: r["n"] for r in split_by_hash(
            df.withColumn("id", F.col("k")), "k",
            {"train": 90, "val": 5, "test": 5},
        ).groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts == again
    finally:
        set_default_hash_impl(prev)


def test_leakage_safe_split_never_straddles_near_dups(spark):
    from icenetetl_spark.operators.dedup import jaccard_pairs, word_shingles
    from icenetetl_spark.queries.dedup import (
        JACCARD_T,
        _capped_shingles,
        doc_leakage_safe_split,
    )
    from icenetetl_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    split = {
        r["doc_id"]: r["split"]
        for r in doc_leakage_safe_split(spark, sf).collect()
    }
    docs = load_table(spark, sf, "documents")
    assert set(split) == {r["doc_id"] for r in docs.select("doc_id").collect()}
    pairs = jaccard_pairs(
        _capped_shingles(docs), threshold=JACCARD_T
    ).collect()
    assert pairs, "fixture should contain near-dup pairs"
    for r in pairs:
        assert split[r["doc_a"]] == split[r["doc_b"]], (
            f"near-dup pair {r['doc_a']}/{r['doc_b']} straddles splits"
        )
    # all three splits are actually populated
    assert set(split.values()) == {"train", "val", "test"}


def test_source_mixture_counts_and_prefix_containment(spark):
    """Per-source output size == floor(w)*N + round(frac*N); raising a
    weight only ADDS rows for that source (prefix containment of the
    hash-ranked subset — incremental re-mixes stay append-only)."""
    from pyspark.sql import functions as F

    from icenetetl_spark.operators.sampling import source_mixture

    rows = [(i, f"s{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w1 = {"s0": 2.5, "s1": 0.3, "s2": 0.0}  # s3 -> default 1.0
    out = source_mixture(df, "source", w1, "doc_id")
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # 100 docs per source
    assert got == {"s0": 250, "s1": 30, "s3": 100}
    # epochs: s0 docs appear 2 or 3 times, epoch values contiguous from 0
    epochs = (
        out.filter("source = 's0'")
        .groupBy("doc_id")
        .agg(F.count("*").alias("c"), F.max("epoch").alias("m"))
        .collect()
    )
    assert all(r["c"] in (2, 3) and r["m"] == r["c"] - 1 for r in epochs)
    # prefix containment: raising s1's weight keeps every selected doc
    s1_small = {
        r["doc_id"] for r in out.filter("source = 's1'").collect()
    }
    out2 = source_mixture(df, "source", {**w1, "s1": 0.7}, "doc_id")
    s1_big = {r["doc_id"] for r in out2.filter("source = 's1'").collect()}
    assert s1_small < s1_big and len(s1_big) == 70


def test_token_budget_head_boundary_and_monotone(spark):
    """Exclusive-cumsum semantics: the boundary row is included, nothing
    after it; a larger budget strictly extends the same prefix."""
    from icenetetl_spark.operators.sampling import token_budget_head

    df = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, n LONG"
    )
    small = token_budget_head(df, "n", 95, "doc_id")
    rows = sorted(r["cum_end"] for r in small.collect())
    # 10 rows fit: exclusive cumsum of row 10 is 90 < 95 (boundary
    # included), row 11's is 100 -> excluded
    assert rows == [10 * k for k in range(1, 11)]
    big = token_budget_head(df, "n", 200, "doc_id")
    small_ids = {r["doc_id"] for r in small.collect()}
    big_ids = {r["doc_id"] for r in big.collect()}
    assert small_ids < big_ids


def test_source_mixture_refuses_column_collisions(spark):
    """Pre-existing epoch/__rk/__copies columns would be silently
    overwritten (the assign_shards failure mode, ADVICE r8) — refuse."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from icenetetl_spark.operators.sampling import source_mixture

    base = spark.range(10).selectExpr("id AS doc_id", "'a' AS source")
    for bad in ("epoch", "__rk", "__copies"):
        df = base.withColumn(bad, F.lit(1))
        with _pytest.raises(ValueError, match=bad.replace("_", "_")):
            source_mixture(df, "source", {"a": 1.5}, "doc_id")
