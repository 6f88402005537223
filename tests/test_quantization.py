"""Int8 scalar quantization: error bounds, edge cases, and ANN recall
vs the exact float top-k."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from icenetetl_spark.operators.quantization import (
    knn_int8,
    quantize_int8,
    reconstruction_report,
)
from icenetetl_spark.operators.similarity import knn_bruteforce
from icenetetl_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_codes_bounded_and_scale_nonneg(spark):
    rows = quantize_int8(load_table(spark, SF_DIR, "embeddings")).collect()
    assert rows
    for r in rows:
        assert r["scale"] >= 0.0
        assert all(-127 <= c <= 127 for c in r["codes"])
        # the max-|x| element must land on +/-127
        assert max(abs(c) for c in r["codes"]) == 127 or r["scale"] == 0.0


def test_matches_numpy_quantizer(spark):
    df = load_table(spark, SF_DIR, "embeddings").limit(50)
    got = {r["vec_id"]: (r["scale"], r["codes"]) for r in quantize_int8(df).collect()}
    for r in df.collect():
        x = np.asarray(r["embedding"], dtype=np.float64)
        scale = np.abs(x).max() / 127.0
        codes = (
            np.zeros(len(x), dtype=int)
            if scale == 0
            else np.floor(x / scale + 0.5).astype(int)
        )
        assert got[r["vec_id"]][0] == pytest.approx(scale, abs=0)
        assert list(codes) == got[r["vec_id"]][1]


def test_zero_vector_quantizes_to_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [0.0, 1.0, -1.0, 0.5, 0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert rows[1]["scale"] == 0.0
    assert rows[1]["codes"] == [0] * 8
    assert rows[2]["codes"][1] == 127 and rows[2]["codes"][2] == -127
    assert rows[2]["codes"][3] == 64  # floor(0.5*127/1 + .5) = floor(64.0)


def test_reconstruction_error_bounded_by_half_step(spark):
    # |x - code*scale| <= scale/2 per element, so the mean is too
    rows = reconstruction_report(
        load_table(spark, SF_DIR, "embeddings")
    ).collect()
    for r in rows:
        assert r["mean_abs_err"] <= r["scale"] / 2 + 1e-9


def test_int8_recall_vs_exact(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(queries, emb, k=5).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_int8(queries, emb, k=5).collect()
    }
    recall = len(exact & quant) / len(exact)
    # int8 on d=64 keeps dot products within ~1% — top-5 overlap stays high.
    # NOTE: scoring differs from cosine by the per-vector norm; the corpus
    # here is near-unit-norm so dot ~ cos. Assert a conservative floor.
    assert recall >= 0.8, recall


def test_knn_int8_deterministic(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    a = sorted(map(tuple, knn_int8(queries, emb, k=5).collect()))
    b = sorted(
        map(tuple, knn_int8(queries.repartition(7), emb.repartition(3), k=5).collect())
    )
    assert a == b
