"""Partitioning must not change results: the decimal-accumulator design
claims float aggregates are independent of Spark's aggregation order, so
re-running a query under a different shuffle-partition count must produce
BIT-IDENTICAL rows (the property that makes the DuckDB hash gate stable —
and the property a 1000-executor cluster silently breaks if a plain
double SUM sneaks into a gated query)."""

from __future__ import annotations

import pytest

from icenetetl_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.01"

# float-sensitive queries spanning the accumulator styles: decimal SUM,
# per-position vector mean, tempered-rate derivation, BM25 scoring,
# ratio-of-sums
FLOAT_SENSITIVE = [
    "q1_pricing_summary",
    "embedding_centroids",
    "corpus_temperature_mix",
    "text_bm25_topk",
    "q14_promo_effect",
    # round-5 float paths: fixed-point ADC sum under IVF candidate
    # restriction, fixed-point moments + broadcast-back flags, fixed-point
    # LM means, quantized tf-idf ranking, recall ratio-of-counts
    "knn_ivfpq_fixed",
    "dq_outliers",
    "text_bigram_logprob",
    "text_tfidf_keywords",
    "knn_recall_report",
    # round-7 ordering-sensitive paths: the distributed-prefix-sum global
    # shuffle (range partitioner samples boundaries — positions must not
    # depend on how many partitions it lands on), the two-phase sessionize
    # stitch, and the count-based band-bucket cap
    "doc_global_shuffle",
    # BOTH sessionize plans: ev_sessionize is the two-phase stitch (the
    # gated default since round 9 — the ordering-sensitive path), the
    # window twin keeps its row too (round-9 advice: the r9 rename left
    # only the twin covered)
    "ev_sessionize",
    "ev_sessionize_window",
    "dedup_minhash_lsh_capped",
]


@pytest.mark.parametrize("name", FLOAT_SENSITIVE)
def test_results_identical_across_partitionings(spark, name):
    fn = all_queries()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = sorted(map(repr, fn(spark, SF_DIR).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "31")
        b = sorted(map(repr, fn(spark, SF_DIR).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name}: result depends on partition count"
