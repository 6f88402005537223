"""Streaming corpus ingest: dedup + quality filter + idempotent sink."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from icenetetl_spark.catalog import ParquetCatalog
from icenetetl_spark.streaming.corpus_stream import (
    prepare_documents,
    start_corpus_stream,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("text", StringType()),
    ]
)

GOOD = "the quick brown fox jumps over the lazy dog near the old river bank"
SPAM = "spam spam spam spam spam spam spam spam spam spam spam spam"


def _docs(spark, base, ids_texts):
    return spark.createDataFrame(
        [(i, base + timedelta(seconds=i), t) for i, t in ids_texts], SCHEMA
    )


def test_corpus_stream_dedup_filter_idempotent(spark, tmp_path):
    base = datetime(2024, 1, 1, 12, 0, 0)
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    # chunk1: two distinct good docs, one duplicated in-chunk, one spam doc
    c1 = _docs(spark, base, [
        (1, GOOD), (2, GOOD + " again today"), (3, GOOD), (4, SPAM),
    ])
    # chunk2: cross-chunk duplicate of doc 1 + one new good doc + spam
    c2 = _docs(spark, base, [
        (10, GOOD), (11, GOOD + " by the quiet green hill path"), (12, SPAM),
    ])
    c1.coalesce(1).write.parquet(os.path.join(input_dir, "chunk1"))
    c2.coalesce(1).write.parquet(os.path.join(input_dir, "chunk2"))

    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    q = start_corpus_stream(spark, input_dir + "/*/", wh, ckpt, SCHEMA)
    q.awaitTermination(120)

    cat = ParquetCatalog(spark, wh)
    corpus = cat.read("corpus")
    rows = {r["doc_id"]: r for r in corpus.collect()}
    # batch twin: same transform + fingerprint dedup over the union
    twin = prepare_documents(c1.unionByName(c2)).dropDuplicates(["fingerprint"])
    assert corpus.count() == twin.count() == 3
    # spam filtered, duplicates collapsed to first arrival
    assert set(rows) == {1, 2, 11}
    assert corpus.select("fingerprint").distinct().count() == 3
    assert all(r["quality"] >= 0.5 for r in rows.values())

    # restart with the same checkpoint and no new files: no-op
    before = sorted(rows)
    q2 = start_corpus_stream(spark, input_dir + "/*/", wh, ckpt, SCHEMA)
    q2.awaitTermination(120)
    assert sorted(r["doc_id"] for r in cat.read("corpus").collect()) == before

    # a NEW file carrying already-seen content: the sink anti-join makes it
    # a no-op (the exactness layer, beyond the watermarked stream dedup)
    c3 = _docs(spark, base + timedelta(hours=1), [(20, GOOD), (21, SPAM)])
    c3.coalesce(1).write.parquet(os.path.join(input_dir, "chunk3"))
    q3 = start_corpus_stream(spark, input_dir + "/*/", wh, ckpt, SCHEMA)
    q3.awaitTermination(120)
    assert sorted(r["doc_id"] for r in cat.read("corpus").collect()) == before


def test_prepare_documents_redacts_before_fingerprint(spark):
    """PII scrub happens in-stream BEFORE fingerprinting: two docs whose
    only difference is the redacted span carry identical fingerprints
    (and so dedup as one at the sink), raw PII never reaches the table,
    and the match count survives as the audit column."""
    base = datetime(2024, 1, 1, 12, 0, 0)
    docs = _docs(spark, base, [
        (1, GOOD + " mail bob@example.com and 10.0.0.1 ok"),
        (2, GOOD + " mail alice@test.org and 192.168.7.9 ok"),
        (3, GOOD),
    ])
    rows = {r["doc_id"]: r for r in prepare_documents(docs).collect()}
    assert rows[1]["fingerprint"] == rows[2]["fingerprint"]
    assert rows[1]["fingerprint"] != rows[3]["fingerprint"]
    assert rows[1]["n_pii"] == 2 and rows[3]["n_pii"] == 0
    assert "@" not in rows[1]["text"] and "<EMAIL>" in rows[1]["text"]
