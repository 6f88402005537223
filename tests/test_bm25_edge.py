"""BM25 plan-rewrite edge case (round 9).

text_bm25_topk replaced its two full-token exchanges with (a) a query-term
filter pushed below the explode and (b) dl = size(tokens(text)), a
map-only projection. The rewrite is exact for EVERY document — including
empty and punctuation-only ones — because split() never returns an empty
array: an empty text tokenizes to [""], one element, so the old
explode+groupBy also counted it as dl=1. The sf0.01 oracle corpus has no
empty docs, so the driver gate never exercises that boundary; this test
pins it directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from icenetetl_spark.operators import text as T


def _docs(spark):
    rows = [
        (1, "spark makes vector streams fast"),
        (2, ""),                      # empty text -> [""] -> dl = 1
        (3, "...!!!"),                # normalizes to punctuation-free text
        (4, "vector vector stream"),
        (5, "plain words here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _dl_via_size(docs):
    return docs.select(
        "doc_id", F.size(T.tokens(F.col("text"))).cast("long").alias("dl")
    )


def _dl_via_explode(docs):
    return (
        docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("t"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dl"))
    )


def test_dl_projection_matches_explode_groupby(spark):
    docs = _docs(spark)
    key = lambda r: (r["doc_id"], r["dl"])
    got = sorted(map(key, _dl_via_size(docs).collect()))
    want = sorted(map(key, _dl_via_explode(docs).collect()))
    assert got == want
    # the boundary the rewrite leans on: every doc is present (split never
    # yields an empty array — empty text is one empty token, dl = 1)
    assert len(got) == 5
    assert dict(got)[2] == 1


def test_stats_identical_under_both_dl_derivations(spark):
    docs = _docs(spark)

    def stats(dl):
        return dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        ).first()

    a, b = stats(_dl_via_size(docs)), stats(_dl_via_explode(docs))
    assert a["n_docs"] == b["n_docs"] == 5
    assert a["avgdl"] == b["avgdl"]  # exact double equality, same operands


def test_prefiltered_tf_matches_postfiltered_tf(spark):
    docs = _docs(spark)
    query = ["spark", "vector", "stream"]
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    pre = (
        toks.filter(F.col("term").isin(query))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    post = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(F.col("term").isin(query))
    )
    key = lambda r: (r["doc_id"], r["term"], r["tf"])
    assert sorted(map(key, pre.collect())) == sorted(map(key, post.collect()))
