"""BM25 plan-rewrite edge case (round 9).

text_bm25_topk replaced its two full-token exchanges with (a) a query-term
filter pushed below the explode and (b) dl = size(tokens(text)), a
map-only projection. The rewrite is exact for EVERY document — including
empty and punctuation-only ones — because split() never returns an empty
array: an empty text tokenizes to [""], one element, so the old
explode+groupBy also counted it as dl=1. The sf0.01 oracle corpus has no
empty docs, so the driver gate never exercises that boundary; this test
pins it directly.

NULL text is the one class where the forms DO diverge — tokens(NULL) is
NULL, so size() yields NULL (the doc still counts toward n_docs but adds nothing to sum(dl), skewing avgdl) while explode drops the row — which is why
text_bm25_topk filters NULL text up front (round-9 advice). The filtered
pipeline is pinned equal to the explode form here.
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
        (6, None),                    # NULL text -> dropped by the filter
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _filtered(docs):
    """The NULL-text filter text_bm25_topk applies before dl/tf."""
    return docs.filter(F.col("text").isNotNull())


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
    docs = _filtered(_docs(spark))
    key = lambda r: (r["doc_id"], r["dl"])
    got = sorted(map(key, _dl_via_size(docs).collect()))
    want = sorted(map(key, _dl_via_explode(docs).collect()))
    assert got == want
    # the boundary the rewrite leans on: every doc is present (split never
    # yields an empty array — empty text is one empty token, dl = 1)
    assert len(got) == 5
    assert dict(got)[2] == 1


def test_null_text_is_where_the_forms_diverge(spark):
    """Why the query filters NULL text: unfiltered, size() emits dl=NULL
    for the NULL doc — the doc still counts toward n_docs while its dl
    adds nothing to sum(dl), skewing avgdl — while explode drops the doc
    entirely; with the filter, both forms drop it and agree on every
    remaining doc."""
    docs = _docs(spark)
    unfiltered = dict(
        (r["doc_id"], r["dl"]) for r in _dl_via_size(docs).collect()
    )
    assert unfiltered[6] is None  # size(tokens(NULL)) is NULL, not a length
    exploded = dict(
        (r["doc_id"], r["dl"]) for r in _dl_via_explode(docs).collect()
    )
    assert 6 not in exploded  # explode drops the NULL-token row
    filtered = dict(
        (r["doc_id"], r["dl"])
        for r in _dl_via_size(_filtered(docs)).collect()
    )
    assert filtered == exploded


def test_stats_identical_under_both_dl_derivations(spark):
    docs = _filtered(_docs(spark))

    def stats(dl):
        return dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        ).first()

    a, b = stats(_dl_via_size(docs)), stats(_dl_via_explode(docs))
    assert a["n_docs"] == b["n_docs"] == 5
    assert a["avgdl"] == b["avgdl"]  # exact double equality, same operands


def test_prefiltered_tf_matches_postfiltered_tf(spark):
    docs = _filtered(_docs(spark))
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
