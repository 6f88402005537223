"""Exact-substring duplication spans vs a brute-force Python reference."""

from __future__ import annotations

from collections import Counter

from icenetetl_spark.operators.substrings import (
    duplicated_spans,
    duplication_profile,
)
from icenetetl_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"
K = 20


def ref_spans(texts: dict, k: int):
    """Brute force: count every k-gram across the corpus (by value, not
    hash), mark positions whose gram repeats, merge adjacent runs."""
    counts = Counter()
    for t in texts.values():
        for i in range(len(t) - k + 1):
            counts[t[i : i + k]] += 1
    out = set()
    for doc_id, t in texts.items():
        dup_pos = [
            i + 1  # 1-based
            for i in range(len(t) - k + 1)
            if counts[t[i : i + k]] > 1
        ]
        if not dup_pos:
            continue
        start = prev = dup_pos[0]
        for p in dup_pos[1:] + [None]:
            if p is not None and p == prev + 1:
                prev = p
                continue
            out.add((doc_id, start, prev + k - 1, prev + k - start))
            if p is not None:
                start = prev = p
    return out


def _texts(spark):
    return {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }


def test_spans_match_bruteforce(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicated_spans(docs, k=K).collect()
    }
    # the operator hashes grams (32-bit) — identical result unless a hash
    # collision marks a unique gram duplicated; none occur at this scale
    assert got == ref_spans(_texts(spark), K)


def test_spans_are_maximal_and_disjoint(spark):
    docs = load_table(spark, SF_DIR, "documents")
    spans = duplicated_spans(docs, k=K).collect()
    by_doc: dict = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["span_start"])
        for a, b in zip(rows, rows[1:]):
            # maximal: merging any two adjacent spans must leave a gap of
            # undup'd positions between them (else islands would have merged)
            assert b["span_start"] > a["span_end"] - K + 2
        for r in rows:
            assert r["span_len"] == r["span_end"] - r["span_start"] + 1
            assert r["span_len"] >= K


def test_profile_covers_all_docs_with_bounded_fracs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    prof = duplication_profile(docs, k=K).collect()
    assert len(prof) == docs.count()
    for r in prof:
        assert 0.0 <= r["dup_frac"] <= 1.0
        assert (r["n_regions"] == 0) == (r["dup_chars"] == 0)


def test_short_documents_are_skipped_not_crashed(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, "x" * 50), (3, "x" * 50)],
        "doc_id long, text string",
    )
    spans = duplicated_spans(df, k=K).collect()
    assert {r["doc_id"] for r in spans} == {2, 3}
    prof = {r["doc_id"]: r for r in duplication_profile(df, k=K).collect()}
    assert prof[1]["n_regions"] == 0 and prof[1]["dup_frac"] == 0.0
    # the two identical docs are fully covered by one span each
    assert prof[2]["dup_frac"] == 1.0 and prof[3]["dup_frac"] == 1.0
