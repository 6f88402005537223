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


def test_sampled_profile_is_conservative_with_bounded_recall(spark):
    """Content-defined sampling (sample_mod=4): per-document coverage
    never exceeds the exact profile (sampled dup positions are a subset
    and occurrence counts are exact), and corpus-wide character recall
    stays high — regions are missed only when none of their grams hash
    to 0 mod 4, probability ~(3/4)^(L-k+1)."""
    from icenetetl_spark.operators.substrings import duplication_profile

    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        r["doc_id"]: r["dup_chars"]
        for r in duplication_profile(docs, k=20).collect()
    }
    sampled = {
        r["doc_id"]: r["dup_chars"]
        for r in duplication_profile(docs, k=20, sample_mod=4).collect()
    }
    assert set(sampled) == set(exact)
    for d, chars in sampled.items():
        assert chars <= exact[d], (d, chars, exact[d])
    tot_exact = sum(exact.values())
    recall = sum(sampled.values()) / tot_exact
    # The sf0.001 corpus's duplicated regions are mostly SHORT (L near
    # k=20), where a region carries few grams (detection ~1/s) and the
    # <=s-1-per-side boundary shrinkage is a large fraction of the
    # region, so natural-corpus recall lands around 0.6 (measured
    # 0.597). Pin the floor; the long-region guarantee the lever
    # actually targets at scale is pinned below.
    assert recall >= 0.55, recall


def test_sampled_profile_detects_long_repeats_reliably(spark):
    """The lever's real guarantee: a repeated region of length L >> k is
    missed only with probability ~(1-1/s)^(L-k+1). Inject 60-char
    repeats (miss prob (3/4)^41 ~ 7e-6) into otherwise-random docs and
    require every one detected with near-full coverage (per-side\n    boundary loss is Geometric(1/s), expected s-1 chars)."""
    import random

    from icenetetl_spark.operators.substrings import duplication_profile

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    repeat = "".join(rng.choice(alpha) for _ in range(60))
    rows = []
    for i in range(40):
        noise = lambda n: "".join(rng.choice(alpha) for _ in range(n))
        if i % 2 == 0:
            rows.append((i, noise(80) + repeat + noise(80)))
        else:
            rows.append((i, noise(200)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["dup_chars"]
        for r in duplication_profile(docs, k=20, sample_mod=4).collect()
    }
    covs = [got[i] for i in range(0, 40, 2)]
    # every repeat detected; per-side boundary loss is Geometric(1/s)
    # (expected s-1=3, occasionally more), so bound each region loosely
    # and the mean tightly
    assert all(c >= 40 for c in covs), covs
    assert sum(covs) / len(covs) >= 52, sum(covs) / len(covs)
