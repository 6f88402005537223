"""Distributed BPE vs an independent pure-Python Sennrich reference.

The reference below re-implements the ACL-2016 algorithm directly from the
paper (count adjacent pairs over the word-frequency table, merge the
argmax, repeat) with the same deterministic tiebreak — exact-value gates
for the two rows-only registry queries (bpe_train_merges,
bpe_encode_tokens), the same twin-implementation pattern netcdf3.py uses
for its format gates.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from icenetetl_spark.operators.bpe import (
    END_OF_WORD,
    apply_merges,
    encode_arrow,
    fit_bpe,
    merge_pair,
    symbolize,
)
from icenetetl_spark.operators.text import BPE_TOKEN_PATTERN
from icenetetl_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"
_PAT = re.compile(BPE_TOKEN_PATTERN)


# ---------- pure-Python reference (independent implementation) ----------


def ref_word_freqs(texts):
    wf = Counter()
    for t in texts:
        wf.update(_PAT.findall(t.lower()))
    return wf


def ref_merge_word(symbols, left, right):
    out = []
    for x in symbols:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def ref_fit(texts, num_merges, min_count=2):
    wf = ref_word_freqs(texts)
    vocab = {w: list(w) + [END_OF_WORD] for w in wf}
    merges = []
    for step in range(num_merges):
        pc = Counter()
        for w, syms in vocab.items():
            f = wf[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        # max count, ties broken lexicographically ascending on the pair
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append(
            {
                "step": step,
                "left": left,
                "right": right,
                "merged": left + right,
                "pair_count": cnt,
            }
        )
        vocab = {w: ref_merge_word(s, left, right) for w, s in vocab.items()}
    return merges


def ref_encode_len(text, merges):
    n = 0
    memo = {}
    for w in _PAT.findall(text.lower()):
        if w not in memo:
            syms = list(w) + [END_OF_WORD]
            for m in merges:
                syms = ref_merge_word(syms, m["left"], m["right"])
            memo[w] = len(syms)
        n += memo[w]
    return n


# ------------------------------- fixtures -------------------------------


@pytest.fixture(scope="module")
def texts(spark):
    rows = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    )
    return {r["doc_id"]: r["text"] for r in rows}


@pytest.fixture(scope="module")
def merges(spark):
    return fit_bpe(load_table(spark, SF_DIR, "documents"), 12)


# --------------------------------- gates --------------------------------


def test_merge_pair_run_semantics(spark):
    df = spark.createDataFrame(
        [("aaaa",), ("abab",), ("ba",), ("aab",)], "w string"
    )
    out = {
        tuple(r["m"])
        for r in df.select(
            merge_pair(F.split("w", ""), "a", "a").alias("m")
        ).collect()
    }
    assert ("aa", "aa") in out  # simultaneous greedy on runs
    assert ("a", "b", "a", "b") in out
    assert ("b", "a") in out
    assert ("aa", "b") in out


def test_fit_matches_python_reference(texts, merges):
    assert merges == ref_fit(list(texts.values()), 12)


def test_fit_is_deterministic(spark, merges):
    again = fit_bpe(load_table(spark, SF_DIR, "documents"), 12)
    assert again == merges


def test_merges_monotone_nonincreasing_after_first(merges):
    # pair counts need not be globally sorted (a merge can create a new
    # dominant pair) but every chosen pair must have count >= min_count
    # and the table must be contiguous in step.
    assert [m["step"] for m in merges] == list(range(len(merges)))
    assert all(m["pair_count"] >= 2 for m in merges)
    assert len(merges) == 12


def test_jvm_encode_matches_python_reference(spark, texts, merges):
    docs = load_table(spark, SF_DIR, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower("text"), F.lit(BPE_TOKEN_PATTERN), F.lit(0)
            )
        ).alias("word"),
    )
    encoded = (
        words.select("word")
        .distinct()
        .withColumn(
            "n_sub", F.size(apply_merges(symbolize(F.col("word")), merges))
        )
    )
    got = {
        r["doc_id"]: r["n"]
        for r in words.join(encoded, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_sub").alias("n"))
        .collect()
    }
    want = {d: ref_encode_len(t, merges) for d, t in texts.items()}
    assert got == want


def test_arrow_encode_matches_python_reference(spark, texts, merges):
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        r["doc_id"]: (r["n_tokens"], tuple(r["tokens"][:5]))
        for r in encode_arrow(docs, merges).collect()
    }
    for doc_id, text in texts.items():
        assert got[doc_id][0] == ref_encode_len(text, merges)
    # token streams reconstruct the pretoken stream (lossless encode)
    sample = encode_arrow(docs, merges).limit(20).collect()
    for r in sample:
        joined = "".join(r["tokens"]).replace(END_OF_WORD, " ").split()
        assert joined == _PAT.findall(texts[r["doc_id"]].lower())


def test_encoding_compresses(texts, merges):
    # 12 merges must strictly reduce token count vs character level
    t = next(iter(texts.values()))
    chars = sum(len(w) + 1 for w in _PAT.findall(t.lower()))
    assert ref_encode_len(t, merges) < chars


def test_fixed_encode_sql_rewrite_parity():
    """The bpe_encode_fixed oracle encodes by chained string replace()s
    over SEP-wrapped symbols. Pin that rewrite against the pure-Python
    fold (_merge_word) on adversarial words: runs under (a,a), a merge
    whose right side is itself merged (a,aa), suffix-collision bait
    (ba + a), and single-punctuation pretokens."""
    import duckdb

    from icenetetl_spark.operators.bpe import _merge_word

    merges = [
        ("a", "a"),
        ("a", "aa"),
        ("b", "a"),
        ("ba", "</w>"),
        ("<", "/"),
    ]
    words = ["aaaa", "aaa", "aaaaaa", "ba", "baa", "ab", "|", "<", "a", ""]
    sep = "chr(31)"
    steps, prev = [], "s0"
    for k, (left, right) in enumerate(merges, start=1):
        pat = f"{sep} || '{left}' || {sep} || {sep} || '{right}' || {sep}"
        rep = f"{sep} || '{left + right}' || {sep}"
        steps.append(
            f"m{k} AS (SELECT word, replace(s, {pat}, {rep}) AS s FROM "
            f"{'m' + str(k - 1) if k > 1 else prev})"
        )
    chain = ",\n".join(steps)
    sql = f"""
        WITH vocab AS (SELECT unnest(?) AS word),
        s0 AS (
            SELECT word,
                   coalesce(string_agg({sep} || substr(word, i, 1) || {sep},
                            '' ORDER BY i), '')
                       || {sep} || '</w>' || {sep} AS s
            FROM vocab LEFT JOIN LATERAL
                 (SELECT unnest(generate_series(1, length(word))) AS i) t
                 ON true
            GROUP BY word
        ),
        {chain}
        SELECT word,
               (length(s) - length(replace(s, {sep}, ''))) // 2 AS n_sub
        FROM m{len(merges)}
    """
    got = dict(duckdb.connect().execute(sql, [words]).fetchall())
    for w in words:
        expect = len(_merge_word(list(w) + ["</w>"], merges))
        assert got[w] == expect, (w, got[w], expect)


def test_trained_merges_match_pinned_sf001(spark):
    """The FIXED_MERGES constant IS fit_bpe(documents@sf0.01, 12) — the
    pin that justifies giving the TRAINED bpe entries hash-gate oracles
    (a VALUES literal for bpe_train_merges, the fixed rewrite chain for
    bpe_encode_tokens). If the trainer or the pin drifts, this fails
    before the driver gate ever goes red."""
    from icenetetl_spark.queries.tokenizer import FIXED_MERGES, _NUM_MERGES

    fitted = fit_bpe(
        load_table(spark, "/root/testdata/sf0.01", "documents"), _NUM_MERGES
    )
    assert len(fitted) == len(FIXED_MERGES) == _NUM_MERGES
    for i, (got, want) in enumerate(zip(fitted, FIXED_MERGES)):
        assert (
            got["left"],
            got["right"],
            got["merged"],
            got["pair_count"],
        ) == (
            want["left"],
            want["right"],
            want["merged"],
            want["pair_count"],
        ), f"merge step {i}: {got} != pinned {want}"
