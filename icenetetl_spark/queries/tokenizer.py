"""Tokenizer-training queries over the documents table: distributed BPE
(operators/bpe.py) exposed through the driver gate.

- ``bpe_pair_counts`` is hash-gated: the weighted adjacent-pair statistics
  that drive the first merge are plain relational algebra, so DuckDB can
  reproduce them bit-for-bit (char extraction via generate_series).
- ``bpe_train_merges`` / ``bpe_encode_tokens`` are rows-only by design:
  the merge loop is iterative argmax + rewrite, not SQL-expressible — the
  exact-value gate lives in tests/test_bpe.py, which pins both against an
  independent pure-Python Sennrich implementation (the netcdf3.py
  twin-implementation pattern).

Scale notes: one corpus scan builds the word-frequency table; training
and encoding then run on the vocab-sized table. ``bpe_encode_tokens``
encodes each DISTINCT pretoken once (vocab-sized JVM fold chain) and joins
the per-word subword counts back to the exploded corpus on the word key —
the corpus-sized side never runs the merge folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from icenetetl_spark.operators.bpe import (
    apply_merges,
    fit_bpe,
    pair_counts,
    symbolize,
    word_freqs,
)
from icenetetl_spark.operators.text import BPE_TOKEN_PATTERN
from icenetetl_spark.sources.testdata import load_table

_TOP_PAIRS = 40
_NUM_MERGES = 12


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top weighted adjacent-symbol pairs of the initial (character-level)
    BPE state — the statistic whose argmax is merge #1."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = word_freqs(docs).withColumn("syms", symbolize(F.col("word")))
    return (
        pair_counts(vocab)
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(_TOP_PAIRS)
    )


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table after _NUM_MERGES steps — deterministic
    (count-desc, lexicographic tiebreak), so reruns are identical.
    Rows-only by design: the merge loop is iterative argmax + rewrite,
    not SQL-expressible — exact values are pinned against an independent
    pure-Python reference (no oracle) in tests/test_bpe.py."""
    docs = load_table(spark, sf_dir, "documents")
    merges = fit_bpe(docs, _NUM_MERGES)
    return spark.createDataFrame(
        [
            (m["step"], m["left"], m["right"], m["merged"], m["pair_count"])
            for m in merges
        ],
        "step int, left string, right string, merged string, pair_count bigint",
    )


def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts per document under the trained tokenizer. Each DISTINCT
    pretoken is encoded once (the merge folds run on the vocab table); the
    exploded corpus joins the per-word subword counts on the word key, so
    corpus rows carry only (doc_id, word) through the join.
    Rows-only by design (no SQL oracle for the iterative merge loop);
    exact token counts are pinned vs the pure-Python reference in
    tests/test_bpe.py."""
    docs = load_table(spark, sf_dir, "documents")
    merges = fit_bpe(docs, _NUM_MERGES)
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
    return (
        words.join(encoded, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_sub").alias("n_tokens"))
        .orderBy("doc_id")
    )


QUERIES = {
    "bpe_pair_counts": bpe_pair_counts,
    "bpe_train_merges": bpe_train_merges,
    "bpe_encode_tokens": bpe_encode_tokens,
}

ORACLES = {
    "bpe_pair_counts": f"""
        WITH words AS (
            SELECT unnest(regexp_extract_all(
                lower(text), '{BPE_TOKEN_PATTERN}')) AS w
            FROM documents
        ),
        wf AS (SELECT w, COUNT(*) AS freq FROM words GROUP BY w),
        pairs AS (
            SELECT substr(w, i, 1) AS left_sym,
                   CASE WHEN i < length(w) THEN substr(w, i + 1, 1)
                        ELSE '</w>' END AS right_sym,
                   freq
            FROM wf, unnest(generate_series(1, length(w))) AS t(i)
        )
        SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS pair_count
        FROM pairs
        GROUP BY 1, 2
        ORDER BY pair_count DESC, left_sym, right_sym
        LIMIT {_TOP_PAIRS}
    """,
}
