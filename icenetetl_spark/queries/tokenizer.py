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
    (count-desc, lexicographic tiebreak; integer counts, no floats), so
    reruns are identical. Hash-gated at the gate SF: the oracle is the
    pinned sf0.01 fit (FIXED_MERGES) as a VALUES literal — valid because
    training is deterministic and the pin is itself asserted by
    tests/test_bpe.py::test_trained_merges_match_pinned_sf001 plus an
    independent pure-Python Sennrich reference."""
    docs = load_table(spark, sf_dir, "documents")
    merges = fit_bpe(
        docs, _NUM_MERGES, cache_key=(sf_dir, "documents")
    )
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
    Hash-gated at the gate SF: training is deterministic and the sf0.01
    fit is pinned as FIXED_MERGES (asserted in tests/test_bpe.py), so the
    oracle is the SAME chained-rewrite SQL as bpe_encode_fixed — trained
    and fixed encodes provably coincide where the driver compares them;
    trainer drift turns the gate red instead of passing silently."""
    docs = load_table(spark, sf_dir, "documents")
    merges = fit_bpe(
        docs, _NUM_MERGES, cache_key=(sf_dir, "documents")
    )
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


# Pinned merge table: fit_bpe(documents@sf0.01, 12) frozen as a constant —
# the knn_ivf_fixed pattern applied to the tokenizer. Freezing the MODEL
# splits the gate: encoding under a KNOWN model becomes pure deterministic
# dataflow that DuckDB can replay, so the encode path earns a value-hash
# gate. And because BPE training itself is DETERMINISTIC (integer counts,
# count-desc + lexicographic argmax — no floats, no RNG, no
# order-sensitivity), the TRAINED entries are hash-gated too at the gate
# SF: at sf0.01 the trainer provably reproduces exactly this table
# (tests/test_bpe.py::test_trained_merges_match_pinned_sf001), so
# bpe_train_merges' oracle is this table as a VALUES literal and
# bpe_encode_tokens' oracle is the fixed-encode rewrite chain. Any drift
# in the training loop turns the driver gate red — fail-loud, the exact
# property a gate is for. ``pair_count`` is the argmax statistic at each
# step, pinned alongside the pair.
# Oracles below that embed the pinned fit are valid ONLY at the gate SF —
# running tools/check_oracle.py at another SF would compare a trainer fit
# on that corpus against the sf0.01 constant and read false red. The local
# checker consults this set and skips these entries when SF differs
# (ADVICE r8); the driver always gates at sf0.01 so its rows are unaffected.
PINNED_AT_SF001 = {"bpe_train_merges", "bpe_encode_tokens"}

FIXED_MERGES: list[dict] = [
    {"left": "e", "right": "r", "merged": "er", "pair_count": 4568},
    {"left": "e", "right": "</w>", "merged": "e</w>", "pair_count": 4473},
    {"left": "n", "right": "</w>", "merged": "n</w>", "pair_count": 2834},
    {"left": "er", "right": "</w>", "merged": "er</w>", "pair_count": 2779},
    {"left": "o", "right": "w", "merged": "ow", "pair_count": 2747},
    {"left": "ow", "right": "</w>", "merged": "ow</w>", "pair_count": 2747},
    {"left": "o", "right": "r", "merged": "or", "pair_count": 2696},
    {"left": "s", "right": "t", "merged": "st", "pair_count": 2676},
    {"left": "h", "right": "</w>", "merged": "h</w>", "pair_count": 1884},
    {"left": "a", "right": "t", "merged": "at", "pair_count": 1845},
    {"left": "l", "right": "u", "merged": "lu", "pair_count": 1831},
    {"left": "i", "right": "n", "merged": "in", "pair_count": 1796},
]


def bpe_encode_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts per document under the PINNED merge table — the same
    vocab-table plan as bpe_encode_tokens (merge folds over DISTINCT
    pretokens, corpus joins back on the word key) with the model frozen,
    which makes the whole path hash-gated: the oracle replays every merge
    as one chained string-rewrite CTE per step."""
    docs = load_table(spark, sf_dir, "documents")
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
            "n_sub",
            F.size(apply_merges(symbolize(F.col("word")), FIXED_MERGES)),
        )
    )
    return (
        words.join(encoded, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_sub").alias("n_tokens"))
    )


QUERIES = {
    "bpe_pair_counts": bpe_pair_counts,
    "bpe_train_merges": bpe_train_merges,
    "bpe_encode_tokens": bpe_encode_tokens,
    "bpe_encode_fixed": bpe_encode_fixed,
}


def _encode_fixed_oracle() -> str:
    """DuckDB restatement of the greedy BPE merge as chained string
    rewrites (the graph_pagerank CTE-unrolling trick, applied to folds).

    Encoding: each word becomes a string of SEP-wrapped symbols
    (``[h, at] -> ~h~~at~``); one merge step is ONE ``replace()`` of
    ``~left~~right~`` by ``~merged~``. DuckDB's replace scans left to
    right and continues AFTER each replacement, which is exactly the
    Sennrich simultaneous-merge semantics (``aaaa`` + (a,a) -> [aa, aa]);
    a fresh wrapper on every symbol makes cross-symbol false matches
    impossible (pinned against the pure-Python reference in
    tests/test_bpe.py::test_fixed_encode_sql_rewrite_parity). SEP is the
    ASCII unit separator, which the corpus provably lacks (and which the
    \\s-splitting pretokenizer would isolate anyway)."""
    sep = "chr(31)"
    steps = []
    prev = "s0"
    for k, m in enumerate(FIXED_MERGES, start=1):
        pat = f"{sep} || '{m['left']}' || {sep} || {sep} || '{m['right']}' || {sep}"
        rep = f"{sep} || '{m['merged']}' || {sep}"
        steps.append(
            f"m{k} AS (SELECT word, replace(s, {pat}, {rep}) AS s FROM "
            f"{'m' + str(k - 1) if k > 1 else prev})"
        )
    chain = ",\n        ".join(steps)
    last = f"m{len(FIXED_MERGES)}"
    return f"""
        WITH words AS (
            SELECT doc_id, unnest(regexp_extract_all(
                lower(text), '{BPE_TOKEN_PATTERN}')) AS word
            FROM documents
        ),
        vocab AS (SELECT DISTINCT word FROM words),
        s0 AS (
            SELECT word,
                   string_agg({sep} || substr(word, i, 1) || {sep},
                              '' ORDER BY i)
                       || {sep} || '</w>' || {sep} AS s
            FROM vocab, unnest(generate_series(1, length(word))) AS t(i)
            GROUP BY word
        ),
        {chain},
        counts AS (
            SELECT word,
                   (length(s) - length(replace(s, {sep}, ''))) // 2 AS n_sub
            FROM {last}
        )
        SELECT w.doc_id, CAST(SUM(c.n_sub) AS BIGINT) AS n_tokens
        FROM words w JOIN counts c USING (word)
        GROUP BY w.doc_id
    """

def _train_merges_oracle() -> str:
    """The pinned sf0.01 merge table as a VALUES literal (see FIXED_MERGES
    note: BPE training is deterministic, the pin is pytest-asserted, so
    the constant IS the correct answer at the gate SF and any trainer
    drift reads as a hash red)."""
    rows = ",\n            ".join(
        f"(CAST({i} AS INT), '{m['left']}', '{m['right']}', "
        f"'{m['merged']}', CAST({m['pair_count']} AS BIGINT))"
        for i, m in enumerate(FIXED_MERGES)
    )
    return f"""
        SELECT * FROM (VALUES
            {rows}
        ) AS t(step, "left", "right", merged, pair_count)
    """


ORACLES = {
    "bpe_train_merges": _train_merges_oracle(),
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
    "bpe_encode_fixed": _encode_fixed_oracle(),
    # trained == fixed at the gate SF (deterministic trainer + pinned
    # sf0.01 fit) — same rewrite chain, see bpe_encode_tokens docstring
    "bpe_encode_tokens": _encode_fixed_oracle(),
}
