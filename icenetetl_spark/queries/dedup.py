"""Deduplication queries over the ``documents`` table, binding
operators.dedup to the driver testdata. Oracle SQL is generated from the same
parameter tables the Spark operators use, so constants can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from icenetetl_spark.operators import dedup as D
from icenetetl_spark.functions.portable import portable_hash64_sql
from icenetetl_spark.sources.testdata import load_table

NGRAM_N = 3
JACCARD_T = 0.8
NUM_HASHES = 16
BANDS = 4
SIM_BITS = 16
HAMMING_T = 3

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_SHINGLES_CTE = f"""
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               concat_ws(' ', w[i+1], w[i+2], w[i+3]) AS shingle
        FROM words,
             LATERAL (SELECT unnest(generate_series(0, len(w) - {NGRAM_N})) AS i) t
        WHERE len(w) >= {NGRAM_N}
    )
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_duplicates(load_table(spark, sf_dir, "documents"))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(D.word_shingles(docs, n=NGRAM_N), threshold=JACCARD_T)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(D.word_shingles(docs, n=NGRAM_N), NUM_HASHES)
    return D.lsh_candidate_pairs(sigs, NUM_HASHES, BANDS)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(load_table(spark, sf_dir, "documents"), num_bits=SIM_BITS)


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sim = D.simhash(load_table(spark, sf_dir, "documents"), num_bits=SIM_BITS)
    return D.simhash_near_pairs(sim, max_hamming=HAMMING_T)


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_pairs": dedup_simhash_pairs,
}


def _minhash_sig_sql() -> str:
    h_expr = portable_hash64_sql("shingle", 32)
    mins = ",\n               ".join(
        f"min(({a} * H + {b}) % {D.MERSENNE_P}) AS mh{h}"
        for (h, a, b) in D._minhash_params(NUM_HASHES)
    )
    return f"""
        hashed AS (SELECT doc_id, {h_expr} AS H FROM sh),
        sig AS (
            SELECT doc_id,
               {mins}
            FROM hashed GROUP BY doc_id
        )
    """


def _banded_sql() -> str:
    rows = NUM_HASHES // BANDS
    pieces = []
    for bi in range(BANDS):
        cols = ", ".join(f"mh{bi * rows + r}" for r in range(rows))
        pieces.append(
            f"SELECT doc_id, {bi} AS band_idx, concat_ws(',', {cols}) AS band_sig FROM sig"
        )
    return " UNION ALL ".join(pieces)


def _simhash_sql() -> str:
    h_expr = portable_hash64_sql("word", 32)
    sums = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIM_BITS)
    )
    fold = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIM_BITS)
    )
    return f"""
        WITH words AS (
            SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS word
            FROM documents
        ),
        hashed AS (SELECT doc_id, {h_expr} AS h FROM words),
        sums AS (
            SELECT doc_id,
               {sums}
            FROM hashed GROUP BY doc_id
        )
        SELECT doc_id, CAST({fold} AS BIGINT) AS simhash FROM sums
    """


ORACLES = {
    "dedup_exact": f"""
        SELECT md5({_NORM}) AS fingerprint,
               min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_SHINGLES_CTE},
        counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
        FROM pairs
        JOIN counts ca ON ca.doc_id = doc_a
        JOIN counts cb ON cb.doc_id = doc_b
        WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= {JACCARD_T}
    """,
    "dedup_minhash_lsh": f"""
        WITH {_SHINGLES_CTE},
        {_minhash_sig_sql()},
        banded AS ({_banded_sql()})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
    """,
    "dedup_simhash": _simhash_sql(),
    "dedup_simhash_pairs": f"""
        WITH sim AS ({_simhash_sql()})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_T}
    """,
}
