"""Similarity-search queries over ``embeddings``, binding
operators.similarity. Cosine is computed in double precision via sequential
fold on both engines — verified bit-identical to DuckDB's list_dot_product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from icenetetl_spark.operators import similarity as S
from icenetetl_spark.sources.testdata import load_table

K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
LSH_BITS = 8
NEAR_DUP_T = 0.45
ND_BITS, ND_BANDS = 48, 12  # banded sign-LSH: 12 bands x 4 sign bits

_COS = """
    list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))
"""


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.knn_bruteforce(queries, emb, k=K)


def knn_sign_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.knn_sign_lsh(queries, emb, k=K, num_bits=LSH_BITS)


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded sign-LSH near-dup pairs (the scale plan: explode bands,
    equi-join, cosine refine); the oracle mirrors the identical bands so the
    hash gate is exact. Recall of this plan vs the all-pairs answer is
    asserted in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    # exact=False: this query IS the scale plan; the approximation is an
    # explicit call-site decision (operator default is the exact form).
    return S.embedding_near_duplicates(
        emb, threshold=NEAR_DUP_T, num_bits=ND_BITS, bands=ND_BANDS, exact=False
    )


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector statistics — array fold staying JVM-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
    )
    return (
        emb.select("label", "vec_id", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
        )
    )


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (KMeans coarse quantizer + probed-cell search). Rows-only:
    seeded KMeans is deterministic locally but not reproducible in SQL;
    recall vs brute force is asserted in tests/test_ivf.py instead."""
    from icenetetl_spark.operators.ivf import knn_ivf as _knn_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return _knn_ivf(queries, emb, k=K, n_cells=16, n_probe=6)


QUERIES = {
    "knn_bruteforce": knn_bruteforce,
    "knn_sign_lsh": knn_sign_lsh,
    "knn_ivf": knn_ivf,
    "embedding_near_dup": embedding_near_dup,
    "embedding_norms": embedding_norms,
}

def _sign_string(t: str, n: int) -> str:
    """SQL twin of sign_bucket(vec, n): '0'/'1' sign string of the first n
    coordinates (DuckDB lists are 1-indexed)."""
    return " || ".join(
        f"(CASE WHEN {t}.embedding[{i + 1}] > 0 THEN '1' ELSE '0' END)"
        for i in range(n)
    )


_SIGN_BUCKET = lambda t: _sign_string(t, LSH_BITS)  # noqa: E731

ORACLES = {
    "knn_bruteforce": f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {_COS} AS cos
            FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
            WHERE q.vec_id < {N_QUERIES}
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos
        FROM ranked WHERE rank <= {K}
    """,
    "knn_sign_lsh": f"""
        WITH q AS (SELECT vec_id, embedding, {_SIGN_BUCKET('embeddings')} AS bucket
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
             c AS (SELECT vec_id, embedding, {_SIGN_BUCKET('embeddings')} AS bucket
                   FROM embeddings),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cos
            FROM q JOIN c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos
        FROM ranked WHERE rank <= {K}
    """,
    # Mirrors the banded sign-LSH plan: candidate = agree on ALL bits of ANY
    # band (band i = sign bits of coords [i*w, (i+1)*w)), then exact-cosine
    # refine. The OR-join is fine for the oracle's small data; Spark runs the
    # same semantics as an exploded equi-join.
    "embedding_near_dup": f"""
        WITH b AS (SELECT vec_id, embedding,
                          {_sign_string("embeddings", ND_BITS)} AS sig
                   FROM embeddings)
        SELECT * FROM (
            SELECT q.vec_id AS id_a, c.vec_id AS id_b, {_COS} AS cos
            FROM b q JOIN b c
              ON q.vec_id < c.vec_id
             AND ({" OR ".join(
                 f"substr(q.sig, {i * (ND_BITS // ND_BANDS) + 1}, {ND_BITS // ND_BANDS})"
                 f" = substr(c.sig, {i * (ND_BITS // ND_BANDS) + 1}, {ND_BITS // ND_BANDS})"
                 for i in range(ND_BANDS))})
        ) WHERE cos >= {NEAR_DUP_T}
    """,
    "embedding_norms": """
        WITH norms AS (
            SELECT label, vec_id,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        )
        SELECT label, count(*) AS n_vectors,
               min(norm) AS min_norm, max(norm) AS max_norm
        FROM norms GROUP BY label
    """,
}
