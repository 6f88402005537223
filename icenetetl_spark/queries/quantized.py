"""Int8-quantized embedding queries (operators/quantization.py), both
hash-gated: the quantizer is spelled in portable IEEE ops (floor(v + 0.5)
rounding, no engine ROUND) and the quantized ANN scores are exact integer
dot products scaled at the end — so DuckDB reproduces every bit.

`knn_int8_topk` is the memory-bound ANN story at 100 TB: candidate
scoring reads 72 B/vector (int8 codes + one float scale) instead of
256 B of float32, with deterministic ordering because no float
accumulation happens until the final two multiplies. Recall vs the exact
float top-k is asserted in tests/test_quantization.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from icenetetl_spark.operators.quantization import (
    INT8_MAX,
    knn_int8,
    reconstruction_report,
)
from icenetetl_spark.sources.testdata import load_table

K = 5
N_QUERIES = 10


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector quantization summary: scale, code extremes/sum, mean
    absolute reconstruction error (fixed-point accumulated)."""
    return reconstruction_report(load_table(spark, sf_dir, "embeddings"))


def knn_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return knn_int8(queries, emb, k=K)


QUERIES = {
    "embedding_quantize_int8": embedding_quantize_int8,
    "knn_int8_topk": knn_int8_topk,
}

_CODES_CTE = f"""
    WITH scaled AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) / {float(INT8_MAX)} AS scale
        FROM embeddings
    ),
    codes AS (
        SELECT vec_id, embedding, scale,
               list_transform(embedding,
                   x -> CASE WHEN scale = 0 THEN 0
                        ELSE CAST(floor(CAST(x AS DOUBLE) / scale + 0.5)
                                  AS INTEGER) END) AS codes
        FROM scaled
    )
"""

ORACLES = {
    "embedding_quantize_int8": _CODES_CTE
    + """
    SELECT vec_id, scale,
           list_min(codes) AS code_min,
           list_max(codes) AS code_max,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           CAST(list_sum(list_transform(
                    generate_series(1, len(embedding)),
                    i -> CAST(floor(abs(CAST(embedding[i] AS DOUBLE)
                                        - codes[i] * scale) * 1e9 + 0.5)
                              AS BIGINT)))
                AS DOUBLE) / 1e9 / len(embedding) AS mean_abs_err
    FROM codes
    """,
    "knn_int8_topk": _CODES_CTE
    + f"""
    , scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(CAST(q.codes AS DOUBLE[]),
                                CAST(c.codes AS DOUBLE[]))
               * q.scale * c.scale AS qscore
        FROM codes q JOIN codes c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, qscore
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY qscore DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= {K}
    """,
}
