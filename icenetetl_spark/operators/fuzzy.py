"""Fuzzy entity matching via SymSpell-style deletion blocking (Garbe's
symmetric-delete algorithm, public): instead of the O(n²) all-pairs
Levenshtein join, every name emits its distance-1 deletion neighborhood
(identity + each single-character deletion) and candidates are the pairs
sharing a variant — an equi-join on the variant key. Completeness for
max_lev=1: a substitution pair shares the variant that deletes the
differing position from both sides; an insertion/deletion pair shares the
shorter string itself (the identity variant). Candidates are then
VERIFIED with an exact levenshtein filter, so blocking is purely a
candidate generator — false candidates (e.g. "xy"/"yz" both deleting to
"y") never survive.

Scale shape: the explode is |names| × (len+1) rows keyed by variant; the
self-join is bucketed by variant (the SymSpell index). A window count
caps pathological buckets before the join (the cap_document_frequency
idea) — the cap only ever drops candidates from buckets whose size
already signals a degenerate key, and is inert at test scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

BUCKET_CAP = 100


def deletion_variants(name: Column) -> Column:
    """Array of the identity string plus every single-character deletion."""
    n = F.length(name)
    return F.transform(
        F.sequence(F.lit(0), n),
        lambda i: F.when(i == F.lit(0), name).otherwise(
            F.concat(
                name.substr(F.lit(1), i - F.lit(1)),
                name.substr(i + F.lit(1), n - i),
            )
        ),
    )


def fuzzy_name_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_lev: int = 1,
    bucket_cap: int = BUCKET_CAP,
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, lev) for every distinct-entity pair
    within ``max_lev`` (<= 1 for completeness of deletion blocking) edit
    distance. Deterministic: id_a < id_b canonical orientation."""
    base = df.select(
        F.col(id_col).alias("eid"), F.col(name_col).alias("name")
    )
    variants = base.select(
        "eid", "name", F.explode(deletion_variants(F.col("name"))).alias("v")
    ).distinct()
    w = Window.partitionBy("v")
    capped = variants.withColumn(
        "bsize", F.count(F.lit(1)).over(w)
    ).filter(F.col("bsize") <= bucket_cap)
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.v") == F.col("b.v"))
            & (F.col("a.eid") < F.col("b.eid")),
        )
        .select(
            F.col("a.eid").alias("id_a"),
            F.col("b.eid").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("lev"),
    ).filter(F.col("lev") <= max_lev)


def fuzzy_pairs_oracle_sql(
    table: str,
    id_col: str,
    name_col: str,
    max_lev: int = 1,
    bucket_cap: int = BUCKET_CAP,
) -> str:
    """DuckDB twin of :func:`fuzzy_name_pairs` over a registered view."""
    return f"""
        WITH base AS (
            SELECT {id_col} AS eid, {name_col} AS name FROM {table}
        ),
        variants AS (
            SELECT DISTINCT eid, name,
                   CASE WHEN i = 0 THEN name
                        ELSE substr(name, 1, i - 1)
                             || substr(name, i + 1, length(name) - i)
                   END AS v
            FROM base, unnest(generate_series(0, length(name))) AS t(i)
        ),
        capped AS (
            SELECT * FROM (
                SELECT eid, name, v,
                       COUNT(*) OVER (PARTITION BY v) AS bsize
                FROM variants
            ) WHERE bsize <= {bucket_cap}
        ),
        cand AS (
            SELECT DISTINCT a.eid AS id_a, b.eid AS id_b,
                   a.name AS name_a, b.name AS name_b
            FROM capped a JOIN capped b
              ON a.v = b.v AND a.eid < b.eid
        )
        SELECT id_a, id_b, name_a, name_b,
               CAST(levenshtein(name_a, name_b) AS INTEGER) AS lev
        FROM cand
        WHERE levenshtein(name_a, name_b) <= {max_lev}
    """
