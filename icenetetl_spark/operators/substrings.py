"""Exact-substring duplication spans — the suffix-array-style dedup signal
of Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022, public), re-expressed relationally: instead of a distributed
suffix array, every character position contributes its k-gram; positions
whose k-gram occurs more than once in the corpus are "duplicated", and
maximal runs of duplicated positions merge into spans via gaps-and-islands.
A position is covered by a repeated substring of length >= k iff one of its
k-grams repeats, so the merged spans are exactly the >= k-length repeated
regions the suffix-array method reports.

Scale shape: the gram table is O(total characters); its hash groupBy is
the one data-sized shuffle (grams travel as 8-byte hashes, not strings).
The duplicated-gram join reuses the same hash partitioning, and the island
window is partitioned per document — never global.

The 100-TB lever is ``sample_mod``: CONTENT-DEFINED gram sampling (keep a
position iff gram_hash % sample_mod == 0 — the winnowing/mod-p idea of
Schleimer et al. SIGMOD 2003, public). Every stage after the map-side
hash (the shuffle, the duplicate groupBy, the join, the island window)
then carries ~1/sample_mod of the rows. Content-defined, NOT positional:
a fixed position stride would sample DIFFERENT substrings in two
alignment-shifted copies of a repeat, so their hashes would never match
and detection would collapse; keying the sample on the hash itself means
every copy of a repeated substring samples identically, and a sampled
gram's occurrence count is EXACT (no count dilution). Misses are only
regions none of whose grams hash to 0 mod s — probability ~(1-1/s)^(L-k+1)
for a repeated region of length L — plus <= s-1 characters of boundary
shrinkage per side (recall pinned vs sample_mod=1 in
tests/test_substrings.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from icenetetl_spark.functions.portable import portable_hash64

DEFAULT_K = 20


def kgram_positions(
    docs: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_bits: int = 48,
    hash_impl: str | None = None,
    sample_mod: int = 1,
) -> DataFrame:
    """(doc_id, pos, gram_hash) for every character position (1-based,
    stride 1). Documents shorter than k contribute nothing (the filter also
    guards F.sequence, which would count DOWN for an upper bound < 1).

    48-bit hashes: a colliding pair of UNIQUE grams would falsely mark
    both duplicated; expected collisions ~ n^2/2^49 stay below one up to
    ~10^7 grams per corpus (32 bits produced 2 false spans on even the
    0.001 test corpus).

    ``sample_mod`` > 1 keeps only positions with gram_hash % sample_mod
    == 0 (content-defined sampling — see module docstring): the filter
    runs map-side inside the same codegen stage as the hash, so the
    gram-table shuffle and everything after it shrink by ~1/sample_mod.
    """
    from icenetetl_spark.operators.scale import spread

    # r13 (guide §2.5): the per-position hash below is the most CPU-dense
    # projection in the repo (~k bytes hashed per text byte); a row-group-
    # bound scan would run it on one core. spread() is a no-op once the
    # input is parallel (see its docstring).
    docs = spread(docs, id_col)
    n = F.length(F.col(text_col))
    grams = (
        docs.filter(n >= k)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(1), n - F.lit(k) + F.lit(1))
            ).alias("pos"),
            F.col(text_col),
        )
        .select(
            id_col,
            "pos",
            portable_hash64(
                F.substring(F.col(text_col), F.col("pos"), k),
                bits=hash_bits,
                impl=hash_impl,
            ).alias("gram_hash"),
        )
    )
    if sample_mod > 1:
        grams = grams.filter(F.col("gram_hash") % sample_mod == 0)
    return grams


def _duplicated_positions(grams: DataFrame, id_col: str) -> DataFrame:
    """(id, pos) of every position whose k-gram occurs more than once.

    Window-count form (round 11): ONE pass over the gram table — count
    over ``partitionBy(gram_hash)`` then filter — instead of the
    groupBy + join-back form, which scanned and re-HASHED the whole text
    twice (the gram frame fed both the dup aggregate and the join probe;
    the md5-per-position pass is ~21% of the query wall, so the second
    scan was pure waste). Same one data-sized exchange on gram_hash; the
    window's per-group buffering is bounded by the gram's occurrence
    count (tiny by construction — most grams are unique). Measured
    interleaved at sf0.1: duplicated_spans 12.25s -> 3.61s (3.4x);
    values identical on the full 84,903-row output (the oracle keeps
    the relational dup-CTE form). Under a 10x boilerplate-skew corpus
    (hot k-grams shared by 1/3 of 50k docs) the window form stays ahead
    4.41s vs 17.54s — the hot-gram window group there is only ~17k rows
    (positions per gram, not per document), far below buffering concern.
    Boundary: a single gram shared by ~10^8+ positions would buffer one
    spill-backed window group in one task while the join form's SMJ can
    be AQE-skew-split; if a corpus ever exhibits that, reintroduce the
    groupBy+join form for the affected run (same values, +1 text scan)
    or strip stop-grams upstream via the content-defined sample."""
    wdup = Window.partitionBy("gram_hash")
    return (
        grams.withColumn("n_occ", F.count(F.lit(1)).over(wdup))
        .filter(F.col("n_occ") > 1)
        .select(id_col, "pos")
    )


def duplicated_spans(
    docs: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_impl: str | None = None,
) -> DataFrame:
    """Maximal spans (doc_id, span_start, span_end, span_len) of text whose
    every k-window also occurs elsewhere in the corpus (or again in the
    same document). span bounds are 1-based inclusive character offsets.

    DISPATCH RULE (r12 verdict #3): this exact every-position form is the
    audit/gate plan — linear shape but the largest constant in the dedup
    family (7.2x at 100x, 40.7s absolute; SCALING.md). At corpus scale
    default to the winnowing-sampled form (``kgram_positions`` with
    ``sample_mod`` ~ k/2, consumed by ``duplication_profile`` /
    ``dedup_substring_sampled``): every post-hash stage carries
    ~1/sample_mod of the rows at a pinned recall floor (content-defined
    sampling never desyncs across copies — module docstring), so the
    exact form is for when per-character span OFFSETS must be exact,
    the sampled form for dedup DECISIONS."""
    grams = kgram_positions(docs, k, id_col, text_col, hash_impl=hash_impl)
    pos_dup = _duplicated_positions(grams, id_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        pos_dup.withColumn("island", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k) - F.lit(1)).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
        )
    )


def duplication_profile(
    docs: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_impl: str | None = None,
    sample_mod: int = 1,
) -> DataFrame:
    """Per-document duplication signal: number of duplicated REGIONS, total
    duplicated characters (union coverage), and the duplicated fraction of
    the text — the quality feature a curation pipeline thresholds on.

    Distinct from summing span lengths: two spans whose duplicated
    positions sit less than k apart overlap in character coverage (each
    position covers [pos, pos+k-1]), so the profile merges positions with
    gap <= k into coverage regions (lag + running-sum islands — the
    variable-gap form of gaps-and-islands) and dup_frac is guaranteed in
    [0, 1]. Documents with no duplication appear with zeros.

    ``sample_mod`` > 1 estimates the profile from the content-defined
    gram sample (the scale lever): sampled duplicated positions are a
    SUBSET of the exact ones and occurrence counts stay exact, so the
    estimated coverage never exceeds the exact coverage — dup_chars and
    dup_frac are conservative (recall pinned in tests/test_substrings.py).
    The gap<=k region merge is kept: within a real duplicated region
    sampled positions sit ~sample_mod apart, so for sample_mod < k they
    still fuse into one region."""
    grams = kgram_positions(
        docs, k, id_col, text_col, hash_impl=hash_impl, sample_mod=sample_mod
    )
    pos_dup = _duplicated_positions(grams, id_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    regions = (
        pos_dup.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > k),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("region", F.sum("brk").over(wrun))
        .groupBy(id_col, "region")
        .agg((F.max("pos") + F.lit(k) - F.min("pos")).alias("cov_chars"))
    )
    agg = regions.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_regions"),
        F.sum("cov_chars").alias("dup_chars"),
    )
    return (
        docs.select(id_col, F.length(F.col(text_col)).alias("n_chars"))
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_regions", F.lit(0).cast("long")).alias("n_regions"),
            F.coalesce("dup_chars", F.lit(0).cast("long")).alias("dup_chars"),
            (
                F.coalesce("dup_chars", F.lit(0).cast("long")).cast("double")
                / F.col("n_chars")
            ).alias("dup_frac"),
        )
    )
