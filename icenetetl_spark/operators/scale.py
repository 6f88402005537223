"""Scale-out helpers: the explicit knobs you reach for when AQE's automatic
handling isn't enough at 100 TB — key-salting for skewed joins, posting-list
capping for inverted-index self-joins, bucketed tables for shuffle-free
repeated joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side with a
    uniform random bucket and replicate the small side across all buckets,
    so one hot key spreads over ``salt_buckets`` tasks instead of one.

    AQE's skew-join split handles most cases automatically (enabled in
    session.py); explicit salting remains necessary when the skew is in an
    aggregation-before-join or the small side is too big to broadcast but
    small enough to replicate 16x.

    Only inner/left/left_semi are supported: the replicated right side would
    emit unmatched right rows once PER BUCKET under right/full/anti joins —
    silently wrong, so we refuse.

    The salt is DETERMINISTIC — a hash of the whole row, not rand(): a seeded
    rand() is partition-layout-dependent, so a task retry or upstream
    repartition could re-salt the same row differently mid-job. A row hash is
    retry-stable. Rows identical in every column share a bucket (harmless for
    correctness; spreading only degrades under massive full-row duplication —
    pass a unique id column upstream if that is the actual workload).
    """
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: "
            "the replicated right side breaks right/full/anti semantics"
        )
    salt = F.pmod(F.xxhash64(*skewed.columns), F.lit(salt_buckets)).cast(
        "int"
    ).alias("__salt")
    salted_left = skewed.select("*", salt)
    buckets = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("__salt")
    replicated_right = small.select("*", buckets)
    out = salted_left.join(replicated_right, [*on, "__salt"], how)
    return out.drop("__salt")


def bloom_bitmap(
    build: DataFrame,
    key: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> list[int]:
    """Build a Bloom-filter bitmap (as int64 words) over ``build[key]``.

    The distributed part is one distinct over at most ``m_bits`` bit
    positions — the collect is bounded by the BITMAP size, never by the
    build table's cardinality, so driver state stays metadata-sized
    (m_bits=2^16 -> at most 64k ints -> 1024 words) whether the build side
    has a thousand keys or a billion. This is the same shape Spark's own
    runtime row-group filtering uses (SPARK-32268: aggregate a bloom on
    the executors, ship the bitmap, filter the probe scan); here it is an
    explicit operator so a pipeline can build the bitmap ONCE and prefilter
    many probe tables against it.

    k hash positions per key come from xxhash64 seeded by term index —
    JVM-side, zero Python in the hot path. NULL keys never equi-join, so
    callers pair this with an exact join that drops them (false positives
    are expected and harmless by contract; false negatives are impossible:
    every non-null build key sets all k of its bits).
    """
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    pos = [
        F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
        for i in range(k_hashes)
    ]
    rows = (
        build.select(F.explode(F.array(*pos)).alias("p")).distinct().collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    # int64 two's complement: bit 63 set would overflow F.lit's LongType
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_prefilter(
    probe: DataFrame,
    words: list[int],
    key: str,
    k_hashes: int = 3,
) -> DataFrame:
    """Keep only ``probe`` rows whose ``key`` MIGHT be in the bloom bitmap
    (superset-of-matches guarantee: false positives pass, true matches
    always pass — PROVIDED ``k_hashes`` equals the value the bitmap was
    built with; probing bits the build never set would re-admit false
    negatives, so pass both through one call site like bloom_semi_join
    does). Pure column arithmetic — the bit tests are getbit over an
    array<long> literal, so the filter runs inside the scan stage BEFORE
    any exchange: at 100 TB this is the lever that keeps a selective
    big-big join from shuffling the entire probe table."""
    m_bits = len(words) * 64
    lit_words = F.lit(words)
    cond = None
    for i in range(k_hashes):
        p = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
        word = F.element_at(lit_words, (p / F.lit(64)).cast("int") + F.lit(1))
        hit = F.getbit(word, F.pmod(p, F.lit(64)).cast("int")) == 1
        cond = hit if cond is None else cond & hit
    return probe.filter(cond)


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """Semi-join ``probe`` to ``build`` on ``key`` with a Bloom prefilter:
    result rows are EXACTLY the plain left-semi join's (the exact join
    removes bloom false positives and NULL-key passthroughs), but the rows
    entering the join exchange are only the bitmap survivors. Use when the
    build side is too large to broadcast as a hash relation yet its BITMAP
    fits anywhere (it always does: m_bits is fixed), and the probe side is
    the 100-TB table. Bitmap internals never affect the result, so the
    fast JVM xxhash64 is used without any oracle-reproducibility cost."""
    words = bloom_bitmap(build, key, m_bits=m_bits, k_hashes=k_hashes)
    pre = bloom_prefilter(probe, words, key, k_hashes=k_hashes)
    return pre.join(build.select(key), key, "left_semi")


def cap_document_frequency(
    postings: DataFrame,
    max_df: int,
    term_col: str = "shingle",
) -> DataFrame:
    """Drop terms whose posting list exceeds ``max_df`` documents before an
    inverted-index self-join (dedup.jaccard_pairs / minhash candidates).

    A boilerplate shingle occurring in 10^6 documents would contribute
    10^12 candidate pairs — the classic quadratic blowup. Capping is both a
    performance guard and standard dedup practice (ubiquitous shingles carry
    no signal).

    Implemented as a count window over ``term_col`` rather than a
    groupBy+join: ONE hash shuffle instead of two, and the output stays
    hash-partitioned by the term — a downstream inverted-index self-join on
    the same key starts from the already-partitioned exchange instead of
    reshuffling (ReuseExchange then shares it across both join sides).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(term_col)
    return (
        postings.withColumn("__df", F.count(F.lit(1)).over(w))
        .filter(F.col("__df") <= max_df)
        .drop("__df")
    )


def _spread_bits(x: F.Column) -> F.Column:
    """Spread the low 32 bits of ``x`` so bit i lands at position 2i (the
    standard mask-shift Morton spread) — pure codegen arithmetic."""
    x = (x.bitwiseOR(F.shiftleft(x, 16))).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x3333333333333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x5555555555555555))
    return x


def morton_code(x: F.Column, y: F.Column) -> F.Column:
    """Interleave the bits of two non-negative bucket ids into one Z-order
    key: points close in BOTH dimensions get close codes, so sorting by the
    code co-locates them — the mechanism behind Delta's OPTIMIZE ZORDER.
    Inputs must already be bounded non-negative ints (bucketed ranks or
    scaled values); see ``zorder_key`` for the scaling wrapper."""
    return _spread_bits(x.cast("long")).bitwiseOR(
        F.shiftleft(_spread_bits(y.cast("long")), 1)
    )


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16
) -> F.Column:
    """Z-order key over two columns: each column is min/max-scaled to a
    ``bits``-bit bucket (one 1-row aggregate collected as metadata — the
    same k-row-driver-state pattern as the prefix-sum operators), then
    Morton-interleaved. Linear scaling assumes roughly uniform columns; for
    heavily skewed ones substitute range-bucketed ranks (what Delta does
    with boundary sampling) — same interleave."""
    if len(cols) != 2:
        raise ValueError("zorder_key interleaves exactly 2 columns")
    # bits=32 would spread a bucket's bit 31 to position 62, and the y side's
    # extra shift lands it on the int64 SIGN bit — high-y rows would sort
    # before low-y ones, silently destroying the clustering. Beyond 32 the
    # spread masks drop bits. 31 is the widest sign-safe width.
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    stats = df.agg(*aggs).collect()[0]
    if any(stats[f"__mn_{c}"] is None or stats[f"__mx_{c}"] is None for c in cols):
        # empty table or an all-null clustering column: nothing to order —
        # a constant key makes cluster_by a no-op instead of a TypeError
        return F.lit(0).cast("long")
    buckets = []
    for c in cols:
        lo, hi = stats[f"__mn_{c}"], stats[f"__mx_{c}"]
        span = max(float(hi) - float(lo), 1e-300)
        scaled = (
            (F.col(c).cast("double") - F.lit(float(lo)))
            / F.lit(span)
            * F.lit((1 << bits) - 1)
        )
        buckets.append(F.floor(scaled).cast("long"))
    return morton_code(buckets[0], buckets[1])


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int = 32,
) -> None:
    """Persist as a bucketed+sorted managed table: repeated equi-joins or
    aggregations on ``keys`` between co-bucketed tables run WITHOUT a
    shuffle (the sort-merge join reads pre-partitioned, pre-sorted buckets).

    This is the Spark equivalent of the co-location the reference gets
    implicitly from Postgres-side joins, and the standing replacement for
    its B-tree indexes on join keys (processor.py:286-288).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a dropped-from-catalog table can leave its managed location behind
    # (e.g. fresh in-memory metastore over a reused warehouse dir)
    import os
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(wh.removeprefix("file:"), table.lower())
    if wh and os.path.isdir(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )
