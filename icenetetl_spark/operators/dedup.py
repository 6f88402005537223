"""Document deduplication operators for large-scale training-data pipelines.

Four families, all pure DataFrame plans (no Python row loops):

- exact        : hash-groupBy on a normalized-text fingerprint
- ngram Jaccard: word n-gram shingles -> inverted-index self-join -> exact
                 Jaccard (the verification stage of a MinHash pipeline)
- MinHash+LSH  : K permutation-min signatures in ONE aggregation pass
                 (K min() aggregates — no K-way row explosion), banded into
                 LSH buckets; candidate pairs from band-equality self-join
- SimHash      : bit-majority fingerprint, one aggregation pass, B bit
                 columns folded into an integer

Scale notes (100 TB):
- Every stage is a hash-shuffle keyed by doc_id or shingle/band — fully
  distributed, no driver-side state.
- The shingle inverted index is the dominant shuffle; hot shingles (boiler-
  plate) are the classic skew source — cap posting-list length per shingle
  (drop shingles with document-frequency above a threshold) before the
  self-join, which is also standard practice quality-wise.
- Hashes here use a portable md5-derived integer (functions.portable) so the
  DuckDB oracle reproduces them bit-for-bit; on a real cluster swap
  ``portable_hash64`` for ``F.xxhash64`` (same plan, ~10x cheaper per
  row; 1.2-1.5x end-to-end — SCALING.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from icenetetl_spark.functions.portable import portable_hash64
from icenetetl_spark.operators import scale as _scale

MERSENNE_P = 2_147_483_647  # 2^31 - 1


def normalize_text(col: F.Column) -> F.Column:
    """Lowercase + whitespace-collapse + trim; the canonical form all dedup
    operators hash. regex kept to ``\\s+`` (identical Java/RE2 semantics)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group by normalized-text fingerprint: canonical (min) id + copy count.
    Equivalent semantics to the reference's GROUP-BY-dedup (processor.py:431)
    lifted to content hashing."""
    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    return (
        docs.select(F.col(id_col), fp)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Split on single space (documents are single-spaced); docs shorter than
    ``n`` words produce no shingles.
    """
    # Materialize the split FIRST, in its own projection. Higher-order
    # function lambdas are interpreted per element (not codegen'd), so an
    # expression referenced inside the lambda — here the element_at(words,…)
    # lookups — would re-run split(text) for EVERY element: O(words^2) per
    # document. Binding `words` to a column attribute makes it once-per-row.
    # Measured 5.4x on the shingle stage at sf0.1.
    # r13 (guide §2.5): the interpreted shingle lambda below is heavy per
    # row; a row-group-bound scan would run it on one core. spread() is a
    # no-op once the input is parallel (operators/scale.py).
    docs = _scale.spread(docs, id_col)
    wdf = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("__words")
    )
    w = F.col("__words")
    idx = F.sequence(F.lit(0), F.size(w) - n)
    shingle = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
    )
    # The distinct is PER DOCUMENT, so run it inside the row
    # (array_distinct before explode) — a `.distinct()` after explode would
    # hash-shuffle the entire shingle table for a purely local property.
    return wdf.filter(F.size(w) >= n).select(
        "doc_id", F.explode(F.array_distinct(shingle)).alias("shingle")
    )


def split_passages(
    docs: DataFrame,
    mode: str = "paragraph",
    window: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, para_idx, passage): sub-document units for passage-level
    dedup (RefinedWeb/Gopher dedup at line/paragraph granularity — real
    pretraining pipelines dedup BELOW the document, since boilerplate
    repeats inside otherwise-unique pages).

    ``mode='paragraph'``: split on blank lines (``\\n\\n``) — the natural
    unit when the corpus has layout. ``mode='window'``: non-overlapping
    ``window``-word chunks of the normalized text — the granularity fallback
    for single-line corpora (and the shape used for span-level
    decontamination). Both are pure JVM expressions: split + sequence +
    slice + posexplode, no shuffle until the caller aggregates."""
    if mode == "paragraph":
        paras = F.split(F.col(text_col), r"\n{2,}")
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(paras).alias("para_idx", "passage"),
        ).filter(F.trim(F.col("passage")) != "")
    if mode != "window":
        raise ValueError(f"unknown passage mode {mode!r}")
    wdf = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__words"),
    )
    w = F.col("__words")
    n_chunks = F.ceil(F.size(w) / F.lit(float(window))).cast("int")
    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i * window + 1, window)),
    )
    return wdf.filter(F.size(w) > 0).select(
        "doc_id", F.posexplode(chunk).alias("para_idx", "passage")
    )


CDC_NGRAM = 4  # a boundary is decided by the hash of the trailing 4-gram


def cdc_segments(
    docs: DataFrame,
    divisor: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str | None = None,
) -> DataFrame:
    """(doc_id, para_idx, passage): CONTENT-DEFINED segmentation — the
    rsync/LBFS chunking idea at token granularity. A boundary falls after
    token i wherever ``H(w[i-3..i]) % divisor == 0`` (expected segment
    length ≈ ``divisor`` tokens), so boundaries depend only on LOCAL
    content: inserting or deleting a sentence moves at most the two
    adjacent segments, where fixed-width windows (split_passages
    mode='window') shift EVERY later chunk and miss all post-edit dups.
    Output contract matches split_passages, so passage_dup_stats composes.

    Plan shape: ENTIRELY array-side until the final posexplode — boundary
    positions are one filter over the token array, and each segment is a
    slice between consecutive boundaries. No per-token explode, no window,
    no collect_list regroup: chunking introduces ZERO shuffles (the first
    exchange belongs to whatever aggregates the passages). At sf0.1 the
    boundary hashing dominates and this is a wash; at 10x it measured
    1.8x cheaper (27s -> 15s) than the explode+window formulation it
    replaced, and the gap widens with document count since the removed
    per-token exchange scaled with total tokens. The oracle keeps the
    window formulation — identical passages either way, which the hash
    gate proves."""
    if divisor < 1:
        raise ValueError(f"divisor must be >= 1, got {divisor}")
    wdf = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    ).filter(F.size("__w") > 0)
    w = F.col("__w")
    n = F.size(w)
    # 0-based positions i with a boundary AFTER token i
    bpos = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda i: (i >= CDC_NGRAM - 1)
        & (
            portable_hash64(
                F.concat_ws(" ", F.slice(w, i - (CDC_NGRAM - 2), CDC_NGRAM)),
                32,
                impl,
            )
            % divisor
            == 0
        ),
    )
    wdf = wdf.withColumn("__b", bpos)
    b = F.size(F.col("__b"))
    # a boundary after the LAST token would open an empty trailing
    # segment; k ranges over segments that actually contain tokens
    kmax = F.when(
        (b > 0) & (F.element_at(F.col("__b"), b) == n - 1), b - 1
    ).otherwise(b)
    segs = F.transform(
        F.sequence(F.lit(0), kmax),
        lambda k: F.concat_ws(
            " ",
            F.slice(
                F.col("__w"),
                # segment k starts after boundary k-1 (1-based tokens)
                F.when(k == 0, F.lit(1)).otherwise(
                    F.element_at(F.col("__b"), k) + 2
                ),
                # ...and runs to boundary k (inclusive) or the end
                F.when(
                    k < b, F.element_at(F.col("__b"), k + 1) + 1
                ).otherwise(n)
                - F.when(k == 0, F.lit(1)).otherwise(
                    F.element_at(F.col("__b"), k) + 2
                )
                + 1,
            ),
        ),
    )
    return wdf.select(
        "doc_id", F.posexplode(segs).alias("para_idx", "passage")
    ).select("doc_id", F.col("para_idx").cast("long").alias("para_idx"), "passage")


def passage_dup_stats(passages: DataFrame) -> DataFrame:
    """(doc_id, n_passages, n_dup_passages, dup_frac): per-document
    fraction of passages whose fingerprint occurs in >= 2 DISTINCT
    documents — the para-dup quality signal a corpus-prep pipeline
    thresholds on.

    Shuffle budget: ONE exchange on the fingerprint + one per-doc
    aggregate, in a single pass over the passages (round 11 — the
    substrings.py lesson): the previous groupBy(countDistinct) +
    join-back form scanned ``passages`` twice, re-running the passage
    SEGMENTATION (split/CDC) both times. countDistinct isn't a window
    function, so the per-fingerprint distinct-doc count is the
    dense_rank-max identity over one sorted window partitioning —
    max(dense_rank over (f ORDER BY doc_id)) == countDistinct(doc_id) —
    with the unordered max riding the same exchange/sort. Measured 1.2x
    on the 10x corpus with identical values on all 50k rows; the hot-
    fingerprint buffering boundary is the same as
    substrings._duplicated_positions (documented there). The passage
    text itself never shuffles — only its md5."""
    fp = passages.select(
        "doc_id", "para_idx", F.md5(F.col("passage")).alias("f")
    )
    w_sorted = Window.partitionBy("f").orderBy("doc_id")
    w_all = Window.partitionBy("f")
    marked = fp.withColumn(
        "__rk", F.dense_rank().over(w_sorted)
    ).withColumn("__nd", F.max("__rk").over(w_all))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.count(F.when(F.col("__nd") >= 2, 1)).alias("n_dup_passages"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dup_passages",
            (
                F.col("n_dup_passages").cast("double")
                / F.col("n_passages").cast("double")
            ).alias("dup_frac"),
        )
    )


def jaccard_pairs(shingles: DataFrame, threshold: float) -> DataFrame:
    """Exact n-gram Jaccard similarity over all candidate pairs sharing at
    least one shingle (inverted-index self-join, no O(n^2) cross join).

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.

    Shuffle budget: per-doc shingle counts ride ALONG the postings as a
    window column instead of a separate aggregate joined back twice — the
    count is constant within each (doc, *) group, so the intersection
    aggregation carries it with min(). That turns the old
    5-exchange plan (counts groupBy + self-join + pair groupBy + 2 count
    joins) into: window(doc_id) -> self-join on shingle (both sides are the
    same subplan — ReuseExchange computes it once) -> pair groupBy.
    """
    from pyspark.sql.window import Window

    sh = shingles.withColumn(
        "n_shingles", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("inter"),
            # constant within the group (it's doc_a's/doc_b's shingle count)
            F.min("a.n_shingles").alias("na"),
            F.min("b.n_shingles").alias("nb"),
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return (
        inter.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _minhash_params(num_hashes: int) -> list[tuple[int, int, int]]:
    """Deterministic (h, a, b) permutation parameters (odd multipliers)."""
    return [(h, 2 * h + 1, 7919 * h + 13) for h in range(num_hashes)]


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """K-column MinHash signature in ONE shuffle: groupBy(doc_id) with K
    min() aggregates over (a_k * H(shingle) + b_k) mod (2^31-1).

    This is the scale-correct plan: the naive formulation cross-joins the
    shingle table with K hash rows (K-fold row explosion before the shuffle);
    here the K permutations ride the same partial-aggregation pass.
    """
    base = portable_hash64(F.col("shingle"), bits=32)
    aggs = [
        F.min((F.lit(a) * base + F.lit(b)) % MERSENNE_P).alias(f"mh{h}")
        for (h, a, b) in _minhash_params(num_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def minhash_estimate_pairs(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs WITH their MinHash-estimated Jaccard: the
    fraction of agreeing signature components (the unbiased estimator, the
    'estimate' step between candidate generation and exact verification —
    at 100 TB the estimate prunes candidates WITHOUT touching the shingle
    sets again, deferring the exact-Jaccard join to the survivors).

    Plan: candidate pairs from the banded self-join, then ONE join back to
    the K-column signature table per side (K ints per doc — the signature
    table is |docs| rows, not |shingles|) and a pure-codegen K-way
    agreement count.
    """
    pairs = lsh_candidate_pairs(signatures, num_hashes, bands)
    sig_a = signatures.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{h}").alias(f"a{h}") for h in range(num_hashes)],
    )
    sig_b = signatures.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{h}").alias(f"b{h}") for h in range(num_hashes)],
    )
    agree = sum(
        F.when(F.col(f"a{h}") == F.col(f"b{h}"), 1).otherwise(0)
        for h in range(num_hashes)
    )
    return (
        pairs.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (agree.cast("double") / F.lit(num_hashes)).alias("est_jaccard"),
        )
    )


def lsh_band_index(
    signatures: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(doc_id, band_idx, band_sig): the LSH INDEX — the table a long-lived
    dedup service persists (partitioned by (band_idx, band_sig) bucket at
    scale) so new batches probe it instead of recomputing the corpus.

    Explodes one array of (band_idx, band_sig) structs instead of a
    UNION ALL of per-band selects: a union would re-evaluate the whole
    signature subtree (shingle explode + shuffle!) once per band — measured
    2x end-to-end cost at sf0.1. With explode the subtree runs once, and
    a self-join's two sides are identical subplans, so Spark's
    ReuseExchange shares the shuffle."""
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}); "
            "a remainder would silently drop trailing signature columns and "
            "weaken the LSH collision guarantee"
        )
    rows_per_band = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(bi).alias("band_idx"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{bi * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            ).alias("band_sig"),
        )
        for bi in range(bands)
    ]
    return signatures.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select(
        "doc_id",
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_sig").alias("band_sig"),
    )


def lsh_probe_pairs(index: DataFrame, new_index: DataFrame) -> DataFrame:
    """Incremental index maintenance: candidate pairs INVOLVING the new
    batch — new-vs-indexed (equi-join on (band_idx, band_sig), canonical
    lo/hi orientation) plus new-vs-new (the usual banded self-join). With
    ``index`` = bands of all previously ingested docs, this equals the
    full-corpus ``lsh_candidate_pairs`` restricted to pairs touching the
    batch (pinned by test and oracle) — the corpus is never rescanned, so
    per-batch cost is O(batch + matched buckets) instead of O(corpus)."""
    n, i = new_index.alias("n"), index.alias("i")
    cross = (
        n.join(
            i,
            (F.col("n.band_idx") == F.col("i.band_idx"))
            & (F.col("n.band_sig") == F.col("i.band_sig"))
            & (F.col("n.doc_id") != F.col("i.doc_id")),
        )
        .select(
            F.least(F.col("n.doc_id"), F.col("i.doc_id")).alias("doc_a"),
            F.greatest(F.col("n.doc_id"), F.col("i.doc_id")).alias("doc_b"),
        )
    )
    a, b = new_index.alias("a"), new_index.alias("b")
    within = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_sig") == F.col("b.band_sig"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )
    return cross.unionByName(within).distinct()


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the K-column signature into ``bands`` groups of K/bands rows;
    documents agreeing on ALL rows of any band become a candidate pair.

    Returns distinct (doc_a, doc_b), doc_a < doc_b. The band self-join is an
    equi-join on (band_idx, band_signature) — hash-partitioned, distributed.
    (The num_hashes/bands divisibility guard lives in lsh_band_index.)

    ``max_bucket`` is the hot-band-bucket skew lever (the df-cap idea
    applied to band keys): a (band_idx, band_sig) bucket of n docs emits
    n(n-1)/2 candidates, so boilerplate-heavy corpora concentrate
    quadratic work in a few buckets (SCALING.md's skew stress measures the
    uncapped plan at 1.07x wall at 10x volume with a third of docs sharing
    one sentence — mild there because the synthetic boilerplate lands in a
    handful of bands, but per-bucket work is quadratic in bucket size by
    construction, so the cap is the bound that keeps a real mega-cluster
    from emitting corpus-squared candidates). Buckets larger than the cap
    are DROPPED before the join — an explicit recall trade: members of an
    over-cap bucket are near-dups of so many docs they almost always share
    another (smaller) band bucket, and the docs a cap could orphan are
    exactly the mega-cluster boilerplate a pipeline should route to
    dedup_exact/components instead. Default None keeps the exact semantics
    the oracle gates.

    The cap is a count WINDOW over the band key, not a groupBy+join
    (same rationale as scale.cap_document_frequency): one hash shuffle
    instead of two, and the filtered output stays hash-partitioned on
    (band_idx, band_sig) so the band self-join that follows reuses the
    exchange instead of reshuffling both sides."""
    from pyspark.sql.window import Window

    banded = lsh_band_index(signatures, num_hashes, bands)
    if max_bucket is not None:
        w = Window.partitionBy("band_idx", "band_sig")
        banded = (
            banded.withColumn("__n", F.count(F.lit(1)).over(w))
            .filter(F.col("__n") <= max_bucket)
            .drop("__n")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash(
    docs: DataFrame,
    num_bits: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    spread_input: bool = True,
) -> DataFrame:
    """Per-document SimHash: majority vote of each hash bit across all word
    occurrences, folded into an integer. One explode (words) + one shuffle
    (groupBy doc) with ``num_bits`` sum() aggregates — no bits-axis explosion.
    """
    # r13 (guide §2.5): per-word md5 over a row-group-bound scan would run
    # on one core; spread() is a no-op once parallel (operators/scale.py).
    # Measured per consumer: plain dedup_simhash 0.71x, but the quotient
    # top-n consumer re-evaluates this subtree twice and came back 1.2x
    # WITH the exchange (interleaved 4-rep A/B) — it opts out.
    if spread_input:
        docs = _scale.spread(docs, id_col)
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word"),
    )
    h = portable_hash64(F.col("word"), bits=32)
    aggs = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(num_bits)
    ]
    sums = words.groupBy("doc_id").agg(*aggs)
    sim = None
    for j in range(num_bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return sums.select("doc_id", sim.cast("long").alias("simhash"))


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its STRICTLY LARGER
    neighbors to the minimum of its closed neighborhood. Edges are kept in
    canonical (hi > lo) orientation throughout."""
    nbrs = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
        edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    mins = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select("u", F.least("__mv", "u").alias("m"))
    )
    # emit (v, m) for v > u; m <= u < v so the result is canonical and
    # self-loop-free by construction
    return (
        nbrs.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node re-points its smaller neighbors
    (and itself) at the minimum of those neighbors."""
    smins = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    relinked = (
        edges.join(smins, "hi")
        .filter(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
    )
    stars = smins.select("hi", F.col("m").alias("lo"))
    return relinked.unionByName(stars).distinct()


def connected_components(
    pairs: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Duplicate GROUPS from duplicate PAIRS: transitive closure of the
    near-dup graph, each node labeled with the smallest doc_id reachable
    from it ((doc_id, component_id) rows; isolated docs are simply absent).

    Alternating LARGE-STAR / SMALL-STAR rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014): each round is two
    hash-partitioned groupBy-min + join passes over the edge set, and the
    edge set converges to one star per component centered at the component
    minimum in O(log^2 n) rounds WORST CASE — independent of graph
    diameter. The min-label-propagation alternative needs diameter-many
    rounds: an adversarial near-dup CHAIN of length L (A~B~C~... from
    sliding boilerplate) would take L rounds and silently return
    non-converged labels past any fixed iteration cap. Star convergence is
    verified per round with a 1-row existence check; exhausting ``max_iter``
    raises instead of returning wrong labels (25 alternations cover graphs
    astronomically past any real corpus).
    """
    # canonical orientation: input contract is doc_a < doc_b
    edges = (
        pairs.select(F.col("doc_b").alias("hi"), F.col("doc_a").alias("lo"))
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        # Materialize and truncate lineage every round: without this the
        # plan nests two joins deeper per iteration and each convergence
        # check re-runs the whole history. Cluster swap: reliable
        # df.checkpoint() (see operators/sampling.py note).
        .localCheckpoint(eager=True)
    )
    if edges.isEmpty():
        return edges.select(
            F.col("hi").alias("doc_id"), F.col("lo").alias("component_id")
        )

    def _star_violation(e: DataFrame) -> bool:
        """True iff ``e`` is NOT yet a disjoint star forest: some hi holds
        two edges, or some lo also appears as a hi. r13 convergence test
        (replaces the old new-vs-old symmetric-difference): star-form is
        EQUIVALENT to being a round fixpoint — a star forest maps to
        itself through both stars (leaves' closed-neighborhood min and
        his' lo-min are both the center), and conversely the alternation's
        fixpoints are exactly disjoint stars centered at component minima
        (Kiveris et al. §4) — so testing the NEW edge set alone stops the
        loop ONE ROUND EARLIER than detecting no-change (the old check had
        to run a full large+small round just to observe equality), scans
        one checkpointed side instead of two anti-joined ones, and allows
        a zero-round exit when the input pairs already form stars. One
        job: each edge contributes its two endpoints tagged hi/lo, one
        partial-aggregated groupBy counts roles per node, limit(1) on any
        violator."""
        nodes = e.select(
            F.explode(
                F.array(
                    F.struct(F.col("hi").alias("n"), F.lit(1).alias("h")),
                    F.struct(F.col("lo").alias("n"), F.lit(0).alias("h")),
                )
            ).alias("x")
        ).select("x.n", "x.h")
        return bool(
            nodes.groupBy("n")
            .agg(F.sum("h").alias("hn"), F.count(F.lit(1)).alias("cn"))
            .filter(
                (F.col("hn") >= 2)
                | ((F.col("hn") >= 1) & (F.col("cn") > F.col("hn")))
            )
            .limit(1)
            .count()
        )

    # max_iter + 1 checks bound max_iter ROUNDS (the first check may pass
    # on the input itself; the last iteration checks WITHOUT running
    # another round — ADVICE r13 #3: the old loop ran a max_iter+1-th
    # round before raising) — the "25 alternations" contract, exactly.
    for i in range(max_iter + 1):
        if not _star_violation(edges):
            break
        if i == max_iter:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "large/small-star rounds"
            )
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
    # fixpoint = disjoint stars: (hi -> lo=root) plus the roots themselves
    return (
        edges.select(F.col("hi").alias("doc_id"), F.col("lo").alias("component_id"))
        .unionByName(
            edges.select(
                F.col("lo").alias("doc_id"), F.col("lo").alias("component_id")
            )
        )
        .distinct()
    )


def simhash_near_pairs(
    sim: DataFrame, max_hamming: int = 3, num_bits: int = 16
) -> DataFrame:
    """Pairs within ``max_hamming`` bits, via the PIGEONHOLE segment join
    (Manku et al., "Detecting Near-Duplicates for Web Crawling", WWW 2007):
    split the ``num_bits`` fingerprint into ``max_hamming + 1`` disjoint
    segments — any pair differing in at most ``max_hamming`` bits must agree
    EXACTLY on at least one segment. So: explode each fingerprint into its
    segments, equi-join on (segment index, segment value), refine with the
    exact Hamming distance, distinct (a pair can collide on several
    segments). Output is identical to the all-pairs O(n²) filter form by
    construction — same DuckDB oracle — but the join is a hash-partitioned
    equi-join: linear shuffle, distributed, survives 100×.
    """
    if num_bits < max_hamming + 1:
        raise ValueError(
            f"num_bits ({num_bits}) must be >= max_hamming + 1 "
            f"({max_hamming + 1}): fewer bits than segments yields zero-width "
            "segments whose value is 0 for every row, silently degenerating "
            "the pigeonhole equi-join into an all-pairs join"
        )
    nseg = max_hamming + 1
    base, rem = divmod(num_bits, nseg)
    seg_structs, off = [], 0
    for i in range(nseg):
        width = base + (1 if i < rem else 0)
        seg_structs.append(
            F.struct(
                F.lit(i).alias("seg_idx"),
                F.shiftright(F.col("simhash"), off)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("seg_val"),
            )
        )
        off += width
    # One explode, self-join on identical subplans -> ReuseExchange shares
    # the shuffle (same trick as lsh_candidate_pairs).
    segs = sim.select(
        "doc_id", "simhash", F.explode(F.array(*seg_structs)).alias("s")
    ).select("doc_id", "simhash", "s.seg_idx", "s.seg_val")
    a, b = segs.alias("a"), segs.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _hamming_ball_masks(spark, num_bits: int, max_hamming: int) -> DataFrame:
    """All XOR masks of popcount <= max_hamming over num_bits, with their
    popcount — the Hamming ball around 0, as a tiny broadcastable DataFrame
    (mask count = sum of C(num_bits, d); 697 for 16 bits / h=3). Built as a
    local list (a few thousand rows at most under the enumeration
    strategy's dispatch bound), never a per-row py4j literal."""
    from itertools import combinations

    rows = [
        (sum(1 << b for b in combo), d)
        for d in range(0, max_hamming + 1)
        for combo in combinations(range(num_bits), d)
    ]
    return spark.createDataFrame(rows, "mask long, hamming int")


# auto-dispatch bound for the enumeration strategy: per-row join fan-out is
# exactly the mask count, so 2048 caps the candidate blow-up at ~2048 rows
# per doc — past that (e.g. 32-bit fingerprints, 5489 masks at h=3) the
# pigeonhole segment join's occupancy-dependent cost wins back
MASK_ENUM_MAX = 2048


def simhash_topn_pairs(
    sim: DataFrame,
    max_hamming: int = 3,
    num_bits: int = 16,
    per_doc: int = 5,
    symmetric: bool = False,
    strategy: str = "auto",
) -> DataFrame:
    """Per-doc BOUNDED near-dup shortlist: for each ``doc_a``, its
    ``per_doc`` nearest ``doc_b > doc_a`` by (hamming, doc_b), among pairs
    within ``max_hamming`` bits — `(doc_a, doc_b, hamming, rank)`.

    This is the scale-safe form of :func:`simhash_near_pairs`'s output
    (VERDICT r7 #4): the unrestricted pair set is quadratic by
    construction on dense corpora (723M rows at the 10x media stress),
    while a per-item top-N is what a dedup/canonicalization pass actually
    consumes, and is LINEAR in the corpus.

    The cap is pushed INSIDE the segment join: within each pigeonhole
    bucket (seg_idx, seg_val), a row_number window per doc_a keeps only
    that doc's ``per_doc`` best candidates, so the post-join dedup and
    final ranking shuffle at most (max_hamming+1) * per_doc rows per doc
    instead of the full pair set. The pre-cap is provably LOSSLESS for
    the final top-N: a globally top-N pair of doc_a agrees with doc_a on
    at least one segment (pigeonhole), and within that bucket the pairs
    ranked above it are exactly pairs also ranked above it globally (same
    (hamming, doc_b) order), of which there are fewer than N — so it
    survives every bucket cap it appears in. The oracle can therefore
    mirror the SIMPLE definition (all-pairs filter + one window), not the
    pre-cap plumbing.

    Two strategies (``strategy='auto'|'enumerate'|'segment'``):

    - **enumerate** (auto when the Hamming-ball mask count
      sum C(num_bits, d<=h) is <= ``MASK_ENUM_MAX``): generate every
      neighbor VALUE of each fingerprint by XOR with the precomputed mask
      ball and hash-equi-join on the FULL fingerprint. Candidate volume is
      exactly ``mask_count * N`` (697N at 16 bits / h=3) — independent of
      bucket occupancy, so it cannot blow up on a saturating fingerprint
      universe the way bucket-occupancy-squared does: the round-8 stress
      measured the segment join at 5.01x for 10x data on the 16-bit
      quotient (only (h+1)*2^4 pigeonhole buckets; occupancy grows with
      the rep universe toward 2^16, where per-bucket candidates hit
      (2^12)^2/2 per bucket = ~537M total), while the mask join's ceiling
      is 697 * 2^16 = ~46M rows. Each true pair is produced exactly once
      per direction (the connecting mask is the XOR of the two values'
      LOW num_bits; the post-join filter re-checks the full 64-bit
      hamming, so inputs with set bits above num_bits get the same
      answer as the segment strategy instead of silently losing pairs),
      so no cross-bucket dedup pass exists, and the final per-doc rank
      window sees at most mask_count rows per distinct-fingerprint doc.
      This is the dual of Manku's segment join for SHORT fingerprints —
      the quotient design already commits to a small fingerprint universe
      (that is what makes its cost saturate), and inside a small universe
      direct ball enumeration is linear where bucketing stays quadratic.

    - **segment** (auto above the mask bound, e.g. 32-bit dHash at 5489
      masks): the pigeonhole segment join below, with the per-bucket
      lossless pre-cap. Per-bucket COMPUTE remains quadratic in the
      bucket's occupancy — on skewed fingerprint distributions compose
      with the exact-duplicate quotient (:func:`fingerprint_topn_pairs`)
      or a hot-bucket cap, as the groups queries do.

    Both produce identical output (pinned in tests/test_operators.py);
    the oracle mirrors the simple all-pairs + window definition either way.

    ``symmetric=True`` switches the candidate condition from
    ``doc_a < doc_b`` to ``doc_a != doc_b`` — each doc then sees its N
    nearest neighbors in BOTH directions (the shortlist semantic); the
    default keeps the pair-set orientation of :func:`simhash_near_pairs`.
    """
    import math

    from pyspark.sql.window import Window

    if num_bits < max_hamming + 1:
        raise ValueError(
            f"num_bits ({num_bits}) must be >= max_hamming + 1"
        )
    if strategy not in ("auto", "enumerate", "segment"):
        raise ValueError(f"unknown strategy {strategy!r}")
    mask_count = sum(
        math.comb(num_bits, d) for d in range(0, max_hamming + 1)
    )
    if strategy == "auto":
        strategy = "enumerate" if mask_count <= MASK_ENUM_MAX else "segment"
    if strategy == "enumerate":
        masks = _hamming_ball_masks(
            sim.sparkSession, num_bits, max_hamming
        )
        # Join on the LOW num_bits only, then filter on the TRUE full-width
        # hamming (round-9 advice): a fingerprint with set bits at or above
        # num_bits would otherwise never equi-join to its ball neighbors
        # (masks flip only low bits), silently diverging from the segment
        # strategy, whose hamming is a popcount of the full 64-bit XOR.
        # Low-bit hamming <= full hamming, so every qualifying pair shares
        # exactly one connecting low mask (the pair's low-bit XOR) — each
        # true pair still joins exactly once per direction — and in-range
        # inputs take the identical path (the low-bit AND is a no-op and
        # the recomputed popcount equals the mask's ball distance).
        low = (
            F.col("simhash")
            if num_bits >= 64
            else F.col("simhash").bitwiseAND(F.lit((1 << num_bits) - 1))
        )
        nb = (
            sim.select("doc_id", "simhash")
            .crossJoin(F.broadcast(masks.select("mask")))
            .select(
                F.col("doc_id").alias("doc_a"),
                F.col("simhash").alias("__sim_a"),
                low.bitwiseXOR(F.col("mask")).alias("__nb"),
            )
        )
        right = sim.select(
            F.col("doc_id").alias("doc_b"),
            F.col("simhash").alias("__sim_b"),
            low.alias("__nb"),
        )
        id_cond = (
            (F.col("doc_a") != F.col("doc_b"))
            if symmetric
            else (F.col("doc_a") < F.col("doc_b"))
        )
        ham = F.bit_count(F.col("__sim_a").bitwiseXOR(F.col("__sim_b")))
        w = Window.partitionBy("doc_a").orderBy("hamming", "doc_b")
        return (
            nb.join(right, "__nb")
            .filter(id_cond)
            .select("doc_a", "doc_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= per_doc)
        )
    nseg = max_hamming + 1
    base, rem = divmod(num_bits, nseg)
    seg_structs, off = [], 0
    for i in range(nseg):
        width = base + (1 if i < rem else 0)
        seg_structs.append(
            F.struct(
                F.lit(i).alias("seg_idx"),
                F.shiftright(F.col("simhash"), off)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("seg_val"),
            )
        )
        off += width
    segs = sim.select(
        "doc_id", "simhash", F.explode(F.array(*seg_structs)).alias("s")
    ).select("doc_id", "simhash", "s.seg_idx", "s.seg_val")
    a, b = segs.alias("a"), segs.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    id_cond = (
        (F.col("a.doc_id") != F.col("b.doc_id"))
        if symmetric
        else (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    cand = (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & id_cond,
        )
        .select(
            F.col("a.seg_idx").alias("seg_idx"),
            F.col("a.seg_val").alias("seg_val"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    wb = Window.partitionBy("seg_idx", "seg_val", "doc_a").orderBy(
        "hamming", "doc_b"
    )
    pre = (
        cand.withColumn("__rk", F.row_number().over(wb))
        .filter(F.col("__rk") <= per_doc)
        .select("doc_a", "doc_b", "hamming")
    )
    # ONE exchange serves both the cross-segment dedup and the final
    # ranking: hash-partitioning on doc_a satisfies the clustering
    # requirement of the (doc_a, doc_b) dedup window AND the (doc_a) rank
    # window, so Catalyst inserts two sorts but no further shuffle — vs a
    # distinct() (exchange on all three columns) followed by a rank window
    # (second exchange on doc_a). Safe against skew: the per-bucket
    # pre-cap bounds each doc_a's rows by (max_hamming+1) * per_doc.
    pre = pre.repartition("doc_a")
    w_dedup = Window.partitionBy("doc_a", "doc_b").orderBy("hamming")
    w = Window.partitionBy("doc_a").orderBy("hamming", "doc_b")
    return (
        pre.withColumn("__dup", F.row_number().over(w_dedup))
        .filter(F.col("__dup") == 1)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_doc)
        .drop("__dup")
    )


def fingerprint_topn_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    num_bits: int = 32,
    per_fp: int = 5,
    fp_col: str = "dhash",
) -> DataFrame:
    """Per-FINGERPRINT bounded near-dup shortlist over the exact-duplicate
    quotient: distinct fingerprints collapse to their min-doc
    representative (plus member count), then each representative gets its
    ``per_fp`` nearest OTHER representatives by (hamming, rep_b) within
    ``max_hamming`` bits — `(rep_a, n_members_a, rep_b, hamming, rank)`.

    This is the shortlist twin of :func:`fingerprint_dup_groups`, and the
    form that survives media-grade density: doc-level pair output is
    quadratic in per-fingerprint multiplicity (the 10x image stress
    materializes 723M doc pairs; even a capped doc-level window must first
    COMPUTE them), while the quotient bounds every stage by the DISTINCT
    fingerprint universe. Doc-level expansion, when a consumer wants it,
    is one join back through the fingerprint map — exactly how the groups
    queries propagate labels.
    """
    # r14: MATERIALIZE the quotient (lazy localCheckpoint) — the plan
    # consumes ``reps`` three times (both sides of the shortlist join and
    # the member-count reattach), so without the cut the full fingerprint
    # computation re-ran per consumer (this query opted OUT of the scan
    # spread in r13 precisely because the duplicated subtree made the
    # exchange pure cost). The frame is bounded by the DISTINCT
    # fingerprint universe (<= 2^num_bits rows) at any corpus scale —
    # always safe to pin. Values unchanged (checkpoints are
    # value-transparent).
    reps = fingerprints.groupBy(fp_col).agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_members"),
    ).localCheckpoint(eager=False)
    sim = reps.select("doc_id", F.col(fp_col).alias("simhash"))
    topn = simhash_topn_pairs(
        sim,
        max_hamming=max_hamming,
        num_bits=num_bits,
        per_doc=per_fp,
        symmetric=True,
    )
    members = reps.select(
        F.col("doc_id").alias("doc_a"), F.col("n_members").alias("n_members_a")
    )
    return topn.join(members, "doc_a").select(
        F.col("doc_a").alias("rep_a"),
        "n_members_a",
        F.col("doc_b").alias("rep_b"),
        "hamming",
        "rank",
    )


def fingerprint_dup_groups(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    num_bits: int = 32,
    id_col: str = "doc_id",
    fp_col: str = "dhash",
) -> DataFrame:
    """Duplicate GROUPS over an integer perceptual fingerprint (image
    dHash, audio difference-hash, ...): (doc_id, component_id) with
    component_id = min doc_id of the transitive near-dup closure,
    singleton components omitted — the media twin of text
    ``connected_components(jaccard_pairs(...))``, and the scale-correct
    REPLACEMENT for pair materialization (``mm_image_dhash_pairs`` is
    linear in an output that goes quadratic on dense corpora; groups are
    linear in the DOC COUNT).

    The load-bearing step is the EXACT-DUPLICATE QUOTIENT: docs are first
    collapsed onto one representative per DISTINCT fingerprint (hamming 0
    ⟹ same component, so this is a lossless graph quotient), and the
    pigeonhole segment join + star-contraction components run over
    distinct fingerprints only. On a degenerately self-similar corpus —
    exactly the case where pair output explodes — the distinct count
    grows far slower than the doc count, so every super-linear stage
    sees the collapsed input. Labels then propagate back through the
    (fingerprint -> representative) map with one broadcast-shaped join,
    and min-label is preserved because each representative IS the min
    doc_id of its fingerprint class.
    """
    # r14: MATERIALIZE (lazy localCheckpoint) both reused frames. ``fps``
    # feeds the quotient groupBy AND the label-propagation join — without
    # the cut the whole upstream fingerprint computation (for the media
    # consumers, an Arrow-batched image/audio DECODE) ran once per
    # consumer. ``reps`` feeds the near-pair self-join and the same
    # label join. fps is linear (two longs per doc); reps is bounded by
    # the distinct-fingerprint universe — both safe to pin at any scale.
    # Values unchanged (checkpoints are value-transparent).
    fps = fingerprints.select(
        F.col(id_col).alias("doc_id"), F.col(fp_col).alias("simhash")
    ).localCheckpoint(eager=False)
    reps = (
        fps.groupBy("simhash").agg(F.min("doc_id").alias("rep_id"))
        .localCheckpoint(eager=False)
    )
    rep_pairs = simhash_near_pairs(
        reps.select(F.col("rep_id").alias("doc_id"), "simhash"),
        max_hamming=max_hamming,
        num_bits=num_bits,
    )
    rep_comp = connected_components(rep_pairs).select(
        F.col("doc_id").alias("rep_id"), "component_id"
    )
    labeled = (
        fps.join(reps, "simhash")
        .join(rep_comp, "rep_id", "left")
        .select(
            "doc_id",
            F.coalesce("component_id", F.col("rep_id")).alias("component_id"),
        )
    )
    # mirror connected_components' contract: isolated docs (unique
    # fingerprint, no near edge) are absent
    sized = (
        labeled.groupBy("component_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("component_id")
    )
    return labeled.join(sized, "component_id").select("doc_id", "component_id")
