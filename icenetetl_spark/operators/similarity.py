"""Similarity search over an embedding column (``array<float>``).

- ``cosine``            : JVM-side expression (zip_with product + sequential
                          fold + sqrt) — stays inside whole-stage codegen, no
                          Python boundary, and is bit-identical to the DuckDB
                          oracle's list_dot_product on doubles.
- ``knn_bruteforce``    : exact top-k per query via query×corpus join +
                          per-query window. The baseline.
- ``knn_sign_lsh``      : LSH-bucketed approximate variant — random-hyperplane
                          family degenerated to axis sign bits (deterministic,
                          engine-portable); candidates restricted to the
                          query's bucket.

Scale notes (100 TB / 10^9+ vectors):
- Brute force is O(|Q|x|C|): fine for small query sets (the per-query window
  is partitioned by query id, so it distributes); for large Q use the LSH /
  IVF path: bucket both sides, shuffle once on bucket id, search within
  buckets (+ multi-probe for recall).
- The fold-based dot product is O(d) per pair with no Arrow hop. For very
  wide vectors a pandas_udf over numpy matmul batches wins — that variant is
  ``icenetetl_spark.operators.multimodal.embed_batch_scores`` (Arrow-batched),
  kept off this path so the oracle stays exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from icenetetl_spark.operators.scale import spread


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _dot(x: Column | str, y: Column | str) -> Column:
    x, y = _as_col(x), _as_col(y)
    return F.aggregate(
        F.zip_with(x, y, lambda u, v: u.cast("double") * v.cast("double")),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def cosine(x: Column | str, y: Column | str, dim: int | None = None) -> Column:
    """Cosine similarity. With ``dim`` (statically-known array width) the
    expression is the codegen-unrolled form — identical values, ~30x per
    row; without it, the any-length interpreted fold. ONE dispatch point:
    callers pass dim through rather than choosing a variant themselves.
    Pass the operands as column-reference STRINGS where possible (see
    :func:`dot_unrolled`) — same tree, built in one JVM parse."""
    if dim:
        return cosine_unrolled(x, y, dim)
    return _dot(x, y) / (F.sqrt(_dot(x, x)) * F.sqrt(_dot(y, y)))


def dot_unrolled(x: Column | str, y: Column | str, dim: int) -> Column:
    """BIT-IDENTICAL to :func:`_dot` for length-``dim`` arrays — the same
    left-to-right double accumulation ``((0+x1y1)+x2y2)+...`` — but as a
    flat arithmetic expression instead of an interpreted higher-order
    fold. ``aggregate``/``zip_with`` are CodegenFallback in Spark (every
    row pays interpreted lambda dispatch, measured ~90us/row at d=64);
    the unrolled form stays inside whole-stage codegen, which is what
    makes exhaustive pairwise stages (SemDeDup within-cell pairs) viable.
    Use when the dimension is statically known; fall back to the fold
    (any length, same values) when it is not.

    DRIVER-SIDE COST (r13, guide §7.3): building the 64-term tree with
    per-term Column operators costs ~2,500 py4j round-trips PER CALL —
    profiled at 6.7s of dedup_semantic_two_level's 9.9s wall (38k socket
    round-trips for its ten dots; pure serial driver time that a cluster
    cannot parallelize away). When both operands are column-reference
    STRINGS (anything ``F.expr`` resolves like ``F.col`` does: ``"v"``,
    ``"a.vec"``), the IDENTICAL expression text is assembled in Python
    and parsed JVM-side in ONE call. The parsed tree matches the
    operator-built tree node-for-node — ``0.0D`` is ``lit(0.0)``,
    ``CAST(element_at(c, i) AS DOUBLE)`` is ``element_at(c, i)
    .cast("double")``, and SQL ``+``/``*`` associate exactly like the
    Python loop — so analysis, codegen, and values are unchanged
    (equality + analyzed-plan identity pinned in
    tests/test_similarity.py). Column operands keep the per-term builder."""
    if isinstance(x, str) and isinstance(y, str):
        return F.expr(_dot_sql(x, y, dim))
    out = F.lit(0.0)
    for i in range(1, dim + 1):
        out = out + (
            F.element_at(x, i).cast("double")
            * F.element_at(y, i).cast("double")
        )
    return out


def _qident(name: str) -> str:
    """Backtick-quote each dot-separated part of a column reference so the
    SQL-text path accepts any name ``F.col`` accepts (spaces, hyphens,
    reserved words — ADVICE r13 #2). Dots keep their ``F.col`` meaning
    (qualifier / struct-field separators); embedded backticks escape by
    doubling, the standard Spark identifier rule."""
    return ".".join(
        "`" + part.replace("`", "``") + "`" for part in name.split(".")
    )


def _dot_sql(x: str, y: str, dim: int) -> str:
    """The :func:`dot_unrolled` expression as SQL text (see its note)."""
    xq, yq = _qident(x), _qident(y)
    terms = " + ".join(
        f"CAST(element_at({xq}, {i}) AS DOUBLE) * "
        f"CAST(element_at({yq}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    return f"0.0D + {terms}"


def cosine_unrolled(x: Column | str, y: Column | str, dim: int) -> Column:
    """Codegen twin of :func:`cosine` — identical values (same fp order),
    statically-known dimension. String operands assemble the whole
    dot/(sqrt*sqrt) expression in ONE JVM parse (same tree — SQL ``/``,
    ``*`` and ``SQRT`` are the operators the Column builder emits)."""
    if isinstance(x, str) and isinstance(y, str):
        return F.expr(
            f"({_dot_sql(x, y, dim)}) / "
            f"(SQRT({_dot_sql(x, x, dim)}) * SQRT({_dot_sql(y, y, dim)}))"
        )
    return dot_unrolled(x, y, dim) / (
        F.sqrt(dot_unrolled(x, x, dim)) * F.sqrt(dot_unrolled(y, y, dim))
    )


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cos).

    Deterministic: ties broken by neighbor id. Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # r13 (guide §2.5): the per-pair cosine below runs map-side on the
    # corpus partitioning; spread() keeps a row-group-bound scan from
    # serializing it (no-op once parallel — operators/scale.py).
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    # Explicit broadcast of the query side: it is bounded BY CONSTRUCTION
    # (a query set, not a corpus), but it is usually a filtered subset of
    # a big table, so the static planner's size estimate balloons with the
    # data and the non-equi join degrades to CartesianProduct — observed
    # at the 100x spot check (SCALING.md) before this hint was pinned.
    scored = (
        F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine("qv", "cv", dim=dim).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def normalize_embeddings(
    df: DataFrame,
    id_alias: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    out_col: str = "nv",
    materialize: bool = True,
) -> DataFrame:
    """Project ``v / ||v||`` once per row — the stored-normalized-column
    plan for cosine search: after this, every pair computes ONE dot
    instead of three (dot + two norms), cutting pair-stage work ~3x at
    any scale where pairs >> rows.

    ``materialize=True`` (a lazy localCheckpoint) is LOAD-BEARING, not an
    optimization nicety: without it Catalyst collapses this projection
    into the per-pair scoring projection downstream, recomputing the
    whole normalization per PAIR — measured 3x slower than not
    normalizing at all (SCALING.md "Cosine dispatch"). On a real
    deployment the normalized column is written to the table once
    (amortized across queries); the checkpoint is the per-query stand-in
    with the same physical property (a concrete primitive array).

    fp-order contract: norm = sqrt of the left-to-right sequential dot
    (dot_unrolled ≡ the fold, bit-identical), each element divided by it
    in double — mirrored in DuckDB as
    ``list_transform(dv, x -> x / sqrt(list_dot_product(dv, dv)))``.
    """
    v = F.col(vec_col)
    staged = df.withColumn(
        "__nrm", F.sqrt(dot_unrolled(vec_col, vec_col, dim))
    )
    nv = F.array(
        *[
            F.element_at(v, i).cast("double") / F.col("__nrm")
            for i in range(1, dim + 1)
        ]
    )
    out = staged.select(F.col(id_col).alias(id_alias), nv.alias(out_col))
    return out.localCheckpoint(eager=False) if materialize else out


def knn_bruteforce_prenorm(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Exact cosine top-k with pre-normalized sides: same result contract
    as :func:`knn_bruteforce` (query_id, neighbor_id, rank, cos) but cos
    is computed as a single dot over ``v/||v||`` columns — 2.4x faster at
    1M pairs (A/B in SCALING.md), the right plan whenever the query set
    is large enough that pair work dominates the O(N·d) normalization.
    Note the cos values differ from knn_bruteforce in the last ulp
    (different fp grouping); the oracle mirrors this form exactly."""
    q = normalize_embeddings(queries, "query_id", id_col, vec_col, dim, "qv")
    # spread before normalize: the O(N·d) normalization materializes via
    # the localCheckpoint on the input partitioning (r13, guide §2.5)
    c = normalize_embeddings(
        spread(corpus, id_col), "neighbor_id", id_col, vec_col, dim, "cv"
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def sign_bucket(vec: Column, num_bits: int = 8) -> Column:
    """Deterministic LSH bucket id: sign bits of the first ``num_bits``
    coordinates ('0'/'1' string). A fixed axis-aligned instance of the
    random-hyperplane (SRP) family — portable to the SQL oracle; on a real
    deployment draw the hyperplanes from a seeded RNG and keep the same plan.
    """
    bits = [
        F.when(vec.getItem(i) > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(num_bits)
    ]
    return F.concat(*bits)


def knn_sign_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sign-LSH bucket,
    then exact cosine rank within bucket. One equi-join shuffle on bucket id
    instead of a full cross join — the 100 TB-shaped plan.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_bucket(F.col(vec_col), num_bits).alias("bucket"),
    )
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(F.col(vec_col), num_bits).alias("bucket"),
    )
    # broadcast the bounded query side so the corpus is never shuffled
    # for the bucket equi-join (size-independent plan — see knn_bruteforce)
    scored = (
        F.broadcast(q).join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine("qv", "cv", dim=dim).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def hyperplane_buckets(
    df: DataFrame,
    normals: DataFrame,
    id_alias: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, bucket) with bucket = the sign-bit string of the vector's
    dot products against the ``normals`` table (columns ``bit_idx``,
    ``nvec``) — TRUE random-hyperplane LSH (Charikar, STOC 2002), where
    ``sign_bucket`` is its axis-aligned degenerate. One broadcast join
    producing B rows per vector that collapse in the same task via
    partial collect (B is tiny; the exchange carries one string per
    vector)."""
    scored = df.crossJoin(F.broadcast(normals)).select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias("__v"),
        F.struct(
            F.col("bit_idx"),
            F.when(_dot(F.col(vec_col), F.col("nvec")) > 0, F.lit("1"))
            .otherwise(F.lit("0"))
            .alias("bit"),
        ).alias("ib"),
    )
    return scored.groupBy(id_alias).agg(
        F.first("__v").alias("__v"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("ib")), lambda s: s["bit"]
            ),
            "",
        ).alias("bucket"),
    )


def knn_hyperplane_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    normals: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k with PROJECTION-based LSH buckets: candidates
    share the sign pattern across all hyperplanes in ``normals``, then
    exact cosine rank within the bucket. Same shuffle shape as
    knn_sign_lsh (one bucket equi-join); the hyperplanes here come from
    a table — fixed corpus rows for the oracle-gated query, seeded
    gaussian draws in production (identical plan either way)."""
    q = hyperplane_buckets(queries, normals, "query_id", id_col, vec_col)
    c = hyperplane_buckets(
        spread(corpus, id_col), normals, "neighbor_id", id_col, vec_col
    )
    scored = (
        F.broadcast(q.select("query_id", F.col("__v").alias("qv"), "bucket"))
        .join(
            c.select("neighbor_id", F.col("__v").alias("cv"), "bucket"),
            "bucket",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine("qv", "cv", dim=dim).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _bucket_with_flips(bucket: Column, num_bits: int) -> Column:
    """The bucket itself plus every 1-bit-flipped variant (num_bits + 1
    strings) — the classic multi-probe sequence for sign LSH (probe the
    buckets most likely to hold near neighbors: those differing in the one
    hyperplane the query sits closest to; flipping every bit is the
    exhaustive hamming-1 shell, deterministic and oracle-portable)."""
    variants = [bucket]
    for i in range(num_bits):
        ch = F.substring(bucket, i + 1, 1)
        flipped = F.when(ch == "1", F.lit("0")).otherwise(F.lit("1"))
        variants.append(
            F.concat(
                F.substring(bucket, 1, i),
                flipped,
                F.substring(bucket, i + 2, num_bits - i - 1),
            )
        )
    return F.array(*variants)


def knn_sign_lsh_multiprobe(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Multi-probe variant of :func:`knn_sign_lsh`: each query searches its
    own bucket AND all hamming-1 neighbor buckets (num_bits + 1 probes),
    recovering most of the recall a single bucket loses while still doing
    ONE equi-join shuffle on bucket id — candidate volume grows by at most
    (num_bits + 1)x on the query side only, never all-pairs. Corpus vectors
    keep exactly one bucket, so a (query, neighbor) pair meets at most once
    (the probe list is distinct by construction) — no dedup stage needed.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            _bucket_with_flips(sign_bucket(F.col(vec_col), num_bits), num_bits)
        ).alias("bucket"),
    )
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(F.col(vec_col), num_bits).alias("bucket"),
    )
    # broadcast the bounded query side so the corpus is never shuffled
    # for the bucket equi-join (size-independent plan — see knn_bruteforce)
    scored = (
        F.broadcast(q).join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine("qv", "cv", dim=dim).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def vector_mean(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
    scale: int = 9,
) -> DataFrame:
    """Element-wise mean vector per group (cluster/class centroids — the
    aggregation behind IVF training, class prototypes, and drift monitors).

    Plan: posexplode to (group, pos, x) -> one hash aggregation on
    (group, pos) with a FIXED-POINT INTEGER accumulator -> per-group
    reassembly of the d positions via sort_array(collect_list) (d values
    per group — driver-safe). Two shuffles, both keyed and distributed;
    no vector ever passes through Python.

    The fixed-point accumulator (see :func:`vector_mean_long`) makes the
    cross-row sum order-independent AND engine-exact — including for
    coarse dyadic float32 inputs that sit exactly on decimal
    half-boundaries, where decimal casts' rounding modes diverge between
    engines.
    """
    per = vector_mean_long(df, group_cols, vec_col=vec_col, scale=scale)
    return per.groupBy(*group_cols).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "mean"))),
            lambda s: s["mean"],
        ).alias("centroid"),
        F.min("n_vectors").alias("n_vectors"),
    )


def vector_mean_long(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
    scale: int = 9,
) -> DataFrame:
    """The per-position stage of :func:`vector_mean` in long form:
    one row per (group, pos) with the element-wise mean and the group
    count. This IS the centroid — callers that need the array shape
    reassemble it (``vector_mean``); callers that hash/compare results
    keep the long form (scalar columns canonicalize, arrays don't).

    Accumulation is FIXED-POINT INTEGER, not decimal: each element is
    quantized with ``floor(x * 10^scale + 0.5)`` — plain IEEE double ops
    every engine performs identically — then summed as exact BIGINTs.
    A double->DECIMAL cast is NOT portable here: float32 inputs are
    coarse dyadic rationals (e.g. 0.1494140625 = 153/1024), and
    odd/2^(s2+1) values land EXACTLY on 10^-scale half-boundaries
    (10^9 carries only 2^9), where Spark's HALF_UP and DuckDB's
    HALF_EVEN disagree — observed as a real 1-ulp centroid divergence
    at sf0.1. Valid for |x| < 2^53 / 10^scale."""
    from icenetetl_spark.functions.portable import fsum_col

    ex = df.select(
        *group_cols, F.posexplode(F.col(vec_col)).alias("pos", "__x")
    )
    return ex.groupBy(*group_cols, "pos").agg(
        (fsum_col("__x", scale) / F.count(F.lit(1))).alias("mean"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_bits: int = 48,
    bands: int = 12,
    exact: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Pairs with cosine >= threshold (id_a < id_b).

    ``exact=True`` (the DEFAULT): the all-pairs O(n²) form — exact answer,
    the small-data oracle twin and the recall baseline. Callers opt INTO the
    approximate scale plan with ``exact=False``; approximation is an explicit
    decision at the call site, never a silent default (a caller relying on
    exact semantics must not lose pairs because a default changed under it).
    Never the plan to run at 100 TB.

    ``exact=False``: BANDED sign-LSH — the sign bits of the first
    ``num_bits`` coordinates split into ``bands`` bands; candidates are
    pairs agreeing on ALL bits of ANY band (OR-amplification, the same
    banding construction as MinHash LSH), refined with the exact cosine.
    The plan is one explode + one hash-partitioned equi-join on
    (band_idx, band_sig) — linear shuffle, distributed, survives 100×.
    A single monolithic bucket would have per-pair collision p^num_bits
    (p = 1 - angle/pi per hyperplane) — near-zero recall at dedup
    thresholds; banding gives 1-(1-p^w)^bands. Approximate by design:
    cross-band misses are possible, and recall vs the exact answer is
    asserted in tests/test_similarity.py. The DuckDB oracle mirrors the
    identical bands, so the correctness gate is still an exact hash match.
    Production swap: seeded random hyperplanes instead of axis signs, wider
    bands — same plan shape.
    """
    # Norms are hoisted out of every pair stage below (the ivf.py /
    # semdedup.py round-9 lesson): cosine unrolled at d=64 inside a join's
    # consume method is three 64-term dots, which overflows the JVM's
    # 64 KB method limit — Spark logged "Code grows beyond 64 KB" on this
    # very query's banded join and ran the stage interpreted. With ||v||
    # precomputed once per row (map-side, linear), the pair stage is one
    # dot plus a divide and compiles. Bit-identical: same operands, same
    # accumulation order, sqrt factored out of the division.
    def _nrm(col: Column | str) -> Column:
        from icenetetl_spark.operators.similarity import _dot, dot_unrolled

        d = dot_unrolled(col, col, dim) if dim else _dot(col, col)
        return F.sqrt(d)

    def _pair_cos(va, vb, na, nb) -> Column:
        from icenetetl_spark.operators.similarity import _dot, dot_unrolled

        d = dot_unrolled(va, vb, dim) if dim else _dot(va, vb)
        return d / (na * nb)

    # r13 (guide §2.5): both the norm projections and the pair stage run
    # on this frame's partitioning; spread() keeps a row-group-bound scan
    # from serializing them (no-op once parallel — operators/scale.py).
    emb = spread(emb, id_col)
    if exact:
        a = emb.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
            _nrm(vec_col).alias("na"),
        )
        b = emb.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"),
            _nrm(vec_col).alias("nb"),
        )
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                _pair_cos(
                    "va", "vb", F.col("na"), F.col("nb")
                ).alias("cos"),
            )
            .filter(F.col("cos") >= threshold)
        )
    if num_bits % bands:
        raise ValueError(f"num_bits ({num_bits}) must be divisible by bands ({bands})")
    w = num_bits // bands
    # Each band signature is built from ITS OWN w-bit slice, not substring'd
    # out of one full num_bits signature: embedding the full concat-of-whens
    # in every struct compiles bands*num_bits CASE branches into the explode
    # stage (576 at 48/12), which blows janino's 64 KB method limit and drops
    # the whole stage out of codegen. Slicing keeps it at num_bits total.
    def _band_sig(i: int) -> Column:
        bits = [
            F.when(F.col(vec_col).getItem(i * w + j) > 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for j in range(w)
        ]
        return F.concat(*bits)

    band_structs = [
        F.struct(
            F.lit(i).alias("band_idx"),
            _band_sig(i).alias("band_sig"),
        )
        for i in range(bands)
    ]
    # Identical subplans on both sides of the self-join -> ReuseExchange
    # shares the exploded shuffle (same trick as lsh_candidate_pairs).
    banded = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        _nrm(vec_col).alias("nrm"),
        F.explode(F.array(*band_structs)).alias("b"),
    ).select("vid", "vec", "nrm", "b.band_idx", "b.band_sig")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            _pair_cos(
                "a.vec", "b.vec", F.col("a.nrm"), F.col("b.nrm")
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .distinct()
    )


def mmr_select(
    candidates: DataFrame,
    query_vec: list[float],
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein,
    SIGIR 1998, public): iteratively pick the candidate maximizing
    ``lam * relevance - (1 - lam) * max_sim_to_selected`` — the
    diversity-aware top-k a curation pipeline uses where plain top-k
    returns k near-duplicates. First pick is pure relevance (the
    standard convention).

    Driver state is O(k*d) (the selected vectors, like a trained
    quantizer's centroids); each of the k steps is ONE distributed job —
    a scan scoring every remaining candidate against the broadcast
    selected set, then a 1-row argmax collect with a deterministic
    (score desc, id) tie-break. All similarity arithmetic is the same
    sequential-fold cosine the brute-force path uses, so the result is
    engine-portable and the oracle can unroll the identical k steps.

    Returns (rank, id, relevance, mmr_score) for the k selections.

    r13 construction note (guide §7.3): the reference vectors are
    PROJECTED as literal-array columns (``__q``, ``__s<j>``) and the
    cosines take column NAMES, riding the one-parse string path of
    :func:`dot_unrolled`. Inlining the 64-literal array into every
    element_at term of a Column-built unrolled cosine re-embedded the
    array 64 times per dot (4,096 literal nodes) and cost 122k py4j
    round-trips / 27.6s of doc_mmr_diverse's 32.9s construction;
    projecting it keeps the same per-row evaluation (one CreateArray,
    same fold order — values identical) at ~130 calls per vector."""
    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    # r13 (guide §2.5): every step's scoring scan runs on this frame's
    # partitioning; spread() keeps a row-group-bound scan from
    # serializing all k steps (no-op once parallel — operators/scale.py).
    candidates = spread(candidates, id_col)
    scored = candidates.withColumn("__q", qlit).select(
        F.col(id_col),
        F.col(vec_col),
        cosine(vec_col, "__q", dim=dim).alias("rel"),
    )
    selected: list[tuple] = []  # (rank, id, rel, score, vector)
    for step in range(k):
        remaining = scored
        if selected:
            remaining = remaining.filter(
                ~F.col(id_col).isin([s[1] for s in selected])
            )
            for j, s in enumerate(selected):
                remaining = remaining.withColumn(
                    f"__s{j}", F.array(*[F.lit(float(v)) for v in s[4]])
                )
            sims = [
                cosine(vec_col, f"__s{j}", dim=dim)
                for j in range(len(selected))
            ]
            maxsim = sims[0] if len(sims) == 1 else F.greatest(*sims)
            score = F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * maxsim
        else:
            score = F.col("rel")
        rows = (
            remaining.select(id_col, vec_col, "rel", score.alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(1)
            .collect()
        )
        if not rows:  # pool exhausted before k picks: return what we have
            break
        top = rows[0]
        selected.append(
            (step + 1, top[id_col], top["rel"], top["score"], list(top[vec_col]))
        )
    spark = candidates.sparkSession
    return spark.createDataFrame(
        [(r, i, rel, sc) for r, i, rel, sc, _ in selected],
        f"rank int, {id_col} long, relevance double, mmr_score double",
    )
