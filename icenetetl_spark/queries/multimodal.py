"""Multimodal-column queries over ``documents`` (UTF-8 payload bytes stand in
for media blobs — the container has no image/audio libs; see
operators.multimodal for the stubbed decode and the real Arrow plumbing).

The early plumbing stand-ins (``mm_decode_stub``, ``mm_frame_sample``) were
retired from the registry once the REAL codecs landed (``mm_decode``,
``mm_video_frames`` gate the same plumbing plus true decode); their
fake-decoder assertions live on as plain pytest tests
(tests/test_operators.py::test_multimodal_plumbing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from icenetetl_spark.operators import dedup as D
from icenetetl_spark.operators import multimodal as M
from icenetetl_spark.sources.testdata import load_table


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.binary_metadata(docs)


def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode: deterministic PNG/BMP bytes written per doc by the
    stdlib codec, then parsed back pixel-by-pixel (filter reconstruction,
    row padding, CRCs). The oracle reproduces width/height/pixel_sum from
    the id arithmetic alone — so a writer/reader bug that survives the
    round trip still fails the hash gate unless it preserves the exact
    raster definition."""
    docs = load_table(spark, sf_dir, "documents")
    return M.decode_images(M.attach_image_payload(docs))


def mm_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: deterministic PCM WAV bytes written per doc by
    the stdlib RIFF codec (sources/audio.py), then chunk-walked back to
    stream metadata + the exact interleaved sample sum. The oracle
    reproduces rate/channels/frames/duration/sum from the id arithmetic
    alone — same gate construction as mm_decode."""
    docs = load_table(spark, sf_dir, "documents")
    return M.decode_audio(M.attach_audio_payload(docs))


def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling: deterministic Y4M container bytes per
    doc (sources/video.py writer), chunk-parsed back, every-3rd frame kept
    with its exact luma sum. Replaces the arithmetic stand-in
    (mm_frame_sample) with a true decode→sample→feature pass; unsampled
    frames never leave the Python worker."""
    docs = load_table(spark, sf_dir, "documents")
    return M.decode_video_frames(M.attach_video_payload(docs), every_nth=3)


def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resize to 5x3 over the decoded PNG/BMP
    payloads (operators/multimodal.resize_images) — the
    resolution-normalization pass; the oracle reproduces the resized sums
    from the id arithmetic + the same integer NN index mapping."""
    docs = load_table(spark, sf_dir, "documents")
    return M.resize_images(M.attach_image_payload(docs), out_w=5, out_h=3)


def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio features (ZCR + peak) over the decoded WAV fixtures —
    the oracle reproduces channel-0 sample values by arithmetic and counts
    the same strict sign-product crossings."""
    docs = load_table(spark, sf_dir, "documents")
    return M.audio_features(M.attach_audio_payload(docs))


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_audio_features": mm_audio_features,
    "mm_image_resize": mm_image_resize,
    "mm_video_frames": mm_video_frames,
    "mm_audio_decode": mm_audio_decode,
    "mm_decode": mm_decode,
}

_NB = "octet_length(encode(text))"

ORACLES = {
    "mm_binary_meta": f"""
        SELECT doc_id,
               CAST({_NB} AS BIGINT) AS n_bytes,
               lower(hex(encode(substring(text, 1, 8)))) AS header_hex,
               {_NB} > 0 AS is_nonempty
        FROM documents
    """,
    "mm_audio_decode": """
        WITH base AS (
            SELECT doc_id,
                   64 + doc_id % 64 AS n,
                   1 + doc_id % 2 AS ch,
                   8000 + (doc_id % 4) * 4000 AS rate
            FROM documents),
        s AS (
            SELECT doc_id, n, ch, rate,
                   unnest(generate_series(0, CAST(n * ch - 1 AS BIGINT))) AS i
            FROM base)
        SELECT doc_id,
               CAST(rate AS INTEGER) AS sample_rate,
               CAST(ch AS INTEGER) AS n_channels,
               CAST(n AS BIGINT) AS n_samples,
               CAST(n AS DOUBLE) / CAST(rate AS DOUBLE) AS duration_s,
               CAST(SUM((doc_id * 31 + i * 7) % 65536 - 32768) AS BIGINT)
                   AS sample_sum
        FROM s
        GROUP BY doc_id, n, ch, rate
    """,
    "mm_video_frames": """
        WITH dims AS (
            SELECT doc_id,
                   1 + doc_id % 12 AS n_frames,
                   4 + (doc_id % 3) * 2 AS w,
                   2 + ((doc_id // 3) % 3) * 2 AS h
            FROM documents),
        fr AS (
            SELECT doc_id, n_frames, w, h,
                   unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 3))
                       AS frame_idx
            FROM dims),
        px AS (
            SELECT doc_id, n_frames, w, h, frame_idx,
                   unnest(generate_series(0, CAST(w * h - 1 AS BIGINT))) AS i
            FROM fr)
        SELECT doc_id,
               CAST(n_frames AS INTEGER) AS n_frames,
               CAST(frame_idx AS INTEGER) AS frame_idx,
               CAST(w AS INTEGER) AS width,
               CAST(h AS INTEGER) AS height,
               CAST(SUM((doc_id + frame_idx * 7 + i) % 256) AS BIGINT)
                   AS luma_sum
        FROM px
        GROUP BY doc_id, n_frames, frame_idx, w, h
    """,
    "mm_image_resize": """
        WITH dims AS (
            SELECT doc_id,
                   1 + doc_id % 16 AS w,
                   1 + (doc_id // 16) % 16 AS h
            FROM documents),
        px AS (
            SELECT doc_id, w, h, r2, c2
            FROM dims,
                 LATERAL (SELECT unnest(generate_series(0, 2)) AS r2) rr,
                 LATERAL (SELECT unnest(generate_series(0, 4)) AS c2) cc)
        SELECT doc_id,
               CAST(w AS INTEGER) AS src_width,
               CAST(h AS INTEGER) AS src_height,
               CAST(5 AS INTEGER) AS width,
               CAST(3 AS INTEGER) AS height,
               CAST(SUM((doc_id + ((r2 * h) // 3) * w + (c2 * w) // 5) % 256)
                    AS BIGINT) AS pixel_sum
        FROM px
        GROUP BY doc_id, w, h
    """,
    "mm_audio_features": """
        WITH base AS (
            SELECT doc_id,
                   64 + doc_id % 64 AS n,
                   1 + doc_id % 2 AS ch
            FROM documents),
        s AS (
            SELECT doc_id, n, i,
                   (doc_id * 31 + i * ch * 7) % 65536 - 32768 AS v,
                   CASE WHEN i >= 1
                        THEN (doc_id * 31 + (i - 1) * ch * 7) % 65536 - 32768
                   END AS vprev
            FROM base,
                 LATERAL (SELECT unnest(generate_series(0,
                     CAST(n - 1 AS BIGINT))) AS i) t)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_samples,
               CAST(count(*) FILTER (vprev * v < 0) AS BIGINT)
                   AS zero_crossings,
               CAST(max(abs(v)) AS INTEGER) AS peak
        FROM s
        GROUP BY doc_id
    """,
    "mm_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
                   CAST(1 + doc_id % 16 AS INTEGER) AS width,
                   CAST(1 + (doc_id // 16) % 16 AS INTEGER) AS height
            FROM documents),
        px AS (
            SELECT doc_id, format, width, height,
                   unnest(generate_series(0, CAST(width * height - 1 AS BIGINT)))
                       AS i
            FROM dims)
        SELECT doc_id, format, width, height,
               CAST(width * height AS BIGINT) AS n_pixels,
               CAST(SUM((doc_id + i) % 256) AS BIGINT) AS pixel_sum
        FROM px
        GROUP BY doc_id, format, width, height
    """,
}


DHASH_HAMMING_T = 3


def mm_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dHash fingerprints over the real PNG/BMP decode — the
    oracle reproduces every bit from the id-derived raster arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    return M.image_dhash(M.attach_image_payload(docs))


def mm_image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs: dHash hamming <= DHASH_HAMMING_T via
    the SAME Manku pigeonhole segment join as text SimHash
    (operators/dedup.simhash_near_pairs, num_bits=32) — visual dedup with
    the identical scale story."""
    from pyspark.sql import functions as F

    from icenetetl_spark.operators.dedup import simhash_near_pairs

    fp = mm_image_dhash(spark, sf_dir).select(
        "doc_id", F.col("dhash").alias("simhash")
    )
    return simhash_near_pairs(
        fp, max_hamming=DHASH_HAMMING_T, num_bits=32
    )


def mm_image_dhash_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded near-dup shortlist over the exact-duplicate QUOTIENT: each
    distinct dHash's representative gets its PAIR_TOPN nearest other
    representatives (hamming <= DHASH_HAMMING_T, both directions), with
    the representative's member count carried. The linear-output,
    linear-compute replacement for the quadratic pair diagnostic on
    media-grade density — a doc-level cap is not enough here because the
    723M doc pairs of the 10x stress would still be COMPUTED before any
    window cut them; the quotient bounds every stage by the distinct-
    fingerprint universe (operators/dedup.fingerprint_topn_pairs)."""
    from icenetetl_spark.operators.dedup import fingerprint_topn_pairs
    from icenetetl_spark.queries.dedup import PAIR_TOPN

    fp = mm_image_dhash(spark, sf_dir)
    return fingerprint_topn_pairs(
        fp,
        max_hamming=DHASH_HAMMING_T,
        num_bits=32,
        per_fp=PAIR_TOPN,
        fp_col="dhash",
    )


def mm_image_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup GROUPS — the gated scale default for media dedup
    (mm_image_dhash_pairs stays registered as the pair diagnostic, but
    its output is quadratic by construction on dense corpora: 723M pairs
    at the 10x stress vs one label per doc here). Exact-duplicate
    quotient first (operators/dedup.fingerprint_dup_groups): distinct
    dHashes collapse to their min-doc representative before the
    pigeonhole join + star-contraction components, so every
    super-linear stage runs over distinct fingerprints, not docs —
    the J4 insert-dedup idea (reference
    azfunctions/InputBlobTrigger/processor.py:249-256) applied to media.
    The oracle mirrors the same quotient + a recursive-CTE closure."""
    fp = mm_image_dhash(spark, sf_dir)
    return D.fingerprint_dup_groups(
        fp, max_hamming=DHASH_HAMMING_T, num_bits=32, fp_col="dhash"
    )


def mm_image_dup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop decision for image groups: within each near-dup
    component keep the HIGHEST-RESOLUTION member (n_pixels from the real
    PNG/BMP decode; tiebreak lowest doc_id) — the media twin of
    dedup_canonical's quality pick."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    groups = mm_image_dup_groups(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # decode ONLY the group members for their dimensions (the corpus was
    # already decoded once for fingerprints inside dup_groups; a second
    # full-corpus decode would double the dominant Python-side cost)
    members = docs.join(groups.select("doc_id"), "doc_id")
    meta = M.decode_images(M.attach_image_payload(members)).select(
        "doc_id", (F.col("width") * F.col("height")).alias("n_pixels")
    )
    scored = groups.join(meta, "doc_id")
    w = Window.partitionBy("component_id").orderBy(
        F.col("n_pixels").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .groupBy("component_id")
        .agg(
            F.min(F.when(F.col("rk") == 1, F.col("doc_id"))).alias(
                "canonical_id"
            ),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


QUERIES["mm_image_dhash"] = mm_image_dhash
QUERIES["mm_image_dhash_pairs"] = mm_image_dhash_pairs
QUERIES["mm_image_dhash_topn"] = mm_image_dhash_topn
QUERIES["mm_image_dup_groups"] = mm_image_dup_groups
QUERIES["mm_image_dup_canonical"] = mm_image_dup_canonical

# dHash oracle: bit b (= r*4 + c) compares the NN-resized 5x8 raster's
# (r, c) and (r, c+1) pixels; source pixel index = row-major over the
# id-derived ramp (pixel i = (id + i) % 256, w = 1+id%16, h = 1+(id//16)%16)
_DHASH_CTE = """
    dims AS (
        SELECT doc_id,
               1 + doc_id % 16 AS w,
               1 + (doc_id // 16) % 16 AS h
        FROM documents),
    bits AS (
        SELECT doc_id,
               b,
               CASE WHEN
                   (doc_id + ((b // 4) * h // 8) * w + ((b % 4) * w) // 5)
                       % 256
                   <
                   (doc_id + ((b // 4) * h // 8) * w + (((b % 4) + 1) * w)
                       // 5) % 256
               THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
        FROM dims,
             LATERAL (SELECT unnest(generate_series(0, 31)) AS b) t),
    fp AS (
        SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << b)) AS BIGINT)
                   AS dhash
        FROM bits GROUP BY doc_id)
"""

ORACLES["mm_image_dhash"] = f"""
    WITH {_DHASH_CTE}
    SELECT doc_id, dhash FROM fp
"""

ORACLES["mm_image_dhash_pairs"] = f"""
    WITH {_DHASH_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= {DHASH_HAMMING_T}
"""


def _dhash_topn_oracle() -> str:
    from icenetetl_spark.queries.dedup import PAIR_TOPN

    return f"""
    WITH {_DHASH_CTE},
    reps AS (
        SELECT dhash, min(doc_id) AS rep_id,
               CAST(count(*) AS BIGINT) AS n_members
        FROM fp GROUP BY dhash
    ),
    pairs AS (
        SELECT a.rep_id AS rep_a, a.n_members AS n_members_a,
               b.rep_id AS rep_b,
               CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
        FROM reps a JOIN reps b ON a.rep_id <> b.rep_id
        WHERE bit_count(xor(a.dhash, b.dhash)) <= {DHASH_HAMMING_T}
    )
    SELECT rep_a, n_members_a, rep_b, hamming,
           CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY rep_a
                  ORDER BY hamming, rep_b) AS rank
        FROM pairs
    ) WHERE rank <= {PAIR_TOPN}
    """


ORACLES["mm_image_dhash_topn"] = _dhash_topn_oracle()

# Same quotient construction as the Spark plan: distinct fingerprints
# collapse to their min-doc representative, the near join + recursive
# closure (shared helper: queries/dedup.closure_ctes) run over
# representatives, labels propagate back via the fingerprint map,
# singleton components drop. Parameterized over the fingerprint CTE/
# column so image (dhash) and audio (afp) share it verbatim.
def _quotient_group_ctes(fp_cte: str, fp_col: str, threshold: int) -> str:
    from icenetetl_spark.queries.dedup import closure_ctes

    return f"""
    reps AS (SELECT {fp_col}, min(doc_id) AS rep_id
             FROM {fp_cte} GROUP BY {fp_col}),
    qpairs AS (
        SELECT a.rep_id AS doc_a, b.rep_id AS doc_b
        FROM reps a JOIN reps b ON a.rep_id < b.rep_id
        WHERE bit_count(xor(a.{fp_col}, b.{fp_col})) <= {threshold}
    ),
    {closure_ctes("qpairs", "comp", "rep_id")},
    labeled AS (
        SELECT f.doc_id, COALESCE(c.component_id, r.rep_id) AS component_id
        FROM {fp_cte} f JOIN reps r USING ({fp_col})
        LEFT JOIN comp c USING (rep_id)
    ),
    sized AS (SELECT component_id FROM labeled
              GROUP BY component_id HAVING count(*) >= 2),
    members AS (
        SELECT l.doc_id, l.component_id
        FROM labeled l JOIN sized s USING (component_id)
    )
"""


_DUP_GROUP_CTES = f"""
    {_DHASH_CTE},
    {_quotient_group_ctes("fp", "dhash", DHASH_HAMMING_T)}
"""

ORACLES["mm_image_dup_groups"] = f"""
    WITH RECURSIVE {_DUP_GROUP_CTES}
    SELECT doc_id, component_id FROM members
"""

ORACLES["mm_image_dup_canonical"] = f"""
    WITH RECURSIVE {_DUP_GROUP_CTES},
    scored AS (
        SELECT m.doc_id, m.component_id,
               row_number() OVER (
                   PARTITION BY m.component_id
                   ORDER BY CAST(d.w * d.h AS BIGINT) DESC, m.doc_id) AS rk
        FROM members m JOIN dims d USING (doc_id)
    )
    SELECT component_id,
           min(doc_id) FILTER (rk = 1) AS canonical_id,
           count(*) AS n_members
    FROM scored GROUP BY component_id
"""


AFP_HAMMING_T = 2


def mm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D difference fingerprints over the real WAV decode; the oracle
    rebuilds every bit from the id-derived sample arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    return M.audio_fingerprint(M.attach_audio_payload(docs))


def mm_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs: fingerprint hamming <= AFP_HAMMING_T
    via the Manku pigeonhole segment join — the third modality behind the
    same dedup machinery."""
    from pyspark.sql import functions as F

    from icenetetl_spark.operators.dedup import simhash_near_pairs

    fp = mm_audio_fingerprint(spark, sf_dir).select(
        "doc_id", F.col("afp").alias("simhash")
    )
    return simhash_near_pairs(fp, max_hamming=AFP_HAMMING_T, num_bits=32)


def mm_audio_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup GROUPS through the same exact-duplicate quotient as
    mm_image_dup_groups (operators/dedup.fingerprint_dup_groups over the
    WAV difference fingerprints) — components/canonical is the gated
    scale default for every modality, pair materialization the
    diagnostic."""
    fp = mm_audio_fingerprint(spark, sf_dir)
    return D.fingerprint_dup_groups(
        fp, max_hamming=AFP_HAMMING_T, num_bits=32, fp_col="afp"
    )


QUERIES["mm_audio_fingerprint"] = mm_audio_fingerprint
QUERIES["mm_audio_near_dup"] = mm_audio_near_dup
QUERIES["mm_audio_dup_groups"] = mm_audio_dup_groups

# channel-0 sample j of the WAV fixture = (id*31 + j*ch*7) % 65536 - 32768
# (interleaved index j*ch); downsample index for point k = (k*n)//33
_AFP_CTE = """
    adims AS (
        SELECT doc_id,
               64 + doc_id % 64 AS n,
               1 + doc_id % 2 AS ch
        FROM documents),
    abits AS (
        SELECT doc_id, k,
               CASE WHEN
                   (doc_id * 31 + ((k * n) // 33) * ch * 7) % 256
                   <
                   (doc_id * 31 + (((k + 1) * n) // 33) * ch * 7) % 256
               THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
        FROM adims,
             LATERAL (SELECT unnest(generate_series(0, 31)) AS k) t),
    afp AS (
        SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << k)) AS BIGINT)
                   AS afp
        FROM abits GROUP BY doc_id)
"""

ORACLES["mm_audio_fingerprint"] = f"""
    WITH {_AFP_CTE}
    SELECT doc_id, afp FROM afp
"""

ORACLES["mm_audio_near_dup"] = f"""
    WITH {_AFP_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS INTEGER) AS hamming
    FROM afp a JOIN afp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.afp, b.afp)) <= {AFP_HAMMING_T}
"""

ORACLES["mm_audio_dup_groups"] = f"""
    WITH RECURSIVE {_AFP_CTE},
    {_quotient_group_ctes("afp", "afp", AFP_HAMMING_T)}
    SELECT doc_id, component_id FROM members
"""


VIDEO_JACCARD_T = 0.5


def mm_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate pairs by frame-signature overlap: every frame's
    (width, height, luma_sum) from the REAL Y4M decode acts as a frame
    fingerprint; videos sharing >= VIDEO_JACCARD_T Jaccard of their
    distinct frame-signature sets are near-dups. The candidate join is an
    inverted-index equi-join on the signature (the shingle-Jaccard plan
    shape over frames instead of n-grams) — never an all-pairs compare."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    frames = M.decode_video_frames(
        M.attach_video_payload(docs), every_nth=1
    )
    sig = frames.select("doc_id", "width", "height", "luma_sum").distinct()
    sizes = sig.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsig"))
    a, b = sig.alias("a"), sig.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.width") == F.col("b.width"))
            & (F.col("a.height") == F.col("b.height"))
            & (F.col("a.luma_sum") == F.col("b.luma_sum"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("nsig").alias("nsig_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("nsig").alias("nsig_b")
    )
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / (
                    F.col("nsig_a") + F.col("nsig_b") - F.col("n_shared")
                ).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(VIDEO_JACCARD_T))
    )


def mm_video_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup GROUPS: star-contraction components over the
    frame-signature Jaccard pairs — completing the components/canonical
    default across all three media modalities (image/audio use the
    integer-fingerprint quotient; the video pair input is already an
    inverted-index equi-join, so components run on its output like text
    dedup_groups)."""
    pairs = mm_video_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    return D.connected_components(pairs)


QUERIES["mm_video_near_dup"] = mm_video_near_dup
QUERIES["mm_video_dup_groups"] = mm_video_dup_groups

_VIDEO_PAIR_CTES = f"""
    vdims AS (
        SELECT doc_id,
               1 + doc_id % 12 AS n_frames,
               4 + (doc_id % 3) * 2 AS w,
               2 + ((doc_id // 3) % 3) * 2 AS h
        FROM documents),
    vfr AS (
        SELECT doc_id, w, h,
               unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT)))
                   AS frame_idx
        FROM vdims),
    vpx AS (
        SELECT doc_id, w, h, frame_idx,
               unnest(generate_series(0, CAST(w * h - 1 AS BIGINT))) AS i
        FROM vfr),
    sums AS (
        SELECT doc_id, w, h, frame_idx,
               SUM((doc_id + frame_idx * 7 + i) % 256) AS luma_sum
        FROM vpx GROUP BY 1, 2, 3, 4),
    sig AS (SELECT DISTINCT doc_id, w, h, luma_sum FROM sums),
    sizes AS (SELECT doc_id, COUNT(*) AS nsig FROM sig GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM sig a JOIN sig b
          ON a.w = b.w AND a.h = b.h AND a.luma_sum = b.luma_sum
         AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    vjp AS (
        SELECT doc_a, doc_b, n_shared,
               CAST(n_shared AS DOUBLE)
                   / CAST(sa.nsig + sb.nsig - n_shared AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_shared AS DOUBLE)
                   / CAST(sa.nsig + sb.nsig - n_shared AS DOUBLE)
              >= {VIDEO_JACCARD_T})
"""

ORACLES["mm_video_near_dup"] = f"""
    WITH {_VIDEO_PAIR_CTES}
    SELECT doc_a, doc_b, n_shared, jaccard FROM vjp
"""

def _vclosure() -> str:
    from icenetetl_spark.queries.dedup import closure_ctes

    return closure_ctes("vjp", "vcomp", "doc_id", prefix="v")


ORACLES["mm_video_dup_groups"] = f"""
    WITH RECURSIVE {_VIDEO_PAIR_CTES},
    {_vclosure()}
    SELECT doc_id, component_id FROM vcomp
"""
