"""Deduplication queries over the ``documents`` table, binding
operators.dedup to the driver testdata. Oracle SQL is generated from the same
parameter tables the Spark operators use, so constants can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from icenetetl_spark.operators import dedup as D
from icenetetl_spark.operators.scale import cap_document_frequency
from icenetetl_spark.functions.portable import portable_hash64_sql
from icenetetl_spark.sources.testdata import load_table

NGRAM_N = 3
JACCARD_T = 0.8
# Document-frequency cap applied to the shingle postings BEFORE the
# inverted-index self-join: a boilerplate shingle shared by 10^6 docs would
# contribute 10^12 candidate pairs — the last data-dependent quadratic on a
# default path. 25 = 5% of the sf0.01 corpus; the observed max df there is 7,
# so the cap is inert at test scale (same answer) and active only against the
# hot shingles it exists to kill. Mirrored in the oracle via HAVING.
NGRAM_MAX_DF = 25
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


def _capped_shingles(docs: DataFrame) -> DataFrame:
    """Shared candidate-generation input for the n-gram family: distinct
    shingles with the document-frequency cap applied (operators/scale.py)."""
    return cap_document_frequency(
        D.word_shingles(docs, n=NGRAM_N), NGRAM_MAX_DF
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(_capped_shingles(docs), threshold=JACCARD_T)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(D.word_shingles(docs, n=NGRAM_N), NUM_HASHES)
    return D.lsh_candidate_pairs(sigs, NUM_HASHES, BANDS)


# Hot-band-bucket cap for the gated lever query: non-vacuous at the
# sf0.01 gate scale (max observed bucket = 3 docs, so cap=2 actually
# drops a bucket); production sets this orders of magnitude higher —
# the point of the gate is the SEMANTICS of dropping over-cap buckets.
LSH_MAX_BUCKET = 2


def dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-band-bucket skew lever UNDER THE HASH GATE (the
    dedup_substring_sampled pattern: the approximation itself is
    value-gated): band buckets larger than LSH_MAX_BUCKET are dropped
    before the candidate self-join, bounding the quadratic per-bucket
    pair work boilerplate-heavy corpora concentrate into a few buckets
    (the SCALING.md skew table measures the uncapped plan at 1.07x on the
    synthetic boilerplate corpus; the cap is the by-construction bound
    for real mega-cluster skew). The oracle mirrors
    the cap as a HAVING count(*) filter on the same band keys."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(D.word_shingles(docs, n=NGRAM_N), NUM_HASHES)
    return D.lsh_candidate_pairs(
        sigs, NUM_HASHES, BANDS, max_bucket=LSH_MAX_BUCKET
    )


def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates with MinHash-estimated Jaccard (signature-agreement
    fraction) — the estimate step that prunes candidates without re-touching
    the shingle sets."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(D.word_shingles(docs, n=NGRAM_N), NUM_HASHES)
    return D.minhash_estimate_pairs(sigs, NUM_HASHES, BANDS)


# "new batch" split for the incremental-index query: every 5th doc arrives
# after the index was built over the rest.
INCR_MOD = 5


def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH-index maintenance (operators/dedup.lsh_probe_pairs):
    the new batch probes the persisted band index — pairs touching the
    batch, WITHOUT rescanning the indexed corpus. Signatures/bands are
    per-doc (no corpus-dependent state), so this must equal the batch
    answer filtered to pairs involving a new doc — exactly what the
    oracle computes."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % INCR_MOD != 0)
    new = docs.filter(F.col("doc_id") % INCR_MOD == 0)

    def bands(d):
        return D.lsh_band_index(
            D.minhash_signatures(D.word_shingles(d, n=NGRAM_N), NUM_HASHES),
            NUM_HASHES,
            BANDS,
        )

    return D.lsh_probe_pairs(bands(old), bands(new))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(load_table(spark, sf_dir, "documents"), num_bits=SIM_BITS)


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sim = D.simhash(load_table(spark, sf_dir, "documents"), num_bits=SIM_BITS)
    return D.simhash_near_pairs(sim, max_hamming=HAMMING_T)


PAIR_TOPN = 5


def dedup_simhash_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded near-dup shortlist over the exact-duplicate QUOTIENT (the
    scale default over the quadratic-output pair diagnostic): each
    distinct simhash's min-doc representative gets its PAIR_TOPN nearest
    other representatives within HAMMING_T bits, member counts carried.
    A doc-level cap is not enough at SIM_BITS=16: the pigeonhole join has
    only (HAMMING_T+1) * 2^4 buckets, so doc-level candidates grow
    quadratically with the corpus no matter what survives the window —
    while the quotient bounds every stage by the distinct-fingerprint
    universe (<= 2^16 forever). Doc expansion is one join through the
    simhash map (operators/dedup.fingerprint_topn_pairs)."""
    # spread_input=False (r13): this consumer evaluates the simhash
    # subtree twice (reps + members) and the spread exchange measured
    # 1.2x WORSE here (interleaved A/B) — see operators/dedup.simhash
    sim = D.simhash(
        load_table(spark, sf_dir, "documents"), num_bits=SIM_BITS,
        spread_input=False,
    )
    return D.fingerprint_topn_pairs(
        sim,
        max_hamming=HAMMING_T,
        num_bits=SIM_BITS,
        per_fp=PAIR_TOPN,
        fp_col="simhash",
    )


def dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> transitive GROUPS (connected components); each doc
    labeled with the min doc_id of its component. The oracle is a recursive
    CTE computing the same closure."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(_capped_shingles(docs), threshold=JACCARD_T)
    return D.connected_components(pairs)


# Passage-level dedup granularity: non-overlapping 6-word windows of the
# normalized text (the testdata has no blank-line paragraphs; real corpora
# use mode='paragraph' on the same operator). A doc whose passages are
# mostly duplicated elsewhere is boilerplate even when its full text is
# unique — corpus_prep_pipeline drops dup_frac > PARA_DUP_MAX.
PARA_WINDOW = 6
PARA_DUP_MAX = 0.5


def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup signal (RefinedWeb/Gopher-style): per doc, the
    fraction of its passages whose content fingerprint appears in >= 2
    distinct documents."""
    docs = load_table(spark, sf_dir, "documents")
    return D.passage_dup_stats(
        D.split_passages(docs, mode="window", window=PARA_WINDOW)
    )


# CDC divisor: expected segment length ≈ 8 tokens (comparable granularity
# to PARA_WINDOW, but with shift-robust boundaries)
CDC_DIVISOR = 8


def dedup_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup signal: passage_dup_stats over
    hash-boundary segments (operators/dedup.cdc_segments) instead of
    fixed windows — catches boilerplate that survives window dedup because
    an insertion shifted its alignment."""
    docs = load_table(spark, sf_dir, "documents")
    return D.passage_dup_stats(D.cdc_segments(docs, divisor=CDC_DIVISOR))


def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup policy: within each near-dup group keep the
    highest-quality member (tiebreak lowest doc_id) — the keep/drop decision
    a training pipeline actually executes."""
    from pyspark.sql.window import Window

    from icenetetl_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(_capped_shingles(docs), threshold=JACCARD_T)
    comp = D.connected_components(pairs)
    scored = comp.join(docs, "doc_id").select(
        "doc_id", "component_id", quality_score(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("component_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .groupBy("component_id")
        .agg(
            F.min(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


PR_ITERATIONS = 10


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the near-dup graph (operators/
    graph.py): rank concentrates on documents sitting inside dense
    duplicate neighborhoods — a centrality-weighted dedup priority.
    Hash-gated: fixed-point per-iteration sums make the iterative numeric
    bit-identical to the oracle's unrolled-CTE twin.

    The graph is the CAPPED-SHINGLE Jaccard pair set (same edges as
    dedup_groups) rather than the SimHash Hamming-ball pairs: the df-cap
    bounds every document's candidate degree by construction, so graph
    CONSTRUCTION stays linear on corpora where hash-space density grows
    faster than the corpus (the 10x stress corpus's Hamming balls grew
    super-quadratically and made the uncapped variant OOM the 16g heap —
    an unbounded-degree graph is the wrong input for an iterative
    operator at any scale)."""
    from icenetetl_spark.operators.graph import pagerank, symmetrize

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(_capped_shingles(docs), threshold=JACCARD_T).select(
        "doc_a", "doc_b"
    )
    pr = pagerank(symmetrize(pairs), iterations=PR_ITERATIONS)
    return pr.select(
        F.col("node").alias("doc_id"), F.col("rank").alias("pagerank")
    )


SUBSTR_K = 20


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication spans (Lee et al. ACL'22 re-expressed
    relationally, operators/substrings.py): maximal regions whose every
    SUBSTR_K-char window occurs more than once in the corpus."""
    from icenetetl_spark.operators.substrings import duplicated_spans

    return duplicated_spans(
        load_table(spark, sf_dir, "documents"), k=SUBSTR_K
    )


def dedup_substring_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-character fraction — the curation-filter
    feature derived from the span set (zeros for clean documents)."""
    from icenetetl_spark.operators.substrings import duplication_profile

    return duplication_profile(
        load_table(spark, sf_dir, "documents"), k=SUBSTR_K
    )


SUBSTR_SAMPLE_MOD = 4


def dedup_substring_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The duplication profile under content-defined gram sampling
    (gram_hash % SUBSTR_SAMPLE_MOD == 0 — the operators/substrings.py
    100-TB lever): every post-hash stage carries ~1/4 of the rows. The
    sampling predicate is a pure function of the portable hash, so the
    estimate is deterministic and the oracle replays it exactly — the
    approximation itself sits under the value-hash gate."""
    from icenetetl_spark.operators.substrings import duplication_profile

    return duplication_profile(
        load_table(spark, sf_dir, "documents"),
        k=SUBSTR_K,
        sample_mod=SUBSTR_SAMPLE_MOD,
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_substring_spans": dedup_substring_spans,
    "dedup_substring_profile": dedup_substring_profile,
    "dedup_substring_sampled": dedup_substring_sampled,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_minhash_lsh_capped": dedup_minhash_lsh_capped,
    "dedup_minhash_estimate": dedup_minhash_estimate,
    "dedup_minhash_incremental": dedup_minhash_incremental,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_simhash_topn": dedup_simhash_topn,
    "dedup_groups": dedup_groups,
    "dedup_canonical": dedup_canonical,
    "dedup_paragraphs": dedup_paragraphs,
    "dedup_cdc": dedup_cdc,
    "graph_pagerank": graph_pagerank,
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


from icenetetl_spark.operators.text import STOPWORDS as _STOPWORDS

_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

# shared pair-building CTE chain (used by jaccard / groups / canonical).
# shc mirrors cap_document_frequency: sh is distinct (doc_id, shingle), so
# count(*) per shingle IS its document frequency; HAVING <= NGRAM_MAX_DF drops
# the same hot shingles the Spark plan drops.
_PAIRS_CTES = f"""
    shc AS (
        SELECT sh.doc_id, sh.shingle FROM sh
        JOIN (SELECT shingle FROM sh GROUP BY shingle
              HAVING count(*) <= {NGRAM_MAX_DF}) ok USING (shingle)
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
    rawpairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM shc a JOIN shc b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jpairs AS (
        SELECT doc_a, doc_b,
               CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
        FROM rawpairs
        JOIN counts ca ON ca.doc_id = doc_a
        JOIN counts cb ON cb.doc_id = doc_b
        WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= {JACCARD_T}
    )
"""

# transitive closure of the near-dup graph (recursive CTE)
def closure_ctes(
    pairs: str, out: str = "comp", out_node: str = "doc_id",
    prefix: str = "",
) -> str:
    """The ONE recursive connected-components closure every groups oracle
    shares (text, image, audio, video): edges/gnodes/reach CTEs over a
    pair CTE named ``pairs`` (columns doc_a/doc_b), plus a final ``out``
    CTE labeling each node with min reachable node as component_id.
    ``prefix`` namespaces the intermediate CTE names so several closures
    (or a closure next to same-named CTEs) can share one statement. A
    change to the closure shape lands here once, for all oracles."""
    p = prefix
    return f"""
    {p}edges AS (SELECT doc_a AS a, doc_b AS b FROM {pairs}
              UNION SELECT doc_b, doc_a FROM {pairs}),
    {p}gnodes AS (SELECT DISTINCT a AS n FROM {p}edges),
    {p}reach(n, m) AS (
        SELECT n, n FROM {p}gnodes
        UNION
        SELECT r.n, e.b FROM {p}reach r JOIN {p}edges e ON r.m = e.a
    ),
    {out} AS (SELECT n AS {out_node}, min(m) AS component_id
              FROM {p}reach GROUP BY n)
"""


_COMPONENTS_CTES = closure_ctes("jpairs", "comp", "doc_id")

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
        {_PAIRS_CTES}
        SELECT doc_a, doc_b, jaccard FROM jpairs
    """,
    "dedup_groups": f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        {_PAIRS_CTES},
        {_COMPONENTS_CTES}
        SELECT doc_id, component_id FROM comp
    """,
    "dedup_paragraphs": f"""
        WITH words AS (
            SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
        ),
        chunks AS (
            SELECT doc_id, i AS para_idx,
                   array_to_string(
                       w[i*{PARA_WINDOW}+1 : i*{PARA_WINDOW}+{PARA_WINDOW}],
                       ' ') AS passage
            FROM words,
                 LATERAL (SELECT unnest(generate_series(
                     0, CAST(ceil(len(w)/{PARA_WINDOW}.0) - 1 AS BIGINT))) AS i) t
            WHERE len(w) > 0
        ),
        fp AS (SELECT doc_id, para_idx, md5(passage) AS f FROM chunks),
        dfc AS (SELECT f, count(DISTINCT doc_id) AS nd FROM fp GROUP BY f),
        per AS (
            SELECT p.doc_id, count(*) AS n_passages,
                   count(*) FILTER (d.nd >= 2) AS n_dup_passages
            FROM fp p JOIN dfc d USING (f) GROUP BY p.doc_id
        )
        SELECT doc_id, n_passages, n_dup_passages,
               CAST(n_dup_passages AS DOUBLE) / CAST(n_passages AS DOUBLE)
                   AS dup_frac
        FROM per
    """,
    # Mirrors cdc_segments + passage_dup_stats: same trailing-4-gram hash
    # boundary rule (Spark 0-based i vs SQL 1-based i: i_sql >= 4 and
    # w[i-3:i] are the identical 4 tokens), same running-sum segment ids,
    # same md5 fingerprint stats.
    "dedup_cdc": f"""
        WITH words AS (
            SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
            WHERE len(string_split({_NORM}, ' ')) > 0
        ),
        tok AS (
            SELECT doc_id, i - 1 AS pos, w[i] AS tok,
                   CASE WHEN i >= {D.CDC_NGRAM}
                         AND ({portable_hash64_sql(
                             f"array_to_string(w[i-{D.CDC_NGRAM - 1}:i], ' ')",
                             32)}) % {CDC_DIVISOR} = 0
                        THEN 1 ELSE 0 END AS flag
            FROM words,
                 LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) t
        ),
        seg AS (
            SELECT doc_id, pos, tok,
                   COALESCE(SUM(flag) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS para_idx
            FROM tok
        ),
        chunks AS (
            SELECT doc_id, para_idx, string_agg(tok, ' ' ORDER BY pos)
                       AS passage
            FROM seg GROUP BY 1, 2
        ),
        fp AS (SELECT doc_id, para_idx, md5(passage) AS f FROM chunks),
        dfc AS (SELECT f, count(DISTINCT doc_id) AS nd FROM fp GROUP BY f),
        per AS (
            SELECT p.doc_id, count(*) AS n_passages,
                   count(*) FILTER (d.nd >= 2) AS n_dup_passages
            FROM fp p JOIN dfc d USING (f) GROUP BY p.doc_id
        )
        SELECT doc_id, n_passages, n_dup_passages,
               CAST(n_dup_passages AS DOUBLE) / CAST(n_passages AS DOUBLE)
                   AS dup_frac
        FROM per
    """,
    "dedup_canonical": f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        {_PAIRS_CTES},
        {_COMPONENTS_CTES},
        feats AS (
            SELECT doc_id,
                   CAST(len(list_distinct(string_split({_NORM}, ' '))) AS DOUBLE)
                       / len(string_split({_NORM}, ' ')) AS distinct_ratio,
                   CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
                       / len(string_split({_NORM}, ' ')) AS mean_token_len,
                   CAST(len(list_filter(string_split({_NORM}, ' '),
                        x -> x IN ({_STOPWORDS_SQL})))
                        AS DOUBLE)
                       / len(string_split({_NORM}, ' ')) AS stopword_ratio
            FROM documents
        ),
        quality AS (
            SELECT doc_id,
                   distinct_ratio
                   * (CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 8.0
                           THEN 1.0 ELSE 0.5 END)
                   * (CASE WHEN stopword_ratio <= 0.5 THEN 1.0 ELSE 0.5 END)
                       AS quality
            FROM feats
        ),
        ranked AS (
            SELECT c.component_id, c.doc_id, q.quality,
                   row_number() OVER (PARTITION BY c.component_id
                                      ORDER BY q.quality DESC, c.doc_id) AS rk
            FROM comp c JOIN quality q ON q.doc_id = c.doc_id
        )
        SELECT component_id,
               min(CASE WHEN rk = 1 THEN doc_id END) AS canonical_id,
               count(*) AS n_members
        FROM ranked GROUP BY component_id
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
    # the batch answer restricted to pairs involving a new-batch doc —
    # the exact contract of lsh_probe_pairs (signatures are per-doc, so
    # incremental == filtered batch)
    "dedup_minhash_incremental": f"""
        WITH {_SHINGLES_CTE},
        {_minhash_sig_sql()},
        banded AS ({_banded_sql()})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
        WHERE a.doc_id % {INCR_MOD} = 0 OR b.doc_id % {INCR_MOD} = 0
    """,
    "dedup_minhash_lsh_capped": f"""
        WITH {_SHINGLES_CTE},
        {_minhash_sig_sql()},
        banded AS ({_banded_sql()}),
        keepb AS (
            SELECT band_idx, band_sig FROM banded
            GROUP BY band_idx, band_sig
            HAVING count(*) <= {LSH_MAX_BUCKET}
        ),
        cb AS (SELECT banded.* FROM banded JOIN keepb
               USING (band_idx, band_sig))
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM cb a JOIN cb b
          ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
    """,
    "dedup_minhash_estimate": f"""
        WITH {_SHINGLES_CTE},
        {_minhash_sig_sql()},
        banded AS ({_banded_sql()}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
             AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST({" + ".join(f"(CASE WHEN sa.mh{h} = sb.mh{h} THEN 1 ELSE 0 END)" for h in range(NUM_HASHES))}
                    AS DOUBLE) / {NUM_HASHES} AS est_jaccard
        FROM cand
        JOIN sig sa ON sa.doc_id = doc_a
        JOIN sig sb ON sb.doc_id = doc_b
    """,
    "dedup_simhash": _simhash_sql(),
    "dedup_simhash_pairs": f"""
        WITH sim AS ({_simhash_sql()})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_T}
    """,
    # the segment-join pre-cap is lossless for the top-N (see
    # simhash_topn_pairs), so the oracle is the simple definition over
    # the quotient: distinct fingerprints -> all-pairs -> one window
    "dedup_simhash_topn": f"""
        WITH sim AS ({_simhash_sql()}),
        reps AS (
            SELECT simhash, min(doc_id) AS rep_id,
                   CAST(count(*) AS BIGINT) AS n_members
            FROM sim GROUP BY simhash
        ),
        pairs AS (
            SELECT a.rep_id AS rep_a, a.n_members AS n_members_a,
                   b.rep_id AS rep_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                       AS hamming
            FROM reps a JOIN reps b ON a.rep_id <> b.rep_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_T}
        )
        SELECT rep_a, n_members_a, rep_b, hamming,
               CAST(rank AS INTEGER) AS rank FROM (
            SELECT *, row_number() OVER (PARTITION BY rep_a
                      ORDER BY hamming, rep_b) AS rank
            FROM pairs
        ) WHERE rank <= {PAIR_TOPN}
    """,
}


def _substr_cte(sample_mod: int = 1) -> str:
    """grams/dup/pos_dup/isl/spans CTE chain, optionally with the
    content-defined sampling predicate (gram_hash % sample_mod = 0) the
    sampled profile query applies — generated from the same constants the
    Spark operator uses so the two can never drift."""
    sample = (
        f" AND gram_hash % {sample_mod} = 0" if sample_mod > 1 else ""
    )
    return f"""
    grams0 AS (
        SELECT doc_id, i AS pos,
               {portable_hash64_sql(f"substr(text, i, {SUBSTR_K})", 48)}
                   AS gram_hash
        FROM documents,
             unnest(generate_series(1, length(text) - {SUBSTR_K} + 1))
                 AS t(i)
        WHERE length(text) >= {SUBSTR_K}
    ),
    grams AS (SELECT * FROM grams0 WHERE true{sample}),
    dup AS (
        SELECT gram_hash FROM grams GROUP BY gram_hash HAVING COUNT(*) > 1
    ),
    pos_dup AS (SELECT doc_id, pos FROM grams JOIN dup USING (gram_hash)),
    isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS island
        FROM pos_dup
    ),
    spans AS (
        SELECT doc_id,
               CAST(MIN(pos) AS INTEGER) AS span_start,
               CAST(MAX(pos) + {SUBSTR_K} - 1 AS INTEGER) AS span_end,
               CAST(MAX(pos) + {SUBSTR_K} - MIN(pos) AS INTEGER) AS span_len
        FROM isl GROUP BY doc_id, island
    )
"""


_SUBSTR_SPANS_CTE = _substr_cte()

ORACLES["dedup_substring_spans"] = f"""
    WITH {_SUBSTR_SPANS_CTE}
    SELECT doc_id, span_start, span_end, span_len FROM spans
"""

_SUBSTR_PROFILE_BODY = f"""
    lagged AS (
        SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM pos_dup
    ),
    marked AS (
        SELECT doc_id, pos,
               SUM(CASE WHEN prev IS NULL OR pos - prev > {SUBSTR_K}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS region
        FROM lagged
    ),
    regions AS (
        SELECT doc_id, MAX(pos) + {SUBSTR_K} - MIN(pos) AS cov_chars
        FROM marked GROUP BY doc_id, region
    ),
    agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_regions,
               CAST(SUM(cov_chars) AS BIGINT) AS dup_chars
        FROM regions GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_regions, CAST(0 AS BIGINT)) AS n_regions,
           COALESCE(dup_chars, CAST(0 AS BIGINT)) AS dup_chars,
           CAST(COALESCE(dup_chars, 0) AS DOUBLE) / length(d.text) AS dup_frac
    FROM documents d LEFT JOIN agg USING (doc_id)
"""

ORACLES["dedup_substring_profile"] = f"""
    WITH {_SUBSTR_SPANS_CTE},
    {_SUBSTR_PROFILE_BODY}
"""

ORACLES["dedup_substring_sampled"] = f"""
    WITH {_substr_cte(SUBSTR_SAMPLE_MOD)},
    {_SUBSTR_PROFILE_BODY}
"""


def _pagerank_oracle() -> str:
    from icenetetl_spark.operators.graph import pagerank_oracle_sql

    # AS MATERIALIZED on the edge list: the unrolled iterations reference
    # it 10 times, and DuckDB's default CTE inlining re-ran the whole
    # capped-shingle Jaccard pair join per iteration — the dominant share
    # of the gate's oracle-side wall (round-9 verdict #3). Pure execution
    # hint; values unchanged.
    return f"""
        SELECT node AS doc_id, rank AS pagerank FROM (
            WITH pairs AS MATERIALIZED (
                SELECT doc_a, doc_b FROM ({ORACLES["dedup_ngram_jaccard"]}) jp
            ),
            edges AS MATERIALIZED (
                SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION
                SELECT doc_b, doc_a FROM pairs
            ),
            {pagerank_oracle_sql("edges")}
        ) t
    """


ORACLES["graph_pagerank"] = _pagerank_oracle()


# ---------------------------------------------------------------------------
# Dedup-method scorecard: recall AND precision of every approximate
# candidate generator against the exact n-gram Jaccard ground truth, in one
# gated query — the dedup twin of queries/similarity.knn_recall_report, and
# composed the same way: from the SAME query functions and oracle texts as
# the individual gates, so the scorecard can never drift from what it scores.

_SCORECARD_METHODS = ("dedup_minhash_lsh", "dedup_simhash_pairs")


def dedup_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(method, n_truth, n_candidates, n_matched, recall, precision) per
    approximate method. One full-outer join + one aggregate per method —
    integer counts with two final divisions, bit-identical across engines."""
    truth = (
        dedup_ngram_jaccard(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("in_t", F.lit(1))
    )
    parts = []
    for m in _SCORECARD_METHODS:
        cand = (
            QUERIES[m](spark, sf_dir)
            .select("doc_a", "doc_b")
            .withColumn("in_c", F.lit(1))
        )
        j = truth.join(cand, ["doc_a", "doc_b"], "full")
        parts.append(
            j.agg(
                F.count("in_t").alias("n_truth"),
                F.count("in_c").alias("n_candidates"),
                F.count(F.when(F.col("in_t").isNotNull(), F.col("in_c"))).alias(
                    "n_matched"
                ),
            ).select(
                F.lit(m).alias("method"),
                "n_truth",
                "n_candidates",
                "n_matched",
                (
                    F.col("n_matched").cast("double")
                    / F.col("n_truth").cast("double")
                ).alias("recall"),
                (
                    F.col("n_matched").cast("double")
                    / F.col("n_candidates").cast("double")
                ).alias("precision"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


QUERIES["dedup_scorecard"] = dedup_scorecard

ORACLES["dedup_scorecard"] = "\nUNION ALL\n".join(
    f"""
    SELECT '{m}' AS method,
           CAST(COUNT(t.doc_a) AS BIGINT) AS n_truth,
           CAST(COUNT(c.doc_a) AS BIGINT) AS n_candidates,
           CAST(COUNT(CASE WHEN t.doc_a IS NOT NULL AND c.doc_a IS NOT NULL
                           THEN 1 END) AS BIGINT) AS n_matched,
           CAST(COUNT(CASE WHEN t.doc_a IS NOT NULL AND c.doc_a IS NOT NULL
                           THEN 1 END) AS DOUBLE)
               / CAST(COUNT(t.doc_a) AS DOUBLE) AS recall,
           CAST(COUNT(CASE WHEN t.doc_a IS NOT NULL AND c.doc_a IS NOT NULL
                           THEN 1 END) AS DOUBLE)
               / CAST(COUNT(c.doc_a) AS DOUBLE) AS precision
    FROM (SELECT doc_a, doc_b FROM ({ORACLES["dedup_ngram_jaccard"]}) x) t
    FULL JOIN (SELECT doc_a, doc_b FROM ({ORACLES[m]}) y) c
      USING (doc_a, doc_b)
    """
    for m in _SCORECARD_METHODS
)


SPLIT_FRACTIONS = {"train": 90, "val": 5, "test": 5}


def doc_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment that can NEVER leak a near-duplicate
    across splits: documents are keyed by their near-dup COMPONENT id
    (connected components of the exact-Jaccard graph; isolated docs key
    by their own id), and the whole component hash-buckets into one
    split together. The contamination-by-near-copy failure mode of plain
    per-doc splitting is structurally impossible (property-tested)."""
    from icenetetl_spark.operators.sampling import split_by_hash

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(_capped_shingles(docs), threshold=JACCARD_T)
    comp = D.connected_components(pairs)
    keyed = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component_id"), F.col("doc_id"))
            .cast("string")
            .alias("split_key"),
        )
    )
    return split_by_hash(keyed, "split_key", SPLIT_FRACTIONS).select(
        "doc_id", "split"
    )


QUERIES["doc_leakage_safe_split"] = doc_leakage_safe_split


def _split_case_sql(bucket_expr: str) -> str:
    out, lo = [], 0
    for name, pct in SPLIT_FRACTIONS.items():
        out.append(
            f"WHEN {bucket_expr} >= {lo} AND {bucket_expr} < {lo + pct} "
            f"THEN '{name}'"
        )
        lo += pct
    return "CASE " + " ".join(out) + " END"


ORACLES["doc_leakage_safe_split"] = f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_PAIRS_CTES},
    {_COMPONENTS_CTES},
    keyed AS (
        SELECT d.doc_id,
               CAST(COALESCE(c.component_id, d.doc_id) AS VARCHAR)
                   AS split_key
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    )
    SELECT doc_id,
           {_split_case_sql(
               portable_hash64_sql("split_key", 32) + " % 100"
           )} AS split
    FROM keyed
"""
