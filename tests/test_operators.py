"""Unit tests for relational / dedup / similarity / text / multimodal
operators on small in-memory frames (the driver-testdata-scale behavior is
covered by tools/check_oracle.py against DuckDB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from icenetetl_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
    simhash_near_pairs,
    word_shingles,
)
from icenetetl_spark.operators.multimodal import (
    attach_binary_payload,
    binary_metadata,
    decode_media,
    frame_sample_plan,
)
from icenetetl_spark.operators.relational import (
    insert_missing,
    latest_snapshot,
    rename_normalize,
    upsert,
)
from icenetetl_spark.operators.similarity import (
    knn_bruteforce,
    knn_sign_lsh,
)
from icenetetl_spark.operators.text import predict_language, quality_score


def test_rename_normalize_conditional(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "mean double, other double")
    out = rename_normalize(df, {"mean": "sic_mean", "stddev": "sic_stddev"})
    assert out.columns == ["sic_mean", "other"]


def test_latest_snapshot(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-02-01"), (3, "2024-02-01")], "id int, d string"
    ).withColumn("d", F.to_date("d"))
    out = latest_snapshot(df, "d")
    assert {r["id"] for r in out.collect()} == {2, 3}


def test_insert_missing_and_upsert(spark):
    existing = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    incoming = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    assert {r["k"] for r in insert_missing(incoming, existing, ["k"]).collect()} == {3}
    merged = {r["k"]: r["v"] for r in upsert(incoming, existing, ["k"]).collect()}
    assert merged == {1: "a", 2: "B", 3: "c"}


def test_exact_duplicates_normalization(spark):
    docs = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    out = {r["canonical_id"]: r["n_copies"] for r in exact_duplicates(docs).collect()}
    assert out == {1: 2, 3: 1}


def test_jaccard_identical_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w v")],
        "doc_id long, text string",
    )
    sh = word_shingles(docs, n=3)
    pairs = jaccard_pairs(sh, threshold=0.5).collect()
    assert len(pairs) == 1
    assert (pairs[0]["doc_a"], pairs[0]["doc_b"], pairs[0]["jaccard"]) == (1, 2, 1.0)


def test_minhash_lsh_finds_identical(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "p q r s t u v")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(word_shingles(docs, n=3), num_hashes=16)
    assert sigs.count() == 3 and len(sigs.columns) == 17
    cands = lsh_candidate_pairs(sigs, 16, 4).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in cands} == {(1, 2)}


def test_lsh_incremental_probe_equals_batch(spark):
    """Index+probe maintenance is lossless: pairs(old) ∪ probe(index(old),
    new) must equal the full-corpus batch answer — no pair is missed and
    none is invented when a batch lands incrementally."""
    from icenetetl_spark.operators.dedup import lsh_band_index, lsh_probe_pairs

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)

    def bands(d):
        return lsh_band_index(
            minhash_signatures(word_shingles(d, n=3), 16), 16, 4
        )

    batch = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            minhash_signatures(word_shingles(docs, n=3), 16), 16, 4
        ).collect()
    }
    old_only = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            minhash_signatures(word_shingles(old, n=3), 16), 16, 4
        ).collect()
    }
    probe = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_probe_pairs(bands(old), bands(new)).collect()
    }
    assert old_only | probe == batch
    assert not (old_only & probe), "probe pairs must all touch the new batch"


def test_simhash_deterministic_and_near(spark):
    docs = spark.createDataFrame(
        [(1, "w x y z " * 10), (2, "w x y z " * 10), (3, "completely other words")],
        "doc_id long, text string",
    )
    sim = simhash(docs)
    vals = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert vals[1] == vals[2]
    near = simhash_near_pairs(sim, max_hamming=0).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in near} == {(1, 2)}


def test_knn_exact_vs_lsh(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.1]),
        (2, [0.9, 0.1, 0.0, 0.1]),
        (3, [0.0, 1.0, 0.0, 0.1]),
        (4, [-1.0, 0.0, 0.0, 0.1]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 1)
    exact = knn_bruteforce(q, emb, k=1).first()
    assert exact["neighbor_id"] == 2
    approx = knn_sign_lsh(q, emb, k=3, num_bits=4).collect()
    # bucket '1000'-ish excludes the antipode vec 4
    assert all(r["neighbor_id"] != 4 for r in approx)


def test_language_and_quality(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog is a friend of the house"),
            (2, "der hund und die katze ist der freund"),
            (3, "qqq zzz vvv"),
        ],
        "doc_id long, text string",
    )
    pred = {
        r["doc_id"]: r["p"]
        for r in docs.select("doc_id", predict_language(F.col("text")).alias("p")).collect()
    }
    assert pred == {1: "en", 2: "de", 3: "und"}
    q = {
        r["doc_id"]: r["q"]
        for r in docs.select("doc_id", quality_score(F.col("text")).alias("q")).collect()
    }
    assert 0 < q[1] <= 1.0 and q[3] == 1.0  # all-distinct short doc scores high


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "")], "doc_id long, text string"
    )
    payload = attach_binary_payload(docs)
    meta = {r["doc_id"]: r for r in binary_metadata(payload).collect()}
    assert meta[1]["n_bytes"] == 8 and meta[1]["header_hex"] == "6162636465666768"
    assert meta[2]["is_nonempty"] is False
    dec = {r["doc_id"]: r for r in decode_media(payload).collect()}
    assert dec[1]["width"] == 9 and dec[1]["height"] == 1 and dec[1]["n_pixels"] == 9
    assert dec[1]["format"] == "png"
    frames = frame_sample_plan(payload, every_nth=3).collect()
    # doc 1: n_frames = 8 % 256 + 1 = 9 -> idx 0,3,6; doc 2: n_frames 1 -> idx 0
    got = sorted((r["doc_id"], r["frame_idx"]) for r in frames)
    assert got == [(1, 0), (1, 3), (1, 6), (2, 0)]


def test_connected_components(spark):
    from icenetetl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "doc_a long, doc_b long",
    )
    out = {r["doc_id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_chain_diameter(spark):
    """An adversarial CHAIN far longer than the round budget: min-label
    propagation would need diameter (64) rounds; large/small-star must
    converge within the 25-round cap (O(log^2 n), diameter-independent)."""
    from icenetetl_spark.operators.dedup import connected_components

    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    out = connected_components(pairs).collect()
    assert {r["component_id"] for r in out} == {0}
    assert len(out) == n + 1


def test_connected_components_random_graph_vs_union_find(spark):
    """Cross-check star convergence against a driver-side union-find oracle
    on a seeded random graph (mixed component shapes and sizes)."""
    import random

    from icenetetl_spark.operators.dedup import connected_components

    rng = random.Random(7)
    nodes = list(range(200))
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(150)}
    )
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    touched = {v for e in edges for v in e}
    expected = {
        v: min(u for u in touched if find(u) == find(v)) for v in touched
    }
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == expected


def test_connected_components_empty(spark):
    from icenetetl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_fingerprint_dup_groups_equals_unquotiented_closure(spark):
    """The exact-duplicate quotient is a lossless graph transformation:
    groups over distinct-fingerprint representatives + label propagation
    must equal components over the full per-doc pair set (with singleton
    components absent from both). Fixture mixes exact-dup classes, a
    near-dup bridge between classes, and isolated docs."""
    from icenetetl_spark.operators.dedup import (
        connected_components,
        fingerprint_dup_groups,
        simhash_near_pairs,
    )

    rows = [
        # class A: three exact copies of fp 0b0000
        (1, 0b0000), (5, 0b0000), (9, 0b0000),
        # class B: fp 0b0001 (hamming 1 from A -> bridged)
        (2, 0b0001), (7, 0b0001),
        # class C: far fingerprint, two copies (own component)
        (3, 0b11110000), (8, 0b11110000),
        # isolated: unique fp, no near neighbor
        (4, 0b01100110),
    ]
    fps = spark.createDataFrame(rows, "doc_id long, dhash long")

    got = {
        (r["doc_id"], r["component_id"])
        for r in fingerprint_dup_groups(
            fps, max_hamming=1, num_bits=8
        ).collect()
    }

    # reference: components over the FULL per-doc near-pair set
    full_pairs = simhash_near_pairs(
        fps.withColumnRenamed("dhash", "simhash"), max_hamming=1, num_bits=8
    )
    expected = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(full_pairs).collect()
    }
    assert got == expected
    assert got == {
        (1, 1), (5, 1), (9, 1), (2, 1), (7, 1),  # A+B bridged, min=1
        (3, 3), (8, 3),                          # C
    }  # doc 4 isolated -> absent


def test_lsh_bands_must_divide_num_hashes(spark):
    import pytest

    from icenetetl_spark.operators.dedup import lsh_candidate_pairs

    sigs = spark.createDataFrame([(1, 0, 0)], "doc_id long, mh0 long, mh1 long")
    with pytest.raises(ValueError, match="divisible"):
        lsh_candidate_pairs(sigs, num_hashes=10, bands=4)


def test_repetition_signals(spark):
    from icenetetl_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam eggs"),          # 4/5 repetition
            (2, "all tokens here are distinct ok"),   # 1/6
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert got[1]["top_token_n"] == 4
    assert got[1]["n_tokens"] == 5
    assert abs(got[1]["top_token_fraction"] - 0.8) < 1e-12
    assert got[2]["top_token_n"] == 1
    assert abs(got[2]["top_token_fraction"] - 1 / 6) < 1e-12


def test_contamination_flags_overlap_and_keeps_clean_docs(spark):
    from icenetetl_spark.operators.text import contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # shares the 3-gram "quick brown fox" (and "the quick brown")
            (1, "once the quick brown fox ran"),
            # no 3-gram overlap with the benchmark
            (2, "entirely unrelated training content here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in contamination(train, bench, n=3).collect()}
    # doc 1: 4 shingles, of which "the quick brown" + "quick brown fox" +
    # "brown fox ran"? only first two occur in benchmark (bench has
    # "brown fox jumps", not "brown fox ran")
    assert got[1]["n_contaminated"] == 2
    assert got[1]["contamination_ratio"] > 0
    # clean doc still present, zero hits
    assert got[2]["n_contaminated"] == 0
    assert got[2]["contamination_ratio"] == 0.0


def test_split_passages_paragraph_mode(spark):
    """Blank-line paragraph splitting (not exercised by the driver gate —
    the testdata is single-line): indices are per-doc positions, blank
    paragraphs are dropped, multi-blank runs collapse."""
    from icenetetl_spark.operators.dedup import split_passages

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\n\ngamma delta\n\n\n\nepsilon"),
            (2, "single paragraph only"),
            (3, "   \n\n  "),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["para_idx"]): r["passage"]
        for r in split_passages(docs, mode="paragraph").collect()
    }
    assert got[(1, 0)] == "alpha beta"
    assert got[(1, 1)] == "gamma delta"
    assert got[(1, 2)] == "epsilon"
    assert got[(2, 0)] == "single paragraph only"
    assert all(d != 3 for d, _ in got)


def test_passage_dup_stats_window_mode(spark):
    """Two docs sharing one 3-word window, one doc unique: the shared
    window marks exactly one passage per sharer as duplicated."""
    from icenetetl_spark.operators.dedup import passage_dup_stats, split_passages

    docs = spark.createDataFrame(
        [
            (1, "common boiler plate unique tail one"),
            (2, "common boiler plate other ending two"),
            (3, "totally different words here now yes"),
        ],
        "doc_id long, text string",
    )
    stats = {
        r["doc_id"]: r
        for r in passage_dup_stats(
            split_passages(docs, mode="window", window=3)
        ).collect()
    }
    assert stats[1]["n_passages"] == 2 and stats[1]["n_dup_passages"] == 1
    assert stats[2]["n_passages"] == 2 and stats[2]["n_dup_passages"] == 1
    assert stats[3]["n_dup_passages"] == 0
    assert abs(stats[1]["dup_frac"] - 0.5) < 1e-12


def test_redact_pii_and_counts(spark):
    from icenetetl_spark.operators.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@sub.example.org today"),
            (2, "server 10.0.255.3 answered, call 25-989-741-2988 now"),
            (3, "no pii here at all"),
            (4, "a@b.co and 1.2.3.4 and 12-345-678-9012"),
        ],
        "id int, t string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_pii(F.col("t")).alias("red"),
            *[c.alias(f"n_{k}") for k, c in pii_counts(F.col("t")).items()],
        ).collect()
    }
    assert out[1]["red"] == "mail me at <EMAIL> today"
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 0
    assert out[2]["red"] == "server <IP> answered, call <PHONE> now"
    assert out[3]["red"] == "no pii here at all"
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 0)
    assert out[4]["red"] == "<EMAIL> and <IP> and <PHONE>"


def test_token_chunks_cover_and_overlap(spark):
    import pytest as _pytest

    from icenetetl_spark.operators.text import token_chunks, tokens

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words), (2, "a b c"), (3, "")], "id int, t string")
    w = df.select("id", tokens(F.col("t")).alias("w"))
    starts, chunk = token_chunks(F.col("w"), 32, 24)
    rows = (
        w.select("id", "w", F.posexplode(starts).alias("idx", "start"))
        .select("id", "idx", "start", chunk(F.col("start")).alias("c"))
        .collect()
    )
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    # 100 tokens, stride 24: starts 1,25,49,73 (73+31 >= 100 covers the
    # tail, so no extra window is emitted), overlap 8
    c1 = sorted(by_id[1], key=lambda r: r["idx"])
    assert [r["start"] for r in c1] == [1, 25, 49, 73]
    covered = [t for r in c1 for t in r["c"]]
    assert set(covered) == {f"w{i}" for i in range(100)}
    assert c1[0]["c"][-8:] == c1[1]["c"][:8]  # overlap region agrees
    assert len(c1[-1]["c"]) == 28  # clamped tail slice
    # short docs produce exactly one chunk; empty text normalizes to [""]
    assert len(by_id[2]) == 1 and by_id[2][0]["c"] == ["a", "b", "c"]
    assert len(by_id[3]) == 1
    with _pytest.raises(ValueError):
        token_chunks(F.col("w"), 8, 9)


def test_cdc_segments_survive_prefix_insertion(spark):
    """The CDC selling point: prepending text shifts every fixed-window
    chunk but leaves most content-defined segments identical, so segment
    fingerprints still collide between the original and edited doc."""
    from icenetetl_spark.operators.dedup import cdc_segments, split_passages

    base = " ".join(f"tok{i * 7 % 97}x{i}" for i in range(120))
    edited = "inserted preamble goes here " + base
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )

    def shared(passages_df):
        rows = passages_df.collect()
        a = {r["passage"] for r in rows if r["doc_id"] == 1}
        b = {r["passage"] for r in rows if r["doc_id"] == 2}
        return len(a & b), len(a)

    cdc_shared, cdc_total = shared(cdc_segments(docs, divisor=8))
    win_shared, _ = shared(split_passages(docs, mode="window", window=8))
    # fixed windows lose (almost) everything to the alignment shift;
    # CDC keeps the majority of segments bit-identical
    assert cdc_shared / cdc_total > 0.5, (cdc_shared, cdc_total)
    assert cdc_shared > win_shared
    # determinism: same input -> same segmentation
    again, _ = shared(cdc_segments(docs, divisor=8))
    assert again == cdc_shared


def test_resize_images_nearest_neighbor_mapping(spark):
    """NN resize picks source pixel (r*h//H, c*w//W) — checked against a
    hand-built raster, and upscale (out larger than src) must replicate."""
    import numpy as np

    from icenetetl_spark.operators.multimodal import resize_images
    from icenetetl_spark.sources.images import write_png

    px = np.arange(12, dtype=np.uint8).reshape(3, 4) * 10  # 4x3 gradient
    df = spark.createDataFrame(
        [(1, bytearray(write_png(px)))], "doc_id long, payload binary"
    )
    out = resize_images(df, out_w=2, out_h=2).first()
    # rows 0,1 of 3; cols 0,2 of 4 -> values 0,20,40,60
    assert out["pixel_sum"] == 0 + 20 + 40 + 60
    assert (out["src_width"], out["src_height"]) == (4, 3)
    up = resize_images(df, out_w=8, out_h=3).first()
    # each src col sampled twice per row -> exactly 2x the row sums
    assert up["pixel_sum"] == 2 * int(px.sum())


def test_audio_features_known_signal(spark):
    import numpy as np

    from icenetetl_spark.operators.multimodal import audio_features
    from icenetetl_spark.sources.audio import write_wav

    s = np.array([100, -5, 3, 3, -7, 0, -2], dtype=np.int16)  # 3 strict crossings
    df = spark.createDataFrame(
        [(1, bytearray(write_wav(s, 8000)))], "doc_id long, payload binary"
    )
    row = audio_features(df).first()
    assert row["n_samples"] == 7
    assert row["zero_crossings"] == 3  # 100/-5, -5/3, 3/-7 (0 never crosses)
    assert row["peak"] == 100


def test_compression_signals_match_stdlib_exactly(spark):
    import zlib

    from icenetetl_spark.operators.text import compression_signals
    from icenetetl_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["compression_ratio"])
        for r in compression_signals(docs).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        raw = r["text"].encode("utf-8")
        c = len(zlib.compress(raw, 6))
        assert got[r["doc_id"]] == (len(raw), c, len(raw) / c)
    # the synthetic corpus is word-repetitive: TYPICAL docs compress well
    # (tiny docs can dip below 1 — zlib header overhead), and the signal
    # must vary across documents
    ratios = sorted(v[2] for v in got.values())
    assert ratios[len(ratios) // 2] > 1.5 and len(set(ratios)) > 10


def test_simhash_topn_precap_is_lossless(spark):
    """The per-bucket pre-cap inside simhash_topn_pairs must be invisible:
    the result equals ranking the FULL near-pair set per doc_a and keeping
    the top N — on an adversarial fingerprint set with heavy exact-dup
    mass (where per-bucket candidate lists far exceed N)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from icenetetl_spark.operators.dedup import simhash_topn_pairs

    # 40 docs over only 6 distinct 16-bit fingerprints, several within
    # 1-3 bits of each other -> dense buckets, rank ties everywhere
    fps = [0b0, 0b1, 0b11, 0b10011, 0b1111111100000000, 0b1111111100000011]
    rows = [(i, fps[i % len(fps)]) for i in range(40)]
    sim = spark.createDataFrame(rows, "doc_id long, simhash long")

    got = simhash_topn_pairs(sim, max_hamming=3, num_bits=16, per_doc=4)

    full = simhash_near_pairs(sim, max_hamming=3, num_bits=16)
    w = Window.partitionBy("doc_a").orderBy("hamming", "doc_b")
    want = (
        full.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 4)
    )
    key = lambda r: (r["doc_a"], r["doc_b"], r["hamming"], r["rank"])
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    # and the shortlist really is bounded
    per = got.groupBy("doc_a").count().agg(F.max("count")).first()[0]
    assert per <= 4


def test_simhash_topn_strategies_identical(spark):
    """The Hamming-ball enumeration strategy and the pigeonhole segment
    join must produce byte-identical shortlists — enumeration is the auto
    default at 16 bits (697 masks), the segment join remains the wide-
    fingerprint path, and the oracle mirrors the plain definition for
    both. Fingerprint set includes exact-dup mass (hamming-0 pairs, mask
    0) and rank ties — plus OUT-OF-RANGE fingerprints with set bits at or
    above num_bits (round-9 advice): the segment strategy's hamming is a
    full 64-bit popcount, so the enumeration path must re-check the full
    width too ((1<<20)|1 vs (1<<20)|2 is a true hamming-2 pair reachable
    only through the low-bit mask join; (1<<21) vs 0 differs ONLY in a
    high bit and both strategies must agree on it)."""
    from icenetetl_spark.operators.dedup import simhash_topn_pairs

    fps = [
        0b0, 0b1, 0b11, 0b10011, 0b1111111100000000, 0b1111111100000011,
        (1 << 20) | 0b1, (1 << 20) | 0b10, (1 << 21),
    ]
    rows = [(i, fps[i % len(fps)]) for i in range(40)]
    sim = spark.createDataFrame(rows, "doc_id long, simhash long")

    key = lambda r: (r["doc_a"], r["doc_b"], r["hamming"], r["rank"])
    for symmetric in (False, True):
        enum = simhash_topn_pairs(
            sim, max_hamming=3, num_bits=16, per_doc=4,
            symmetric=symmetric, strategy="enumerate",
        )
        seg = simhash_topn_pairs(
            sim, max_hamming=3, num_bits=16, per_doc=4,
            symmetric=symmetric, strategy="segment",
        )
        assert sorted(map(key, enum.collect())) == sorted(
            map(key, seg.collect())
        )


def test_fingerprint_topn_quotient_semantics(spark):
    """fingerprint_topn_pairs == (distinct fp -> min-doc rep + count) ->
    symmetric per-rep top-N by (hamming, rep_b) — checked against a naive
    driver-side model on a dense multi-dup fingerprint set."""
    from itertools import combinations

    from icenetetl_spark.operators.dedup import fingerprint_topn_pairs

    fps = [0b0, 0b1, 0b11, 0b10011, 0b1111111100000000, 0b1111111100000011]
    rows = [(i, fps[i % len(fps)]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, fp long")
    got = sorted(
        (r["rep_a"], r["n_members_a"], r["rep_b"], r["hamming"], r["rank"])
        for r in fingerprint_topn_pairs(
            df, max_hamming=3, num_bits=16, per_fp=2, fp_col="fp"
        ).collect()
    )

    # driver-side model
    reps = {}
    for i, f in rows:
        if f not in reps or i < reps[f][0]:
            reps[f] = (min(i, reps.get(f, (i,))[0]),)
    rep_of = {f: min(i for i, g in rows if g == f) for f in set(fps)}
    n_of = {f: sum(1 for _, g in rows if g == f) for f in set(fps)}
    cand = {}
    for fa, fb in combinations(set(fps), 2):
        h = bin(fa ^ fb).count("1")
        if h <= 3:
            cand.setdefault(rep_of[fa], []).append((h, rep_of[fb]))
            cand.setdefault(rep_of[fb], []).append((h, rep_of[fa]))
    want = []
    for ra, lst in cand.items():
        fa = next(f for f, r in rep_of.items() if r == ra)
        for rank, (h, rb) in enumerate(sorted(lst)[:2], start=1):
            want.append((ra, n_of[fa], rb, h, rank))
    assert got == sorted(want)


def test_connected_components_star_form_convergence_check(spark):
    """r13: the per-round convergence test inspects the NEW edge set alone
    (star-form <=> round fixpoint) instead of diffing against the previous
    round. Pin the three violation classes and the zero-round fast path."""
    from icenetetl_spark.operators.dedup import (
        _large_star,
        _small_star,
        connected_components,
    )

    def star_violation(rows):
        # mirror of the operator-internal check, driver-side
        his = [h for h, _ in rows]
        los = {l for _, l in rows}
        return (len(his) != len(set(his))) or bool(los & set(his))

    # a disjoint star forest: no violation, and CC must return it as-is
    star_pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (10, 11)], "doc_a long, doc_b long"
    )
    assert not star_violation([(2, 1), (3, 1), (11, 10)])
    out = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(star_pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    # violation class 1: one hi holding two edges (3 -> {1, 2}) is NOT a
    # fixpoint — one more round must rewrite it; CC labels stay correct
    assert star_violation([(3, 1), (3, 2)])
    multi_lo = spark.createDataFrame(
        [(1, 3), (2, 3)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(multi_lo).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}

    # violation class 2: a lo that reappears as a hi (chain) — and the
    # star rounds applied to a star forest are the identity, which is
    # what makes the check a valid stopping rule
    assert star_violation([(2, 1), (3, 2)])
    star_edges = spark.createDataFrame(
        [(2, 1), (3, 1), (11, 10)], "hi long, lo long"
    )
    after = {
        (r["hi"], r["lo"])
        for r in _small_star(_large_star(star_edges)).collect()
    }
    assert after == {(2, 1), (3, 1), (11, 10)}
