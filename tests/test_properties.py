"""Property-based tests (hypothesis) for the upsert discipline — the
reference's core invariants expressed as laws over arbitrary inputs:

- append_missing is idempotent (ON CONFLICT DO NOTHING replay safety)
- upsert agrees with last-writer-wins dict semantics
- exact dedup canonical ids are minimal members of their groups
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from icenetetl_spark.operators.relational import insert_missing, upsert

keys = st.integers(min_value=0, max_value=20)
vals = st.text(alphabet="abcxyz", min_size=0, max_size=4)
kv_lists = st.lists(st.tuples(keys, vals), min_size=0, max_size=15)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, "")], "k long, v string").limit(
        len(rows)
    )


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(existing=kv_lists, incoming=kv_lists)
def test_insert_missing_never_touches_existing_keys(spark, existing, incoming):
    e, i = _df(spark, existing), _df(spark, incoming)
    out = insert_missing(i, e, ["k"]).collect()
    ek = {k for k, _ in existing}
    assert all(r["k"] not in ek for r in out)
    # and replaying the merged state inserts nothing
    merged = e.unionByName(i.join(e.select("k"), ["k"], "left_anti"))
    assert insert_missing(i, merged, ["k"]).count() == 0


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(existing=kv_lists, incoming=kv_lists)
def test_upsert_is_last_writer_wins(spark, existing, incoming):
    # model: dict(existing) updated by dict(incoming); for duplicate keys
    # within one side the model keeps ONE of them — mirror by deduping inputs
    ex = {k: v for k, v in existing}
    inc = {k: v for k, v in incoming}
    e = _df(spark, list(ex.items()))
    i = _df(spark, list(inc.items()))
    got = {r["k"]: r["v"] for r in upsert(i, e, ["k"]).collect()}
    assert got == {**ex, **inc}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=kv_lists)
def test_exact_dedup_partitions_input(spark, rows):
    """Exact dedup laws: every group's canonical id is its minimal member,
    and group sizes sum to the input size."""
    from icenetetl_spark.operators.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(i, v) for i, (_, v) in enumerate(rows)] or [(0, "")],
        "doc_id long, text string",
    ).limit(len(rows))
    out = exact_duplicates(docs).collect()
    assert sum(r["n_copies"] for r in out) == len(rows)
    # canonical is the min doc_id of each normalized-text group
    import re

    groups = {}
    for i, (_, v) in enumerate(rows):
        key = re.sub(r"\s+", " ", v.lower()).strip()
        groups.setdefault(key, []).append(i)
    want = {min(ids): len(ids) for ids in groups.values()}
    got = {r["canonical_id"]: r["n_copies"] for r in out}
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=kv_lists)
def test_latest_snapshot_law(spark, rows):
    """latest_snapshot returns exactly the rows holding the global max."""
    from icenetetl_spark.operators.relational import latest_snapshot

    df = spark.createDataFrame(rows or [(0, "")], "k long, v string").limit(
        len(rows)
    )
    out = latest_snapshot(df, "k").collect()
    if not rows:
        assert out == []
    else:
        mx = max(k for k, _ in rows)
        assert sorted((r["k"], r["v"]) for r in out) == sorted(
            (k, v) for k, v in rows if k == mx
        )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    obs=st.dictionaries(
        st.tuples(st.sampled_from("ab"), st.integers(0, 8)),
        st.integers(-5, 5),
        min_size=1,
        max_size=12,
    )
)
def test_gapfill_locf_laws(spark, obs):
    """LOCF laws vs a pure-Python model: per key the output buckets are
    exactly the dense [min..max] lattice, observed rows keep their value
    un-flagged, and every gap row carries the latest preceding value."""
    from icenetetl_spark.operators.temporal import gapfill_locf

    rows = [(k, b * 10, float(v)) for (k, b), v in obs.items()]
    df = spark.createDataFrame(rows, "k string, b long, v double")
    got = {
        (r["k"], r["b"]): (r["v"], r["is_gap"])
        for r in gapfill_locf(df, ["k"], "b", "v", 10).collect()
    }
    model = {}
    per_key = {}
    for k, b, v in rows:
        per_key.setdefault(k, {})[b] = v
    for k, seen in per_key.items():
        lo, hi = min(seen), max(seen)
        last = None
        for b in range(lo, hi + 1, 10):
            if b in seen:
                last = seen[b]
                model[(k, b)] = (last, False)
            else:
                model[(k, b)] = (last, True)
    assert got == model


# --- two-phase sessionization vs a pure-Python model ---------------------

ev_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # user_id
        st.integers(min_value=0, max_value=500_000),    # epoch seconds
    ),
    min_size=0,
    max_size=30,
)


def _model_sessions(rows, gap_s):
    """Independent reference: per user, chain time-sorted events whose
    gap <= gap_s; emit (user, 1-based session rank, n, duration)."""
    out = []
    by_user = {}
    for eid, (u, ep) in enumerate(rows):
        by_user.setdefault(u, []).append((ep, eid))
    for u, evs in by_user.items():
        evs.sort()
        sid, n, start, prev = 0, 0, None, None
        for ep, _ in evs:
            if prev is None or ep - prev > gap_s:
                if sid:
                    out.append((u, sid, n, prev - start))
                sid, n, start = sid + 1, 0, ep
            n += 1
            prev = ep
        if sid:
            out.append((u, sid, n, prev - start))
    return sorted(out)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=ev_rows, bucket_s=st.sampled_from([7, 1800, 86400]))
def test_sessionize_two_phase_matches_model(spark, rows, bucket_s):
    from pyspark.sql import functions as F

    from icenetetl_spark.operators.temporal import sessionize_two_phase

    if not rows:
        return
    df = spark.createDataFrame(
        [(u, eid, float(ep)) for eid, (u, ep) in enumerate(rows)],
        "user_id long, event_id long, ep double",
    ).select(
        "user_id", "event_id", F.col("ep").cast("timestamp").alias("ts")
    )
    got = sorted(
        (r["user_id"], r["session_idx"], r["n_events"], r["duration_s"])
        for r in sessionize_two_phase(df, gap_s=1800, bucket_s=bucket_s)
        .collect()
    )
    assert got == _model_sessions(rows, 1800)


_bloom_keys = st.lists(
    st.one_of(st.integers(min_value=-(2**62), max_value=2**62), st.none()),
    min_size=0,
    max_size=25,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(probe_keys=_bloom_keys, build_keys=_bloom_keys)
def test_bloom_semi_join_law(spark, probe_keys, build_keys):
    """bloom_semi_join == plain left-semi join, for ARBITRARY key sets
    including negatives and NULLs (NULL never equi-joins; bloom false
    positives must be removed by the exact join; false negatives must
    never exist). Exercises the smallest legal bitmap so word boundaries
    and saturation are both hit."""
    from icenetetl_spark.operators.scale import bloom_semi_join

    probe = spark.createDataFrame(
        [(k,) for k in probe_keys] or [(None,)], "k long"
    ).limit(len(probe_keys))
    build = spark.createDataFrame(
        [(k,) for k in build_keys] or [(None,)], "k long"
    ).limit(len(build_keys))
    expect = sorted(
        r["k"] for r in probe.join(build, "k", "left_semi").collect()
    )
    got = sorted(
        r["k"]
        for r in bloom_semi_join(probe, build, "k", m_bits=64).collect()
    )
    assert got == expect
