"""asof_join edge cases: inclusive equal-time match, no-prior-row null,
key isolation, multiple value columns."""

from __future__ import annotations

from datetime import datetime

from icenetetl_spark.operators.temporal import asof_join


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(5)),   # after right@3 -> 30.0
            (2, 10, _ts(3)),   # exactly at right@3 -> inclusive -> 30.0
            (3, 10, _ts(1)),   # before any right -> NULL
            (4, 20, _ts(9)),   # other key -> right(20)@2 -> 99.0
            (5, 30, _ts(9)),   # key with no right rows at all -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts(2), 20.0, "a"),
            (10, _ts(3), 30.0, "b"),
            (20, _ts(2), 99.0, "c"),
        ],
        "user_id long, ts timestamp, value double, tag string",
    )
    out = {
        r["event_id"]: (r["value_asof"], r["tag_asof"])
        for r in asof_join(
            left, right, "ts", ["user_id"], ["value", "tag"]
        ).collect()
    }
    assert out == {
        1: (30.0, "b"),
        2: (30.0, "b"),
        3: (None, None),
        4: (99.0, "c"),
        5: (None, None),
    }


def test_asof_join_preserves_left_rows(spark):
    left = spark.createDataFrame(
        [(i, 1, _ts(i % 50)) for i in range(200)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(25), 1.0)], "user_id long, ts timestamp, value double"
    )
    out = asof_join(left, right, "ts", ["user_id"], ["value"])
    assert out.count() == 200
    matched = out.filter("value_asof IS NOT NULL").count()
    assert matched == sum(1 for i in range(200) if i % 50 >= 25)


def test_range_join_bins_match_theta(spark):
    """Binned range join == naive theta join on random intervals."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from icenetetl_spark.operators.temporal import range_join_points_to_intervals

    base = datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, base + timedelta(seconds=37 * i)) for i in range(300)],
        "event_id long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (100 + j, base + timedelta(seconds=900 * j), base + timedelta(seconds=900 * j + 777))
            for j in range(12)
        ],
        "iv_id long, s timestamp, e timestamp",
    )
    theta = pts.join(ivs, (F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e")))
    want = sorted((r["event_id"], r["iv_id"]) for r in theta.collect())
    assert len(want) > 0
    # every strategy — fixed bins, measured (auto) bins, broadcast — is
    # exactly the theta join
    for kw in (
        {"bin_seconds": 250},
        {"bin_seconds": "auto"},
        {"strategy": "broadcast"},
    ):
        out = range_join_points_to_intervals(pts, ivs, "ts", "s", "e", **kw)
        got = sorted((r["event_id"], r["iv_id"]) for r in out.collect())
        assert got == want, kw


def test_gapfill_locf_fills_and_flags(spark):
    from icenetetl_spark.operators.temporal import gapfill_locf

    df = spark.createDataFrame(
        [
            ("a", 0, 1.0),
            ("a", 30, 4.0),   # gaps at 10, 20
            ("b", 10, 7.0),   # single bucket, no gaps
        ],
        "k string, b long, v double",
    )
    got = {
        (r["k"], r["b"]): (r["v"], r["is_gap"])
        for r in gapfill_locf(df, ["k"], "b", "v", 10).collect()
    }
    assert got == {
        ("a", 0): (1.0, False),
        ("a", 10): (1.0, True),
        ("a", 20): (1.0, True),
        ("a", 30): (4.0, False),
        ("b", 10): (7.0, False),
    }


def test_gapfill_locf_rejects_off_lattice_buckets(spark):
    import pytest

    from icenetetl_spark.operators.temporal import gapfill_locf

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 15, 9.0), ("a", 30, 4.0)],
        "k string, b long, v double",
    )
    # bucket 15 is off the step-10 lattice: the grid join would silently
    # drop the 9.0 observation — the guard must refuse instead
    with pytest.raises(ValueError, match="lattice"):
        gapfill_locf(df, ["k"], "b", "v", 10).collect()


def test_gapfill_interpolate_linear_values(spark):
    from icenetetl_spark.operators.temporal import gapfill_interpolate

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 30, 4.0)],
        "k string, b long, v double",
    )
    got = {
        r["b"]: (r["v"], r["is_gap"])
        for r in gapfill_interpolate(df, ["k"], "b", "v", 10).collect()
    }
    assert got == {
        0: (1.0, False),
        10: (2.0, True),   # 1 + (4-1) * 10/30
        20: (3.0, True),
        30: (4.0, False),
    }


def test_sessionize_two_phase_equals_window_plan(spark):
    """Frame equality vs the single-window gaps-and-islands, including a
    session that spans bucket boundaries (and with a bucket width SMALLER
    than the gap, the adversarial setting: correctness must not depend on
    bucket_s >= gap_s)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from icenetetl_spark.operators.temporal import sessionize_two_phase

    rows = []
    eid = 0
    # user 1: a long session straddling many 60s buckets (gaps of 40s),
    # then a >gap silence, then a burst inside one bucket
    t = 1_000_000
    for _ in range(20):
        rows.append((1, eid, t)); eid += 1; t += 40
    t += 5_000
    for _ in range(5):
        rows.append((1, eid, t)); eid += 1; t += 1
    # user 2: every event its own session (gap 10_000 > 1800)
    t = 2_000_000
    for _ in range(4):
        rows.append((2, eid, t)); eid += 1; t += 10_000
    # user 3: boundary pair — last event of one bucket and first of the
    # next exactly gap_s apart (merge is > gap, so these DO merge)
    rows.append((3, eid, 3_000_000)); eid += 1
    rows.append((3, eid, 3_000_000 + 1800)); eid += 1
    rows.append((3, eid, 3_000_000 + 1800 + 1801)); eid += 1  # new session

    df = spark.createDataFrame(
        [(u, e, float(ts)) for u, e, ts in rows],
        "user_id long, event_id long, ep double",
    ).select(
        "user_id", "event_id", F.col("ep").cast("timestamp").alias("ts")
    )

    def window_plan(ev, gap_s):
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ep = F.unix_timestamp(F.col("ts").cast("timestamp"))
        prev = F.lag(ep).over(w)
        new_s = F.when(prev.isNull() | ((ep - prev) > gap_s), 1).otherwise(0)
        sid = F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            ev.select("user_id", sid.alias("session_idx"), ep.alias("ep"))
            .groupBy("user_id", "session_idx")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (F.max("ep") - F.min("ep")).cast("long").alias("duration_s"),
            )
            .withColumn("session_idx", F.col("session_idx").cast("long"))
            .withColumn("n_events", F.col("n_events").cast("long"))
        )

    expected = sorted(
        tuple(r) for r in window_plan(df, 1800).collect()
    )
    for bucket_s in (60, 1800, 86400):  # narrower, equal, wider than gap
        got = sorted(
            tuple(r)
            for r in sessionize_two_phase(
                df, gap_s=1800, bucket_s=bucket_s
            ).collect()
        )
        assert got == expected, f"bucket_s={bucket_s}"
    # sanity on the constructed shape
    by_user = {}
    for u, sid, n, d in expected:
        by_user.setdefault(u, []).append((sid, n, d))
    assert sorted(by_user[1]) == [(1, 20, 760), (2, 5, 4)]
    assert len(by_user[2]) == 4
    assert sorted(by_user[3]) == [(1, 2, 1800), (2, 1, 0)]
