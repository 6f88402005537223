"""Event-stream analytics over the ``events`` table — the batch twins of the
streaming vocabulary (SURVEY.md §2.8): tumbling windows, JSON extraction,
sessionization. The streaming shell (icenetetl_spark.streaming) runs the same
logical plans under readStream/foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from icenetetl_spark.functions.portable import epoch_bucket, fsum_col
from icenetetl_spark.sources.testdata import load_table


def ev_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window count/sum per event type.

    Batch twin of ``groupBy(F.window('ts', '5 minutes'), 'event_type')``;
    bucket emitted as epoch seconds so the oracle compares timezone-free.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            epoch_bucket("ts", 300, "bucket_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fsum_col("value", 6).alias("sum_value"),
        )
    )


def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + rollup (extension surface — the reference has
    no JSON, SURVEY.md §2.7)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-minute silence starts a new session.

    DEFAULT PLAN (since round 9): operators/temporal.sessionize_two_phase —
    phase 1 sessionizes within (user, day-bucket) slices, phase 2 stitches
    local sessions per user, so a hot user costs ~#sessions rather than
    #events in the stitch task. The skew table (SCALING.md) measured the
    single-window form at 6.2x under a 100x hot user while the two-phase
    form held 1.7x with pinned-identical output (equality for any bucket
    width proven in the operator docstring and pinned in
    tests/test_temporal.py), so the skew-safe plan is the gated default
    (round-8 verdict #6). The lag/running-sum window form remains as the
    diagnostic/oracle twin ev_sessionize_window below. Streaming twin:
    streaming/stateful.sessionize_stream (constant-size per-user state,
    pinned equal to this plan in tests/test_stateful.py).
    """
    from icenetetl_spark.operators.scale import spread
    from icenetetl_spark.operators.temporal import sessionize_two_phase

    # r13: spread the row-group-bound scan so the phase-1 epoch/bucket
    # projection and sort feed from cluster-width partitions (A/B 0.54x;
    # no-op at scale — operators/scale.spread). Values are partitioning-
    # independent: both phases are keyed windows (operator docstring).
    ev = spread(load_table(spark, sf_dir, "events"), "user_id")
    return sessionize_two_phase(
        ev, "user_id", "ts", "event_id", gap_s=1800, bucket_s=86400
    )


def ev_sessionize_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnostic twin of ev_sessionize: the classic single-window
    gaps-and-islands plan (lag() over (user, time) -> boundary flag ->
    running SUM = session index). Distributes by user_id, but a hot user's
    whole history serializes into one window task — which is why the
    two-phase plan is the gated default; this form stays as the readable
    reference implementation and shares the same oracle verbatim.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag(F.unix_timestamp(F.col("ts").cast("timestamp"))).over(w)
    gap = F.unix_timestamp(F.col("ts").cast("timestamp")) - prev_ts
    new_sess = F.when(prev_ts.isNull() | (gap > 1800), 1).otherwise(0)
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_sess = ev.select(
        "user_id", "event_id", "ts", sess_id.alias("session_idx")
    )
    return (
        with_sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.unix_timestamp(F.col("ts").cast("timestamp")))
             - F.min(F.unix_timestamp(F.col("ts").cast("timestamp"))))
            .cast("long")
            .alias("duration_s"),
        )
        .withColumn("session_idx", F.col("session_idx").cast("long"))
    )


def ev_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE session windows (F.session_window) — the operator the
    streaming engine uses for sessionization state (merging windows,
    watermark-evictable), here exercised in batch mode. Complements the
    hand-rolled lag/running-sum form (ev_sessionize): same sessions,
    different machinery. Session end = last event + gap; a new session
    starts when the inter-event gap is >= the 30-minute timeout. Bounds
    emitted as epoch seconds so the oracle compares timezone-free."""
    ev = load_table(spark, sf_dir, "events")
    w = F.session_window(F.col("ts"), "30 minutes")
    return (
        ev.groupBy(w.alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fsum_col("value", 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.floor(F.unix_timestamp(F.col("w.start"))).alias("session_start"),
            F.floor(F.unix_timestamp(F.col("w.end"))).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def ev_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k heavy hitters by event volume."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), fsum_col("value", 6).alias("sum_value"))
        .orderBy(F.col("n_events").desc(), F.col("user_id"))
        .limit(20)
    )


def ev_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each click gets the value of the user's most
    recent purchase at-or-before it (operators/temporal.asof_join — the
    union+carry-forward composition; DuckDB verifies with its native
    ASOF JOIN)."""
    from icenetetl_spark.operators.temporal import asof_join
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # dedup purchases to one row per (user, ts): keep max event_id
    wp = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts", "value")
    )
    out = asof_join(clicks, purchases, "ts", ["user_id"], ["value"])
    return out.select(
        "event_id",
        "user_id",
        F.col("value_asof").alias("last_purchase_value"),
    )


def ev_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless point-in-interval join: which error events fall inside the
    activity windows of the 5 highest-volume users ("what was happening
    during the incident window"). The intervals side is <= 5 rows BY
    CONSTRUCTION (a limit-5 aggregate), so this takes the broadcast range
    strategy: zero shuffles on the probe side, parallelism = scan
    parallelism. The bins plan (the right one for LARGE interval sets)
    degraded here exactly because few long windows cap the bin-key
    cardinality — at 10x density the __bin shuffle went hot-reducer
    (measured 4.58x wall at 10x; broadcast holds ~linear).
    """
    from icenetetl_spark.operators.temporal import range_join_points_to_intervals

    ev = load_table(spark, sf_dir, "events")
    top5 = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("user_id"))
        .limit(5)
        .select("user_id")
    )
    windows = (
        ev.join(F.broadcast(top5), "user_id")
        .groupBy(F.col("user_id").alias("window_user"))
        .agg(F.min("ts").alias("w_start"), F.max("ts").alias("w_end"))
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    out = range_join_points_to_intervals(
        errors, windows, "ts", "w_start", "w_end", strategy="broadcast"
    )
    return out.select("event_id", "user_id", "window_user")


def ev_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascading continuous aggregate: minute partials ->
    hour partials -> day level, each coarser tier computed FROM the finer
    tier's partial aggregates (sum-of-sums / sum-of-counts), never from raw
    rows. The oracle aggregates raw->day directly: hash-equality proves the
    cascade is exact (BIGINT fixed-point addition is associative). At 100 TB this is
    the incremental-maintenance layout: each tier updates from the tier
    below touched by the batch, and day-level queries never scan raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    minute = (
        ev.groupBy(
            epoch_bucket("ts", 60, "b_minute"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(
                    F.col("value").cast("double") * F.lit(1e6) + F.lit(0.5)
                ).cast("long")
            ).alias("s"),
        )
    )
    hour = (
        minute.groupBy(
            (F.floor(F.col("b_minute") / 3600) * 3600).cast("long").alias("b_hour"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
        )
    )
    day = (
        hour.groupBy(
            (F.floor(F.col("b_hour") / 86400) * 86400).cast("long").alias("bucket_day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("s").cast("double") / F.lit(1e6)).alias("sum_value"),
        )
    )
    return day


def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user reaches
    step i+1 only with an event STRICTLY AFTER their earliest completion of
    step i (the standard product-analytics funnel). Three per-user min
    aggregations chained by semi-join-shaped inner joins — every stage is an
    equi-shuffle on user_id, so the funnel distributes; no window over all
    events, no per-user collect."""
    ev = load_table(spark, sf_dir, "events")

    def first_after(prev: DataFrame, etype: str, out: str) -> DataFrame:
        step = ev.filter(F.col("event_type") == etype).select("user_id", "ts")
        return (
            step.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev.columns[1]))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    u1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    u2 = first_after(u1, "click", "t2")
    u3 = first_after(u2, "purchase", "t3")
    rows = [
        u1.agg(F.lit("1_view").alias("step"), F.count(F.lit(1)).alias("n_users")),
        u2.agg(F.lit("2_click").alias("step"), F.count(F.lit(1)).alias("n_users")),
        u3.agg(
            F.lit("3_purchase").alias("step"), F.count(F.lit(1)).alias("n_users")
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day; n_active =
    distinct users of each cohort active exactly ``day_offset`` days later
    (the standard product-analytics retention triangle).

    Plan: one per-user min aggregation (cohort assignment), one distinct
    over (user, day), one equi-join on user_id, one final rollup — every
    stage a hash shuffle on user_id or (cohort, offset); the cohort table is
    |users|-sized, so at 100 TB of events it still broadcasts or co-shuffles
    cheaply. No window over the event stream."""
    ev = load_table(spark, sf_dir, "events")
    firsts = (
        ev.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_date"))
    )
    activity = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_date",
            F.datediff(F.col("day"), F.col("cohort_date")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def ev_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """time_bucket_gapfill + locf: 15-minute per-type value sums with every
    missing bucket emitted and carry-forward filled (operators/temporal.
    gapfill_locf). The dense grid is generated per key from its own bounds
    via sequence+explode — no calendar cross join."""
    from icenetetl_spark.operators.temporal import gapfill_locf

    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", epoch_bucket("ts", 900, "bucket_qh")
    ).agg(fsum_col("value", 6).alias("sum_value"))
    return gapfill_locf(
        per_bucket, ["event_type"], "bucket_qh", "sum_value", 900
    )


def ev_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap-fill over the same 15-minute per-type sums
    (operators/temporal.gapfill_interpolate) — the Timescale ``interpolate``
    companion to ev_gapfill_locf."""
    from icenetetl_spark.operators.temporal import gapfill_interpolate

    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", epoch_bucket("ts", 900, "bucket_qh")
    ).agg(fsum_col("value", 6).alias("sum_value"))
    return gapfill_interpolate(
        per_bucket, ["event_type"], "bucket_qh", "sum_value", 900
    )


PSI_SPLIT = "2024-01-16"  # baseline = first half of the month, current = second
PSI_LO, PSI_HI, PSI_BINS = 0.0, 500.0, 10
PSI_SMOOTH, PSI_QUANT, PSI_T = 0.5, 9, 0.2


def ev_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor per event_type: value
    histograms of the second half-month vs the first
    (operators/quality.drift_psi — fixed-width bins, Laplace smoothing,
    fixed-point term sums)."""
    from icenetetl_spark.operators.quality import drift_psi

    ev = load_table(spark, sf_dir, "events")
    return drift_psi(
        ev,
        "event_type",
        "value",
        period=F.to_date("ts") >= F.lit(PSI_SPLIT).cast("date"),
        lo=PSI_LO,
        hi=PSI_HI,
        n_bins=PSI_BINS,
        smooth=PSI_SMOOTH,
        quant=PSI_QUANT,
        threshold=PSI_T,
    )


QUERIES = {
    "ev_drift_psi": ev_drift_psi,
    "ev_gapfill_locf": ev_gapfill_locf,
    "ev_gapfill_interp": ev_gapfill_interp,
    "ev_retention": ev_retention,
    "ev_window_rollup": ev_window_rollup,
    "ev_json_extract": ev_json_extract,
    "ev_sessionize": ev_sessionize,
    "ev_sessionize_window": ev_sessionize_window,
    "ev_session_window": ev_session_window,
    "ev_top_users": ev_top_users,
    "ev_asof_join": ev_asof_join,
    "ev_range_join": ev_range_join,
    "ev_hypertable_rollup": ev_hypertable_rollup,
    "ev_funnel": ev_funnel,
}

ORACLES = {
    "ev_gapfill_locf": """
        WITH actual AS (
            SELECT event_type,
                   CAST(FLOOR(EPOCH(ts) / 900) * 900 AS BIGINT) AS bucket_qh,
                   CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6
                       AS sum_value
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, min(bucket_qh) AS mn, max(bucket_qh) AS mx
            FROM actual GROUP BY event_type
        ),
        grid AS (
            SELECT event_type, unnest(generate_series(mn, mx, 900))
                       AS bucket_qh
            FROM bounds
        ),
        j AS (
            SELECT g.event_type, g.bucket_qh, a.sum_value
            FROM grid g LEFT JOIN actual a
              ON g.event_type = a.event_type AND g.bucket_qh = a.bucket_qh
        )
        SELECT event_type, bucket_qh,
               last_value(sum_value IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket_qh
                   ROWS UNBOUNDED PRECEDING) AS sum_value,
               sum_value IS NULL AS is_gap
        FROM j
    """,
    "ev_gapfill_interp": """
        WITH actual AS (
            SELECT event_type,
                   CAST(FLOOR(EPOCH(ts) / 900) * 900 AS BIGINT) AS bucket_qh,
                   CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6
                       AS sum_value
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, min(bucket_qh) AS mn, max(bucket_qh) AS mx
            FROM actual GROUP BY event_type
        ),
        grid AS (
            SELECT event_type, unnest(generate_series(mn, mx, 900))
                       AS bucket_qh
            FROM bounds
        ),
        j AS (
            SELECT g.event_type, g.bucket_qh, a.sum_value
            FROM grid g LEFT JOIN actual a
              ON g.event_type = a.event_type AND g.bucket_qh = a.bucket_qh
        ),
        nb AS (
            SELECT event_type, bucket_qh, sum_value,
                   last_value(sum_value IGNORE NULLS) OVER fwd AS pv,
                   last_value(CASE WHEN sum_value IS NOT NULL
                                   THEN CAST(bucket_qh AS DOUBLE) END
                              IGNORE NULLS) OVER fwd AS pb,
                   first_value(sum_value IGNORE NULLS) OVER bwd AS nv,
                   first_value(CASE WHEN sum_value IS NOT NULL
                                    THEN CAST(bucket_qh AS DOUBLE) END
                               IGNORE NULLS) OVER bwd AS nb
            FROM j
            WINDOW fwd AS (PARTITION BY event_type ORDER BY bucket_qh
                           ROWS UNBOUNDED PRECEDING),
                   bwd AS (PARTITION BY event_type ORDER BY bucket_qh
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, bucket_qh,
               CASE WHEN sum_value IS NOT NULL THEN sum_value
                    ELSE pv + (nv - pv) * (CAST(bucket_qh AS DOUBLE) - pb)
                              / (nb - pb) END AS sum_value,
               sum_value IS NULL AS is_gap
        FROM nb
    """,
    "ev_retention": """
        WITH firsts AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
            FROM events GROUP BY user_id
        ),
        act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        SELECT f.cohort_date,
               CAST(date_diff('day', f.cohort_date, a.day) AS INTEGER)
                   AS day_offset,
               count(DISTINCT a.user_id) AS n_active
        FROM act a JOIN firsts f ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
    "ev_funnel": """
        WITH u1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        u2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN u1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > u1.t1
            GROUP BY e.user_id
        ),
        u3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN u2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > u2.t2
            GROUP BY e.user_id
        )
        SELECT '1_view' AS step, count(*) AS n_users FROM u1
        UNION ALL
        SELECT '2_click', count(*) FROM u2
        UNION ALL
        SELECT '3_purchase', count(*) FROM u3
    """,
    "ev_window_rollup": """
        SELECT CAST(FLOOR(EPOCH(ts) / 300) * 300 AS BIGINT) AS bucket_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "ev_json_extract": """
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
               COUNT(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_k,
               MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        FROM events
        GROUP BY event_type
    """,
    "ev_sessionize": """
        WITH gaps AS (
            SELECT user_id, event_id, ts,
                   FLOOR(EPOCH(ts)) - LAG(FLOOR(EPOCH(ts))) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS gap
            FROM events
        ), flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS new_sess
            FROM gaps
        ), sess AS (
            SELECT user_id, event_id, ts,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_idx
            FROM flagged
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               COUNT(*) AS n_events,
               CAST(MAX(FLOOR(EPOCH(ts))) - MIN(FLOOR(EPOCH(ts))) AS BIGINT)
                   AS duration_s
        FROM sess
        GROUP BY user_id, session_idx
    """,
    "ev_top_users": """
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_value
        FROM events
        GROUP BY user_id
        ORDER BY n_events DESC, user_id
        LIMIT 20
    """,
    # gaps-and-islands twin of F.session_window: new session when the
    # inter-event gap >= 1800s; window end = last event + 1800s
    "ev_session_window": """
        WITH o AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR EPOCH(ts) - EPOCH(lag(ts) OVER w) >= 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, ts, value,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM o
        )
        SELECT user_id,
               CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start,
               CAST(FLOOR(EPOCH(MAX(ts))) + 1800 AS BIGINT) AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_value
        FROM s GROUP BY user_id, sid
    """,
    "ev_range_join": """
        WITH top5 AS (
            SELECT user_id FROM events
            GROUP BY user_id ORDER BY count(*) DESC, user_id LIMIT 5
        ),
        windows AS (
            SELECT user_id AS window_user, min(ts) AS w_start, max(ts) AS w_end
            FROM events WHERE user_id IN (SELECT user_id FROM top5)
            GROUP BY user_id
        )
        SELECT DISTINCT e.event_id, e.user_id, w.window_user
        FROM events e JOIN windows w
          ON e.ts >= w.w_start AND e.ts <= w.w_end
        WHERE e.event_type = 'error'
    """,
    "ev_hypertable_rollup": """
        SELECT CAST(FLOOR(EPOCH(ts) / 86400) * 86400 AS BIGINT) AS bucket_day,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "ev_asof_join": """
        WITH purchases AS (
            SELECT user_id, ts, value FROM (
                SELECT user_id, ts, value,
                       row_number() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'purchase'
            ) WHERE rn = 1
        ),
        clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        )
        SELECT c.event_id, c.user_id, p.value AS last_purchase_value
        FROM clicks c
        ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
}


ORACLES["ev_drift_psi"] = f"""
    WITH ev AS (
        SELECT event_type,
               LEAST(GREATEST(CAST(FLOOR(
                   (CAST(value AS DOUBLE) - CAST({PSI_LO} AS DOUBLE))
                   / CAST({(PSI_HI - PSI_LO) / PSI_BINS} AS DOUBLE))
                   AS INTEGER), 0), {PSI_BINS - 1}) AS bin,
               CAST(ts AS DATE) >= DATE '{PSI_SPLIT}' AS is_b
        FROM events
    ),
    counts AS (
        SELECT event_type, bin,
               COUNT(CASE WHEN NOT is_b THEN 1 END) AS cnt_a,
               COUNT(CASE WHEN is_b THEN 1 END) AS cnt_b
        FROM ev GROUP BY 1, 2
    ),
    grid AS (
        SELECT event_type, i AS bin
        FROM (SELECT DISTINCT event_type FROM ev) t,
             unnest(generate_series(0, {PSI_BINS - 1})) AS s(i)
    ),
    filled AS (
        SELECT g.event_type, g.bin,
               COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
        FROM grid g LEFT JOIN counts c
          ON g.event_type = c.event_type AND g.bin = c.bin
    ),
    tot AS (
        SELECT event_type, SUM(cnt_a) AS tot_a, SUM(cnt_b) AS tot_b
        FROM filled GROUP BY 1
    ),
    terms AS (
        SELECT f.event_type, tot_a, tot_b,
               (CAST(cnt_a AS DOUBLE) + CAST({PSI_SMOOTH} AS DOUBLE))
                   / (CAST(tot_a AS DOUBLE)
                      + CAST({PSI_SMOOTH * PSI_BINS} AS DOUBLE)) AS pa,
               (CAST(cnt_b AS DOUBLE) + CAST({PSI_SMOOTH} AS DOUBLE))
                   / (CAST(tot_b AS DOUBLE)
                      + CAST({PSI_SMOOTH * PSI_BINS} AS DOUBLE)) AS pb
        FROM filled f JOIN tot USING (event_type)
    )
    SELECT event_type,
           CAST(MAX(tot_a) AS BIGINT) AS n_a,
           CAST(MAX(tot_b) AS BIGINT) AS n_b,
           CAST(SUM(CAST(FLOOR((pa - pb) * ln(pa / pb)
                * CAST(1e{PSI_QUANT} AS DOUBLE) + 0.5) AS BIGINT)) AS DOUBLE)
               / CAST(1e{PSI_QUANT} AS DOUBLE) AS psi,
           (CAST(SUM(CAST(FLOOR((pa - pb) * ln(pa / pb)
                * CAST(1e{PSI_QUANT} AS DOUBLE) + 0.5) AS BIGINT)) AS DOUBLE)
               / CAST(1e{PSI_QUANT} AS DOUBLE))
               > CAST({PSI_T} AS DOUBLE) AS drifted
    FROM terms
    GROUP BY event_type
"""


def ev_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: per user,
    consecutive events (ordered by ts, event_id) form (from_type, to_type)
    pairs; output each pair's count and transition probability. The window
    is partitioned per user (never global); the per-from totals broadcast
    back as a k-row frame. Counts are exact ints, probability one final
    division — engine-portable."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("n_from").cast("double")).alias(
                "p"
            ),
        )
    )


QUERIES["ev_transition_matrix"] = ev_transition_matrix

ORACLES["ev_transition_matrix"] = """
    WITH seq AS (
        SELECT user_id, event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    pairs AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    ),
    totals AS (
        SELECT from_type, SUM(n) AS n_from FROM pairs GROUP BY 1
    )
    SELECT p.from_type, p.to_type, p.n,
           CAST(p.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
    FROM pairs p JOIN totals t USING (from_type)
"""


def ev_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars (the TimescaleDB/financial rollup vocabulary): per
    15-minute bucket and event type, the first (open) and last (close)
    value by (ts, event_id) order plus min/max. Open/close come from a
    bucket-partitioned window rank — deterministic tie-break, never a
    global window; high/low/count are plain aggregates."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        epoch_bucket("ts", 900, "bucket"),
        "event_type",
        "ts",
        "event_id",
        "value",
    )
    w = Window.partitionBy("bucket", "event_type")
    asc = w.orderBy("ts", "event_id")
    desc = w.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("__rn_a", F.row_number().over(asc))
        .withColumn("__rn_d", F.row_number().over(desc))
        .groupBy("bucket", "event_type")
        .agg(
            F.min(F.when(F.col("__rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.min(F.when(F.col("__rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


QUERIES["ev_ohlc"] = ev_ohlc

ORACLES["ev_ohlc"] = """
    WITH ranked AS (
        SELECT CAST(FLOOR(EPOCH(ts) / 900) * 900 AS BIGINT) AS bucket,
               event_type, value,
               row_number() OVER (
                   PARTITION BY CAST(FLOOR(EPOCH(ts) / 900) * 900 AS BIGINT),
                                event_type
                   ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (
                   PARTITION BY CAST(FLOOR(EPOCH(ts) / 900) * 900 AS BIGINT),
                                event_type
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT bucket, event_type,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_events
    FROM ranked
    GROUP BY bucket, event_type
"""


def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step event paths (funnel mining's n-gram form): per
    user, consecutive event-type trigrams via two lead windows (one
    user-partitioned sort), counted and top-10 with a deterministic
    tiebreak."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


QUERIES["ev_top_paths"] = ev_top_paths

ORACLES["ev_top_paths"] = """
    WITH seq AS (
        SELECT event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq
    WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 10
"""


RATE_WINDOW_S = 900
RATE_Z = 3.0
RATE_QUANT = 9


def ev_rate_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-anomaly detection: per event_type, 15-minute window counts
    flagged when they exceed mean + RATE_Z * sigma of that type's own
    window-count distribution. Per-type moments come from one grouped
    pass over the window counts (fixed-point sums, E[x^2]-E[x]^2 in a
    fixed op order, sqrt quantized to absorb ulp divergence) and
    broadcast back — never a window over the data. The alerting shape a
    traffic monitor runs."""
    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            epoch_bucket("ts", RATE_WINDOW_S, "bucket"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = float(10**RATE_QUANT)
    nw = F.count(F.lit(1))
    stats = counts.groupBy("event_type").agg(
        nw.alias("n_windows"),
        (F.sum("n").cast("double") / nw).alias("mean_n"),
        (F.sum(F.col("n") * F.col("n")).cast("double") / nw).alias("ex2"),
    ).select(
        "event_type",
        "n_windows",
        "mean_n",
        (
            F.floor(
                F.sqrt(
                    F.greatest(
                        F.col("ex2") - F.col("mean_n") * F.col("mean_n"),
                        F.lit(0.0),
                    )
                )
                * F.lit(q)
                + F.lit(0.5)
            )
            / F.lit(q)
        ).alias("sigma"),
    )
    return (
        counts.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "bucket",
            "n",
            "mean_n",
            "sigma",
            (
                F.col("n").cast("double")
                > F.col("mean_n") + F.lit(RATE_Z) * F.col("sigma")
            ).alias("spike"),
        )
    )


QUERIES["ev_rate_spike"] = ev_rate_spike

ORACLES["ev_rate_spike"] = f"""
    WITH counts AS (
        SELECT CAST(FLOOR(EPOCH(ts) / {RATE_WINDOW_S}) * {RATE_WINDOW_S}
                    AS BIGINT) AS bucket,
               event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_n,
               CAST(SUM(n * n) AS DOUBLE) / COUNT(*) AS ex2
        FROM counts GROUP BY 1
    ),
    s2 AS (
        SELECT event_type, n_windows, mean_n,
               FLOOR(sqrt(GREATEST(ex2 - mean_n * mean_n,
                                   CAST(0.0 AS DOUBLE)))
                     * CAST(1e{RATE_QUANT} AS DOUBLE) + 0.5)
                   / CAST(1e{RATE_QUANT} AS DOUBLE) AS sigma
        FROM stats
    )
    SELECT c.event_type, c.bucket, c.n, s.mean_n, s.sigma,
           CAST(c.n AS DOUBLE)
               > s.mean_n + CAST({RATE_Z} AS DOUBLE) * s.sigma AS spike
    FROM counts c JOIN s2 s USING (event_type)
"""


# ev_sessionize_two_phase was folded into ev_sessionize in round 9: the
# two-phase plan is now the gated default (round-8 verdict #6), and the
# single-window form survives as the diagnostic twin ev_sessionize_window.
ORACLES["ev_sessionize_window"] = ORACLES["ev_sessionize"]
