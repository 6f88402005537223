"""Streaming stress: does the stateful sessionization stream hold its
constant-per-user state claim when the event volume grows 10x?

The batch plans are covered by tools/scale_stress.py; the streaming twin
(streaming/stateful.sessionize_stream) was correctness-tested only
(VERDICT r7 #8). This tool measures it at 1x (sf0.1 events) and 10x (the
stress harness's perturbed copies): events are re-written as K parquet
files and replayed through a file-source stream with maxFilesPerTrigger=1
(K micro-batches), availableNow trigger, foreachBatch counting sink. For
each size it reports wall time, micro-batches, rows processed, and the
state-store operator metrics from the query's progress events
(numRowsTotal / memoryUsedBytes) alongside the distinct-user count — the
claim under test is state rows == open sessions <= distinct users,
INDEPENDENT of the event count per user.

Usage: python tools/stream_stress.py [--batches 8]
Appends nothing; prints a markdown table to paste into SCALING.md's
hand-maintained "## Streaming at stress scale" section (kept manual so a
re-run of scale_stress.py can't silently drop the measured claim).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icenetetl_spark.session import get_spark  # noqa: E402
from icenetetl_spark.sources.testdata import load_table  # noqa: E402
from icenetetl_spark.streaming.stateful import (  # noqa: E402
    SESSION_OUTPUT_SCHEMA,
    sessionize_stream,
)

BASE_SF = "/root/testdata/sf0.1"
SCALED = "/tmp/icenetetl-scale10"
GAP_S = 1800


def measure(spark, events_dir: str, batches: int, tag: str) -> dict:
    stage = f"/tmp/icenetetl-stream-{tag}"
    ckpt = f"{stage}-ckpt"
    for p in (stage, ckpt):
        if os.path.isdir(p):
            shutil.rmtree(p)
    ev = spark.read.parquet(events_dir)
    n_rows = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # K files = K micro-batches under maxFilesPerTrigger=1; repartition by
    # a hash of the ROW (not time) so every batch carries most users —
    # the adversarial replay order for per-user state
    ev.repartition(batches).write.parquet(stage)

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out = sessionize_stream(src, gap_s=GAP_S)

    seen = {"rows": 0}

    def sink(df, batch_id):
        seen["rows"] += df.count()

    t0 = time.time()
    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    # last progress with a state operator (availableNow may end on an
    # empty finalization batch)
    state_rows = state_mem = n_batches = 0
    for p in q.recentProgress:
        n_batches += 1
        for so in p.get("stateOperators") or []:
            if so.get("numRowsTotal") is not None:
                state_rows = so["numRowsTotal"]
                state_mem = so.get("memoryUsedBytes", 0)
    return {
        "tag": tag,
        "rows": n_rows,
        "users": n_users,
        "batches": n_batches,
        "wall": round(wall, 2),
        "out_rows": seen["rows"],
        "state_rows": state_rows,
        "state_mem_kb": round(state_mem / 1024, 1),
    }


def measure_corpus(spark, docs_dir: str, batches: int, tag: str) -> dict:
    """The two-layer dedup stream (streaming/corpus_stream.py) over the
    documents table: layer 1 = dropDuplicatesWithinWatermark on the
    fingerprint (state-store bounded by the watermark), layer 2 = the
    catalog's fingerprint-keyed anti-join append. ts is synthesized
    deterministically (base + doc_id seconds) so the watermark semantics
    are exercised; the perturbed 10x copies have distinct fingerprints,
    so corpus and state grow with the DISTINCT-doc universe, as in real
    ingest."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from icenetetl_spark.streaming.corpus_stream import start_corpus_stream

    stage = f"/tmp/icenetetl-cstream-{tag}"
    ckpt, wh = f"{stage}-ckpt", f"{stage}-wh"
    for p in (stage, ckpt, wh):
        if os.path.isdir(p):
            shutil.rmtree(p)
    docs = (
        spark.read.parquet(docs_dir)
        .select(
            "doc_id",
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_dt_interval(secs=F.col("doc_id").cast("double"))
            ).alias("ts"),
            "text",
        )
    )
    n_rows = docs.count()
    docs.repartition(batches).write.parquet(stage)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    t0 = time.time()
    q = start_corpus_stream(
        spark,
        stage,
        wh,
        ckpt,
        schema,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    wall = time.time() - t0
    state_rows = state_mem = n_batches = 0
    for p in q.recentProgress:
        n_batches += 1
        for so in p.get("stateOperators") or []:
            if so.get("numRowsTotal") is not None:
                state_rows = so["numRowsTotal"]
                state_mem = so.get("memoryUsedBytes", 0)
    corpus_rows = spark.read.parquet(f"{wh}/corpus").count()
    return {
        "tag": tag,
        "rows": n_rows,
        "users": corpus_rows,  # column reused: unique corpus docs
        "batches": n_batches,
        "wall": round(wall, 2),
        "out_rows": corpus_rows,
        "state_rows": state_rows,
        "state_mem_kb": round(state_mem / 1024, 1),
    }


def build_hot_events(spark, events_dir: str, out_dir: str) -> str:
    """Skewed twin of an events table: ~30% of all events deterministically
    remapped onto ONE hot user (event_id % 10 < 3 — no RNG), the rest
    untouched. This is the hot-key shape the batch skew table uses
    (tools/skew_stress.py); here it stresses the per-user streaming state
    group: the hot user's group function receives ~30% of every
    micro-batch, and the claim under test is that it costs its BATCH SHARE
    per trigger — its state stays one open-session tuple — never a replay
    of its history."""
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    ev = spark.read.parquet(events_dir)
    hot = (
        ev.withColumn(
            "user_id",
            F.when(F.col("event_id") % 10 < 3, F.lit(1)).otherwise(
                F.col("user_id")
            ),
        )
    )
    hot.repartition(32).write.parquet(out_dir)
    return out_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument(
        "--corpus", action="store_true",
        help="measure the two-layer corpus dedup stream instead of "
        "sessionization",
    )
    ap.add_argument(
        "--skew", action="store_true",
        help="also measure a 10x variant with one hot user owning ~30% "
        "of all events (sessionization mode only)",
    )
    args = ap.parse_args()
    spark = get_spark("icenetetl-stream-stress")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for tag, d in (("1x", BASE_SF), ("10x", SCALED)):
        table = "documents" if args.corpus else "events"
        evp = f"{d}/{table}.parquet"
        if not os.path.exists(evp):
            print(f"skip {tag}: {evp} missing (run scale_stress first)")
            continue
        fn = measure_corpus if args.corpus else measure
        rows.append(fn(spark, evp, args.batches, tag))
    if args.skew and not args.corpus:
        evp = f"{SCALED}/events.parquet"
        if os.path.exists(evp):
            hot = build_hot_events(
                spark, evp, "/tmp/icenetetl-stream-hotevents"
            )
            rows.append(measure(spark, hot, args.batches, "10x hot-user"))

    print("| size | events | users | micro-batches | wall s | emitted rows "
          "| state rows | state KB |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['tag']} | {r['rows']} | {r['users']} | {r['batches']} "
            f"| {r['wall']} | {r['out_rows']} | {r['state_rows']} "
            f"| {r['state_mem_kb']} |"
        )
    if len(rows) == 2:
        a, b = rows
        print(
            f"\nwall ratio {b['wall'] / a['wall']:.2f}x for "
            f"{b['rows'] / a['rows']:.0f}x events; state rows grew "
            f"{b['state_rows'] / max(a['state_rows'], 1):.2f}x vs users "
            f"{b['users'] / a['users']:.2f}x (constant-per-user state "
            "tracks the KEY universe, not the event volume)"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
