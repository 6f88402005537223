"""IceNet pipeline 10x stress (round-10 verdict #5): the reference's core
chain — ingest (geometries + forecasts) -> latest matview recompute -> meta
rollup — measured at 1x and 10x input with exchange-count assertions, the
same treatment every LLM-operator family already gets in SCALING.md.

Scaling construction: MORE DATES x MORE LEADTIMES at a CONSTANT grid
(the dimension real IceNet growth takes — new forecast runs against the
same spatial grid). 1x = 2 generation dates x 5 leadtimes x 64x64 cells
(40,960 fact rows); 10x = 10 dates x 10 leadtimes x 64x64 (409,600). The
cell table is constant across sizes, so the pinned broadcast enrich join
must stay a broadcast at both sizes — exactly the 100 TB claim.

Methodology mirrors tools/scale_stress.py: interleaved 1x/10x passes (each
pass = fresh warehouse + full chain, since the pipeline mutates catalog
state), one dropped warmup pass, per-phase medians, exchange counts from
the physical plans of latest_frame()/meta_frame(). Per-file work (ingest)
is summed across files and ALSO reported per file: total ingest scales
with file count x rows-per-file by workload definition; the per-file
number is what must stay flat-ish for the plan claim.

Results are appended to SCALING.md (section replaced in place on re-run).

Usage: python tools/icenet_stress.py [--factor 10] [--runs 2]
"""

from __future__ import annotations

import argparse
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icenetetl_spark.catalog import ParquetCatalog  # noqa: E402
from icenetetl_spark.plans.icenet import (  # noqa: E402
    IceNetPipeline,
    classify_hemisphere,
    normalize_forecasts,
)
from icenetetl_spark.session import get_spark  # noqa: E402
from icenetetl_spark.sources.fixtures import make_raw_file  # noqa: E402
from tools.scale_stress import _exchanges  # noqa: E402

GRID = 64
SIZES = {
    1: dict(dates=2, leadtimes=5),     # 40,960 fact rows
    # dates x leadtimes both grow: 10x rows across 5x the files
    "factor": dict(dates=10, leadtimes=10),
}


def _dates(n: int) -> list[str]:
    # date arithmetic instead of a day-of-March literal so the r13
    # 100-file fan-in study can generate >31 distinct file dates
    import datetime

    d0 = datetime.date(2024, 3, 1)
    return [
        (d0 + datetime.timedelta(days=i)).isoformat() for i in range(n)
    ]


def run_chain(spark, warehouse: str, dates: int, leadtimes: int) -> dict:
    """One full pass: fresh warehouse, per-file ingest, one latest + meta.
    Returns phase timings and the latest/meta plan exchange counts."""
    if os.path.isdir(warehouse):
        shutil.rmtree(warehouse)
    cat = ParquetCatalog(spark, warehouse)
    pipe = IceNetPipeline(cat)

    t_ingest = 0.0
    for i, d in enumerate(_dates(dates)):
        raw, attrs = make_raw_file(
            spark, d, "north", grid_side=GRID, leadtimes=leadtimes, seed=i + 1
        )
        t0 = time.time()
        hemi = classify_hemisphere(attrs)
        norm = normalize_forecasts(raw, hemi)
        pipe.update_geometries(raw, hemi)
        pipe.update_forecasts(norm, hemi)
        t_ingest += time.time() - t0

    t0 = time.time()
    pipe.update_latest()
    t_latest = time.time() - t0

    t0 = time.time()
    pipe.update_meta()
    t_meta = time.time() - t0

    lat_sh, lat_bc = _exchanges(pipe.latest_frame())
    meta_sh, meta_bc = _exchanges(pipe.meta_frame())
    return {
        "ingest": t_ingest,
        "ingest_per_file": t_ingest / dates,
        "latest": t_latest,
        "meta": t_meta,
        "latest_plan": (lat_sh, lat_bc),
        "meta_plan": (meta_sh, meta_bc),
    }


def run_chain_batch(spark, warehouse: str, dates: int, leadtimes: int) -> dict:
    """The CONCURRENT ingest the reference's serial queue can't do
    (host.json:4-8 pins one blob at a time; round-10 verdict #3): all
    files union into ONE batch before the chain, so Spark ingests them
    with file-level parallelism — one grid append, one anti-join +
    append for every file's facts, instead of one chain per file. Same
    fixture set, same final warehouse (asserted by hash in main)."""
    if os.path.isdir(warehouse):
        shutil.rmtree(warehouse)
    cat = ParquetCatalog(spark, warehouse)
    pipe = IceNetPipeline(cat)

    files = [
        make_raw_file(
            spark, d, "north", grid_side=GRID, leadtimes=leadtimes, seed=i + 1
        )
        for i, d in enumerate(_dates(dates))
    ]
    t0 = time.time()
    hemi = classify_hemisphere(files[0][1])
    raw_union = files[0][0]
    for raw, _ in files[1:]:
        raw_union = raw_union.unionByName(raw)
    # normalize commutes with union (row-wise filter/derive); the grid
    # axes of the union are the same distinct coordinate set every file
    # carries, so update_geometries sees identical cells
    norm = normalize_forecasts(raw_union, hemi)
    pipe.update_geometries(raw_union, hemi)
    pipe.update_forecasts(norm, hemi)
    t_ingest = time.time() - t0

    t0 = time.time()
    pipe.update_latest()
    t_latest = time.time() - t0
    t0 = time.time()
    pipe.update_meta()
    t_meta = time.time() - t0
    return {
        "ingest": t_ingest,
        "ingest_per_file": t_ingest / dates,
        "latest": t_latest,
        "meta": t_meta,
        "latest_plan": _exchanges(pipe.latest_frame()),
        "meta_plan": _exchanges(pipe.meta_frame()),
    }


def run_chain_stream(
    spark, warehouse: str, dates: int, leadtimes: int, mfpt: int
) -> dict:
    """The PRODUCTION ingest path (r11 verdict #4): the file-source stream
    through streaming/ingest_stream.py, whose foreachBatch runs the full
    chain per micro-batch (the reference's every-blob-triggers-the-chain
    model). ``mfpt=1`` is the reference's serial queue; ``mfpt=dates``
    drains all files in ONE trigger — the streaming form of the
    concurrent batch union. Wall covers the whole drain (ingest + the
    per-batch latest/meta recomputes), so compare against the batch
    rows' ingest+latest+meta TOTAL."""
    from icenetetl_spark.streaming.ingest_stream import start_ingest_stream

    stage = f"{warehouse}-in"
    ckpt = f"{warehouse}-ckpt"
    for p in (stage, ckpt, warehouse):
        if os.path.isdir(p):
            shutil.rmtree(p)
    os.makedirs(stage)
    attrs = None
    for i, d in enumerate(_dates(dates)):
        raw, attrs = make_raw_file(
            spark, d, "north", grid_side=GRID, leadtimes=leadtimes, seed=i + 1
        )
        tmp = f"{stage}-tmp"
        raw.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        shutil.move(
            os.path.join(tmp, part),
            os.path.join(stage, f"file_{i:03d}.parquet"),
        )
    t0 = time.time()
    q = start_ingest_stream(
        spark, stage, warehouse, ckpt, attrs,
        available_now=True, max_files_per_trigger=mfpt,
    )
    q.awaitTermination()
    wall = time.time() - t0
    batches = sum(
        1 for p in q.recentProgress if (p.get("numInputRows") or 0) > 0
    )
    return {"wall": round(wall, 3), "batches": batches}


def warehouse_hash(spark, warehouse: str) -> dict:
    """Order-insensitive content hash of the chain's final tables."""
    cat = ParquetCatalog(spark, warehouse)
    out = {}
    for t in ("cells", "forecasts", "forecast_latest", "forecast_meta"):
        try:
            df = cat.read(t)
        except Exception:
            out[t] = None
            continue
        cols = sorted(df.columns)
        # decimal(38,0) sum: a BIGINT sum of xxhash64 overflows (raises
        # under the session's ANSI mode) after a few hundred rows
        row = df.select(
            F.xxhash64(
                *[F.col(c).cast("string") for c in cols]
            ).cast("decimal(38,0)").alias("h")
        ).agg(
            F.count(F.lit(1)).alias("n"), F.sum("h").alias("hs")
        ).collect()[0]
        out[t] = (int(row["n"]), int(row["hs"]) if row["hs"] is not None else 0)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("icenetetl-icenet-stress")
    small, big = SIZES[1], SIZES["factor"]

    # dropped warmup (codegen, Arrow pool, catalog write paths)
    run_chain(spark, "/tmp/icenet-stress-warm", **small)

    runs_1x, runs_nx, runs_batch = [], [], []
    runs_s1, runs_sN = [], []
    for _ in range(args.runs):
        runs_1x.append(run_chain(spark, "/tmp/icenet-stress-1x", **small))
        runs_nx.append(run_chain(spark, "/tmp/icenet-stress-nx", **big))
        runs_batch.append(
            run_chain_batch(spark, "/tmp/icenet-stress-batch", **big)
        )
        runs_s1.append(
            run_chain_stream(
                spark, "/tmp/icenet-stress-stream1", mfpt=1, **big
            )
        )
        runs_sN.append(
            run_chain_stream(
                spark, "/tmp/icenet-stress-streamN",
                mfpt=big["dates"], **big,
            )
        )
    # every ingest mode must land the IDENTICAL warehouse
    h_serial = warehouse_hash(spark, "/tmp/icenet-stress-nx")
    h_batch = warehouse_hash(spark, "/tmp/icenet-stress-batch")
    h_stream1 = warehouse_hash(spark, "/tmp/icenet-stress-stream1")
    h_streamN = warehouse_hash(spark, "/tmp/icenet-stress-streamN")
    tables_match = h_serial == h_batch == h_stream1 == h_streamN
    spark.stop()

    def med(rows, key):
        return round(statistics.median(r[key] for r in rows), 3)

    phases = ["ingest", "ingest_per_file", "latest", "meta"]
    m1 = {p: med(runs_1x, p) for p in phases}
    mn = {p: med(runs_nx, p) for p in phases}
    plans_same = all(
        runs_1x[0][k] == runs_nx[0][k] for k in ("latest_plan", "meta_plan")
    )

    total1 = round(m1["ingest"] + m1["latest"] + m1["meta"], 3)
    totaln = round(mn["ingest"] + mn["latest"] + mn["meta"], 3)
    n_rows1 = small["dates"] * small["leadtimes"] * GRID * GRID
    n_rowsn = big["dates"] * big["leadtimes"] * GRID * GRID

    lines = [
        "## IceNet pipeline 10x (tools/icenet_stress.py)",
        "",
        f"The reference's core chain at {n_rows1:,} vs {n_rowsn:,} fact "
        f"rows ({small['dates']}x{small['leadtimes']} vs "
        f"{big['dates']}x{big['leadtimes']} dates x leadtimes, constant "
        f"{GRID}x{GRID} grid; interleaved fresh-warehouse passes, one "
        f"dropped warmup, median of {args.runs}). Ingest is per-file work "
        "summed over files — total scales with file count BY WORKLOAD "
        "DEFINITION (every blob triggers the chain in the reference's "
        "model); the per-file column is the plan claim. The cell table is "
        "constant, so the enrich join must stay a broadcast at both sizes.",
        "",
        "| phase | 1x sec | 10x sec | ratio |",
        "|---|---|---|---|",
    ]
    for p in phases:
        r = round(mn[p] / m1[p], 2) if m1[p] else float("inf")
        lines.append(f"| {p} | {m1[p]} | {mn[p]} | {r}x |")
    mb = {p: med(runs_batch, p) for p in phases}
    lines += [
        f"| **chain total** | {total1} | {totaln} | "
        f"{round(totaln / total1, 2) if total1 else float('inf')}x |",
        "",
        f"latest_frame plan (shuffles, broadcasts): "
        f"1x {runs_1x[0]['latest_plan']} / 10x {runs_nx[0]['latest_plan']}; "
        f"meta_frame: 1x {runs_1x[0]['meta_plan']} / "
        f"10x {runs_nx[0]['meta_plan']}. "
        f"Plan shapes identical across sizes: **{plans_same}**.",
        "",
        "### Concurrent multi-file ingest (round-10 verdict #3)",
        "",
        f"The reference ingests serially by queue config (host.json:4-8); "
        f"the Spark advantage at 100x file count is CONCURRENT ingest. "
        f"Same {big['dates']} files, one batch union -> one chain pass "
        f"(interleaved with the serial passes above, median of "
        f"{args.runs}):",
        "",
        "| ingest mode | ingest sec | latest | meta |",
        "|---|---|---|---|",
        f"| serial, {big['dates']} chains (reference model) | "
        f"{mn['ingest']} | {mn['latest']} | {mn['meta']} |",
        f"| concurrent, 1 batch union | {mb['ingest']} | {mb['latest']} | "
        f"{mb['meta']} |",
        "",
        f"Concurrent / serial ingest wall: "
        f"**{round(mb['ingest'] / mn['ingest'], 2)}x** "
        f"({round(mn['ingest'] / mb['ingest'], 1)}x faster). "
        f"Final warehouse content hashes (cells, forecasts, latest, meta) "
        f"identical across modes: **{tables_match}**. "
        f"Batch latest/meta plans: {runs_batch[0]['latest_plan']} / "
        f"{runs_batch[0]['meta_plan']} (same shapes as serial).",
        "",
        "### Streaming concurrent ingest (r11 verdict #4)",
        "",
        "The batch-union row above bypasses the trigger model; the "
        "production path at 100x file count is the FILE STREAM with "
        "maxFilesPerTrigger>1 (streaming/ingest_stream.py — foreachBatch "
        "runs the full chain per micro-batch, so each wall below covers "
        "ingest PLUS the per-batch latest/meta recomputes; the comparable "
        f"batch-union number is its chain total "
        f"{round(mb['ingest'] + mb['latest'] + mb['meta'], 3)}s, serial "
        f"chains {round(mn['ingest'] + mn['latest'] + mn['meta'], 3)}s):",
        "",
        "| mode | micro-batches | full-chain wall s |",
        "|---|---|---|",
        f"| stream, maxFilesPerTrigger=1 (reference serial queue) | "
        f"{runs_s1[0]['batches']} | {med(runs_s1, 'wall')} |",
        f"| stream, maxFilesPerTrigger={big['dates']} (one trigger) | "
        f"{runs_sN[0]['batches']} | {med(runs_sN, 'wall')} |",
        "",
        f"Concurrent / serial STREAM wall: "
        f"**{round(med(runs_sN, 'wall') / med(runs_s1, 'wall'), 2)}x**. "
        f"Final warehouse hashes identical across serial chains, batch "
        f"union, serial stream, and concurrent stream: "
        f"**{tables_match}**.",
        "",
    ]
    block = "\n".join(lines) + "\n"

    md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    old = open(md).read()
    marker = "## IceNet pipeline 10x"
    if marker in old:
        start = old.find(marker)
        end = old.find("\n## ", start + 1)
        old = old[:start] + block + (old[end + 1:] if end != -1 else "")
    else:
        old = old.rstrip() + "\n\n" + block
    with open(md, "w") as f:
        f.write(old)
    print(block)
    return 0 if plans_same and tables_match else 1


if __name__ == "__main__":
    raise SystemExit(main())
