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
    return [f"2024-03-{d:02d}" for d in range(1, n + 1)]


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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("icenetetl-icenet-stress")
    small, big = SIZES[1], SIZES["factor"]

    # dropped warmup (codegen, Arrow pool, catalog write paths)
    run_chain(spark, "/tmp/icenet-stress-warm", **small)

    runs_1x, runs_nx = [], []
    for _ in range(args.runs):
        runs_1x.append(run_chain(spark, "/tmp/icenet-stress-1x", **small))
        runs_nx.append(run_chain(spark, "/tmp/icenet-stress-nx", **big))
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
    return 0 if plans_same else 1


if __name__ == "__main__":
    raise SystemExit(main())
