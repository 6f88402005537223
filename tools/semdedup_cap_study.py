"""SemDeDup block-cap second-decade study (VERDICT r11 #5).

dedup_semantic's 100x spot row is the repo's slowest absolute wall (~170s,
16.8x) — the documented sqrt-law N^1.5 shape with the per-cell block cap
holding the PAIR stage linear. This tool measures what the cap actually
buys and costs at the second decade: for each cap setting it records

- the full-query wall at 1x and 100x (interleaved reps, dropped warmup,
  median of --runs) and the 100x/1x ratio (the verdict's target: <= 8x),
- PAIR RECALL vs the uncapped ground truth: block confinement only ever
  DROPS pairs (blocks partition cells), so recall = n_pairs(cap) /
  n_pairs(uncapped) without a join,
- DROP-DECISION RECALL: |dropped(cap) ∩ dropped(uncapped)| /
  |dropped(uncapped)| where dropped = docs appearing in some pair minus
  the per-component keepers — the metric that matters for training-data
  curation (a missed drop is a retained near-duplicate).

The uncapped ground truth runs ONCE per size (it is the quadratic
blow-up the cap exists to avoid; its wall is reported for scale context,
not as a gated number). Results replace the "## SemDeDup cap study"
section of SCALING.md in place.

Usage: python tools/semdedup_cap_study.py [--factor 100] [--runs 2]
       [--caps 32,16]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icenetetl_spark.operators.semdedup import (  # noqa: E402
    semantic_pairs,
    semdedup,
)
from icenetetl_spark.queries.similarity import (  # noqa: E402
    EMB_DIM,
    SEM_T,
    _sem_cell_mod,
)
from icenetetl_spark.session import get_spark  # noqa: E402
from icenetetl_spark.sources.testdata import load_table  # noqa: E402
from tools.scale_spot import BASE_SF, build_scaled_subset  # noqa: E402


def _corpus(spark, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    mod = _sem_cell_mod(emb.count())
    cents = emb.filter(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    return emb, cents


def timed_query(spark, sf_dir: str, cap: int | None) -> float:
    emb, cents = _corpus(spark, sf_dir)
    t0 = time.time()
    semdedup(
        emb, cents, threshold=SEM_T, dim=EMB_DIM, cell_cap=cap
    ).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def drop_set(spark, sf_dir: str, cap: int | None):
    """(n_pairs, drop-set DataFrame): docs that appear in an
    above-threshold pair and are NOT their component's keeper."""
    emb, cents = _corpus(spark, sf_dir)
    pairs = semantic_pairs(
        emb, cents, threshold=SEM_T, dim=EMB_DIM, cell_cap=cap
    ).localCheckpoint(eager=False)
    n_pairs = pairs.count()
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    keeps = (
        semdedup(emb, cents, threshold=SEM_T, dim=EMB_DIM, cell_cap=cap)
        .select(F.col("keep_id").alias("doc_id"))
    )
    dropped = members.join(keeps, "doc_id", "left_anti")
    return n_pairs, dropped


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--caps", default="32,16")
    args = ap.parse_args()
    caps = [int(c) for c in args.caps.split(",")]

    spark = get_spark("icenetetl-semdedup-cap")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = build_scaled_subset(spark, args.factor)

    # walls: dropped warmup per (size, cap), then interleaved reps
    for cap in caps:
        timed_query(spark, BASE_SF, cap)
    walls: dict[tuple, list[float]] = {}
    for _ in range(args.runs):
        for cap in caps:
            for tag, d in (("1x", BASE_SF), ("Nx", scaled)):
                walls.setdefault((cap, tag), []).append(
                    timed_query(spark, d, cap)
                )

    def med(cap, tag):
        return round(statistics.median(walls[(cap, tag)]), 1)

    # ground truth (uncapped) once per size; capped recalls against it
    rows = []
    for tag, d in (("1x", BASE_SF), (f"{args.factor}x", scaled)):
        t0 = time.time()
        n_true, true_drop = drop_set(spark, d, cap=None)
        true_drop = true_drop.localCheckpoint(eager=True)
        n_true_drop = true_drop.count()
        t_uncapped = round(time.time() - t0, 1)
        for cap in caps:
            n_cap, cap_drop = drop_set(spark, d, cap)
            hit = cap_drop.join(true_drop, "doc_id").count()
            rows.append(
                {
                    "size": tag,
                    "cap": cap,
                    "wall": med(cap, "1x" if tag == "1x" else "Nx"),
                    "pairs": n_cap,
                    "pair_recall": round(n_cap / n_true, 4) if n_true else 1.0,
                    "drop_recall": round(hit / n_true_drop, 4)
                    if n_true_drop
                    else 1.0,
                }
            )
        rows.append(
            {
                "size": tag,
                "cap": None,
                "wall": t_uncapped,
                "pairs": n_true,
                "pair_recall": 1.0,
                "drop_recall": 1.0,
            }
        )
    spark.stop()

    lines = [
        "## SemDeDup cap study (tools/semdedup_cap_study.py)",
        "",
        f"The block cap's recall cost at the second decade (VERDICT r11 "
        f"#5): interleaved walls (median of {args.runs}, dropped warmup) "
        f"and recall vs the UNCAPPED within-cell ground truth at 1x and "
        f"{args.factor}x embeddings. Pair recall needs no join (blocks "
        "partition cells, so capped pairs are a subset); drop recall is "
        "the curation metric — a missed drop is a retained near-dup. The "
        "uncapped wall is the quadratic blow-up the cap exists to avoid "
        "(single measurement, context only).",
        "",
        "| size | cell_cap | wall s | pairs | pair recall | drop recall |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        cap = r["cap"] if r["cap"] is not None else "uncapped"
        lines.append(
            f"| {r['size']} | {cap} | {r['wall']} | {r['pairs']} "
            f"| {r['pair_recall']} | {r['drop_recall']} |"
        )
    by = {(r["size"], r["cap"]): r for r in rows}
    big = f"{args.factor}x"
    ratios = ", ".join(
        f"cap={c}: {round(by[(big, c)]['wall'] / by[('1x', c)]['wall'], 1)}x"
        for c in caps
        if by[("1x", c)]["wall"]
    )
    lines += ["", f"{args.factor}x/1x wall ratios — {ratios}.", ""]
    block = "\n".join(lines) + "\n"

    md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    old = open(md).read()
    marker = "## SemDeDup cap study"
    if marker in old:
        start = old.find(marker)
        end = old.find("\n## ", start + 1)
        old = old[:start] + block + (old[end + 1:] if end != -1 else "")
    else:
        old = old.rstrip() + "\n\n" + block
    with open(md, "w") as f:
        f.write(old)
    print(block)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
