"""Trained-vs-fixed IVF quantizer RECALL under cell skew (VERDICT r12 #4).

The r12 skew study (tools/ivf_skew_stress.py) proved the WALLS stay flat
under a 93%-hot cell because candidate scoring is layout-partitioned, not
cell-partitioned. The production question it left open is QUALITY: with a
lopsided occupancy, a fixed quantizer concentrates most of the corpus in
one cell, so a probe either hits that cell (scans almost everything —
recall fine, cost high) or misses it (recall collapses). A TRAINED
quantizer re-fits centroids to the observed density, splitting the hot
basin and restoring the cell-size balance recall@n_probe depends on.

Measured here on the same uniform/skewed 50x corpora (ivf_skew_stress's
construction): recall@K vs exact brute force for

- ``knn_ivf_fixed`` — fixed corpus-row centroids (the hash-gated plan),
- ``knn_ivf`` — the deterministic-Lloyd TRAINED quantizer (same init ids,
  LLOYD_ITERS iterations on the full corpus),

plus the top-cell occupancy under EACH quantizer, so the recall movement
can be read against the cell-balance movement it comes from.

Results replace the "## IVF trained-vs-fixed recall under skew" section
of SCALING.md.

Usage: python tools/ivf_skew_recall.py [--factor 50]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icenetetl_spark.operators.ivf import assign_cells_fixed  # noqa: E402
from icenetetl_spark.operators.kmeans import lloyd_fit  # noqa: E402
from icenetetl_spark.queries.similarity import (  # noqa: E402
    EMB_DIM,
    IVF_CENTROID_IDS,
    K,
    LLOYD_ITERS,
    N_QUERIES,
    knn_bruteforce,
    knn_ivf,
    knn_ivf_fixed,
)
from icenetetl_spark.session import get_spark  # noqa: E402
from icenetetl_spark.sources.testdata import load_table  # noqa: E402
from tools.ivf_skew_stress import SKEWED_DIR, UNIFORM_DIR, build  # noqa: E402


def recall(spark, sf_dir, fn) -> float:
    bf = knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    approx = fn(spark, sf_dir).select("query_id", "neighbor_id")
    matched = bf.join(approx, ["query_id", "neighbor_id"]).count()
    return round(matched / (K * N_QUERIES), 3)


def occupancy(spark, sf_dir, trained: bool, top=3):
    emb = load_table(spark, sf_dir, "embeddings")
    init = emb.filter(F.col("vec_id").isin(IVF_CENTROID_IDS)).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    cents = (
        lloyd_fit(emb, init, iterations=LLOYD_ITERS, dim=EMB_DIM)
        if trained
        else init
    )
    counts = (
        assign_cells_fixed(emb, cents, dim=EMB_DIM)
        .groupBy("cell")
        .count()
        .orderBy(F.desc("count"))
        .collect()
    )
    total = sum(r["count"] for r in counts)
    return [
        (int(r["cell"]), round(r["count"] / total, 3)) for r in counts[:top]
    ]


def density_rows(spark, factor: int):
    """The k-density sweep (the r13 recall reading's testable claim):
    recall repair under a hot basin should come from MORE CELLS, not
    re-fitted positions, because corpus-sampled centroids land in the
    basin in proportion to its mass. Fixed strided quantizers at
    k = 16 / 64 / 256, each at the registered probe FRACTION (P/k =
    4/16) and at the registered probe COUNT (P = 4, a cheaper scan):
    recall@K vs brute force on both corpora."""
    from icenetetl_spark.operators.ivf import knn_ivf_fixed_centroids

    n = 2000 * factor
    out = []
    for sf_dir, corpus in ((UNIFORM_DIR, "uniform"), (SKEWED_DIR, "skewed")):
        emb = load_table(spark, sf_dir, "embeddings")
        bf = knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
        for k_cells in (16, 64, 256):
            stride = n // k_cells
            ids = list(range(N_QUERIES + 7, n, stride))[:k_cells]
            cents = emb.filter(F.col("vec_id").isin(ids)).select(
                F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("cvec"),
            )
            queries = emb.filter(F.col("vec_id") < N_QUERIES)
            probes = sorted({4, k_cells // 4})
            for p in probes:
                approx = knn_ivf_fixed_centroids(
                    queries, emb, cents, k=K, n_probe=p, dim=EMB_DIM
                ).select("query_id", "neighbor_id")
                matched = bf.join(
                    approx, ["query_id", "neighbor_id"]
                ).count()
                out.append(
                    (corpus, k_cells, p, round(matched / (K * N_QUERIES), 3))
                )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=50)
    args = ap.parse_args()

    spark = get_spark("icenetetl-ivf-skew-recall")
    build(spark, args.factor)

    rows = []
    occ = {}
    for sf_dir, corpus in ((UNIFORM_DIR, "uniform"), (SKEWED_DIR, "skewed")):
        r_fixed = recall(spark, sf_dir, knn_ivf_fixed)
        r_trained = recall(spark, sf_dir, knn_ivf)
        rows.append((corpus, r_fixed, r_trained))
        occ[corpus] = {
            "fixed": occupancy(spark, sf_dir, trained=False),
            "trained": occupancy(spark, sf_dir, trained=True),
        }
    dens = density_rows(spark, args.factor)
    spark.stop()

    lines = [
        "## IVF trained-vs-fixed recall under skew (tools/ivf_skew_recall.py, r13)",
        "",
        f"recall@{K} vs exact brute force for the {N_QUERIES} query "
        f"vectors on the {args.factor}x uniform/skewed corpora of the "
        "r12 skew study (same construction, same n_probe defaults as "
        "the registered queries). Occupancy lists the top cells as "
        "corpus fractions under each quantizer — the balance the "
        "trained fit buys is WHERE any recall movement comes from.",
        "",
        "| corpus | fixed-quantizer recall | trained-Lloyd recall |",
        "|---|---|---|",
    ]
    for corpus, rf, rt in rows:
        lines.append(f"| {corpus} | {rf} | {rt} |")
    lines += [
        "",
        f"Occupancy (top-3 cells, corpus fraction): uniform fixed "
        f"{occ['uniform']['fixed']}, uniform trained "
        f"{occ['uniform']['trained']}; skewed fixed "
        f"{occ['skewed']['fixed']}, skewed trained "
        f"{occ['skewed']['trained']}.",
        "",
        "k-density sweep (fixed strided quantizers; corpus-sampled "
        "centroids land in the hot basin in proportion to its mass — "
        "the claim under test is that CELL COUNT, not centroid "
        "position, is the recall dial):",
        "",
        "| corpus | k cells | n_probe | probed frac | recall@5 |",
        "|---|---|---|---|---|",
    ]
    for corpus, k_cells, p, r in dens:
        lines.append(
            f"| {corpus} | {k_cells} | {p} | {p / k_cells:.3f} | {r} |"
        )
    lines += [""]
    block = "\n".join(lines) + "\n"
    md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    old = open(md).read()
    marker = "## IVF trained-vs-fixed recall under skew"
    if marker in old:
        start = old.find(marker)
        # stop at the next heading of ANY level: a "### ..." sub-heading
        # inside this section is a HAND-MAINTAINED reading and must
        # survive tool re-runs (one already got stomped this way)
        ends = [
            e
            for e in (
                old.find("\n## ", start + 1),
                old.find("\n### ", start + 1),
            )
            if e != -1
        ]
        end = min(ends) if ends else -1
        old = old[:start] + block + (old[end + 1:] if end != -1 else "")
    else:
        old = old.rstrip() + "\n\n" + block
    with open(md, "w") as f:
        f.write(old)
    print(block)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
