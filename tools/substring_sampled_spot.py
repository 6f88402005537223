"""dedup_substring_sampled second-decade row (VERDICT r12 #3).

The exact every-position span form (dedup_substring_spans) is linear in
shape but carries the largest non-semantic constant in the 100x table
(7.2x, 40.7s absolute). The winnowing-sampled variant
(dedup_substring_sampled — content-defined mod-p gram sampling,
operators/substrings.kgram_positions) is the DESIGNED scale default: every
post-hash stage rides ~1/sample_mod of the rows. This tool gives it the
same second-decade evidence as its exact twin: interleaved 1x/100x walls
(dropped warmup, median of --runs, noop sink, exchange counts), plus the
dedup-DECISION recall of the sampled form against the exact spans at both
sizes (decision = document has >= 1 duplicated span; the sampled form
exists for decisions, not offsets — the operators/substrings.py dispatch
rule).

Results replace the "## Substring dedup scale default" section of
SCALING.md.

Usage: python tools/substring_sampled_spot.py [--factor 100] [--runs 2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icenetetl_spark.queries import all_queries  # noqa: E402
from icenetetl_spark.session import get_spark  # noqa: E402
from tools.scale_spot import build_scaled_subset  # noqa: E402
from tools.scale_stress import BASE_SF, measure_interleaved  # noqa: E402

NAMES = ["dedup_substring_spans", "dedup_substring_sampled"]


def decision_sets(spark, sf_dir):
    """Per query: the set of doc_ids carrying >= 1 duplicated span."""
    q = all_queries()
    out = {}
    for name in NAMES:
        df = q[name](spark, sf_dir)
        if "dup_chars" in df.columns:
            # the profile form lists EVERY document (zeros for clean
            # ones); the decision is dup_chars > 0
            df = df.filter(F.col("dup_chars") > 0)
        out[name] = {r[0] for r in df.select("doc_id").distinct().collect()}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--reuse", action="store_true",
                    help="reuse an existing /tmp/icenetetl-spot{factor}")
    args = ap.parse_args()

    spark = get_spark("icenetetl-substring-sampled-spot")
    scaled = f"/tmp/icenetetl-spot{args.factor}"
    if not (args.reuse and os.path.isdir(scaled)):
        scaled = build_scaled_subset(spark, args.factor)
    base, big = measure_interleaved(
        spark, BASE_SF, scaled, args.runs, names=NAMES
    )

    rec = {}
    for sf_dir, tag in ((BASE_SF, "1x"), (scaled, f"{args.factor}x")):
        d = decision_sets(spark, sf_dir)
        exact, sampled = d["dedup_substring_spans"], d["dedup_substring_sampled"]
        rec[tag] = {
            "exact_docs": len(exact),
            "sampled_docs": len(sampled),
            "recall": round(len(exact & sampled) / len(exact), 4)
            if exact else 1.0,
        }
    spark.stop()

    lines = [
        "## Substring dedup scale default (tools/substring_sampled_spot.py, r13)",
        "",
        f"Interleaved 1x/{args.factor}x reps, one dropped warmup per "
        f"(query, size), median of {args.runs}, noop sink — the exact "
        "spans row repeated alongside its designed scale default so the "
        "constants are same-window comparable. Decision recall = fraction "
        "of exact-form duplicated DOCUMENTS the sampled form also flags "
        "(the dispatch rule in operators/substrings.py: exact for "
        "offsets, sampled for decisions).",
        "",
        f"| query | 1x sec | {args.factor}x sec | ratio "
        f"| shuffles 1x/{args.factor}x | broadcasts 1x/{args.factor}x |",
        "|---|---|---|---|---|",
    ]
    for name in NAMES:
        b, g = base[name], big[name]
        ratio = round(g["sec"] / b["sec"], 1) if b["sec"] else float("inf")
        lines.append(
            f"| {name} | {b['sec']} | {g['sec']} | {ratio}x "
            f"| {b['shuffles']}/{g['shuffles']} "
            f"| {b['broadcasts']}/{g['broadcasts']} |"
        )
    lines += [
        "",
        f"Decision recall (sampled vs exact): 1x "
        f"{rec['1x']['recall']} ({rec['1x']['sampled_docs']}/"
        f"{rec['1x']['exact_docs']} docs), {args.factor}x "
        f"{rec[f'{args.factor}x']['recall']} "
        f"({rec[f'{args.factor}x']['sampled_docs']}/"
        f"{rec[f'{args.factor}x']['exact_docs']} docs).",
        "",
    ]
    block = "\n".join(lines) + "\n"
    md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    old = open(md).read()
    marker = "## Substring dedup scale default"
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
