"""md5 vs xxhash64 A/B (round-10 verdict #8).

The repo's portable hash default is md5 (what the DuckDB oracles mirror);
`functions.portable.set_default_hash_impl('xxhash64')` is the documented
one-line production swap, with an asserted-but-unrecorded "1.2-1.5x
end-to-end" claim. This tool records it: interleaved md5/xxhash64 reps of
the hash-heaviest gated queries (same session, same sf0.1 corpus, noop
sink, cold pair dropped, median of --runs). Results land in SCALING.md;
the swap hazard (persisted-data partitioning) is documented at the
switch itself.

Usage: python tools/hash_ab.py [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icenetetl_spark.functions.portable import (  # noqa: E402
    set_default_hash_impl,
)
from icenetetl_spark.queries import all_queries  # noqa: E402
from icenetetl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

# the queries whose hot path is dominated by portable-hash calls: k-gram
# winnowing fingerprints (substrings), shingle MinHash signatures, and
# the hash-bucketed global shuffle
AB_QUERIES = [
    "dedup_substring_spans",
    "dedup_substring_profile",
    "dedup_minhash_lsh",
    "dedup_groups",
    "doc_global_shuffle",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("icenetetl-hash-ab")
    queries = all_queries()  # impl is read at plan-BUILD time per call

    # stage decomposition for dedup_substring_spans (round-10 verdict #8:
    # does the k-gram hash pass or the span merge dominate?): time the
    # gram table alone vs the full query, per impl
    from pyspark.sql import functions as F  # noqa: F401

    from icenetetl_spark.operators.substrings import kgram_positions
    from icenetetl_spark.queries.dedup import SUBSTR_K
    from icenetetl_spark.sources.testdata import load_table

    docs = load_table(spark, SF_DIR, "documents")
    stage_rows = []
    for impl in ("md5", "xxhash64"):
        g_s, f_s = [], []
        for _ in range(args.runs + 1):
            t0 = time.time()
            kgram_positions(docs, SUBSTR_K, hash_impl=impl).write.format(
                "noop"
            ).mode("overwrite").save()
            g_s.append(time.time() - t0)
            set_default_hash_impl(impl)
            t0 = time.time()
            queries["dedup_substring_spans"](spark, SF_DIR).write.format(
                "noop"
            ).mode("overwrite").save()
            f_s.append(time.time() - t0)
        set_default_hash_impl("md5")
        stage_rows.append(
            (
                impl,
                round(statistics.median(g_s[1:]), 3),
                round(statistics.median(f_s[1:]), 3),
            )
        )
    md5_w, xx_w = {}, {}
    for name in AB_QUERIES:
        m_s, x_s = [], []
        for _ in range(args.runs + 1):  # cold pair dropped
            set_default_hash_impl("md5")
            t0 = time.time()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            m_s.append(time.time() - t0)
            set_default_hash_impl("xxhash64")
            t0 = time.time()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            x_s.append(time.time() - t0)
        set_default_hash_impl("md5")
        md5_w[name] = round(statistics.median(m_s[1:]), 3)
        xx_w[name] = round(statistics.median(x_s[1:]), 3)
    spark.stop()

    lines = [
        "## md5 vs xxhash64 A/B (tools/hash_ab.py)",
        "",
        f"The documented production hash swap "
        f"(functions/portable.set_default_hash_impl), recorded instead of "
        f"asserted: interleaved reps at sf0.1, cold pair dropped, median "
        f"of {args.runs}. md5 stays the gated default (the DuckDB oracles "
        f"mirror it); the swap is one bootstrap line and REPARTITIONS "
        f"PERSISTED DATA (see the hazard note at the switch).",
        "",
        "| query | md5 sec | xxhash64 sec | xxhash64/md5 |",
        "|---|---|---|---|",
    ]
    for name in AB_QUERIES:
        r = (
            round(xx_w[name] / md5_w[name], 2)
            if md5_w[name]
            else float("inf")
        )
        lines.append(f"| {name} | {md5_w[name]} | {xx_w[name]} | {r}x |")
    lines += [
        "",
        "Stage decomposition for dedup_substring_spans (gram-table pass "
        "= one hash per character position; the remainder is the dup "
        "groupBy + join + island window):",
        "",
        "| impl | gram table sec | full query sec | gram share |",
        "|---|---|---|---|",
    ]
    for impl, g, f in stage_rows:
        share = round(g / f, 2) if f else float("inf")
        lines.append(f"| {impl} | {g} | {f} | {share} |")
    lines.append("")
    block = "\n".join(lines) + "\n"
    md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    old = open(md).read()
    marker = "## md5 vs xxhash64 A/B"
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
