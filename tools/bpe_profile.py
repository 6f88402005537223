"""Name the bpe_encode_fixed 100x cause (round-10 verdict #4).

bpe_encode_fixed is the worst 100x spot row (13.4x) with no named cause.
Its plan has three candidate cost centers: (a) the corpus-side explode +
word join (grows with corpus rows, ~100x), (b) the DISTINCT-pretoken
merge fold (grows with VOCABULARY — and the stress corpus's per-copy
word prefixing multiplies distinct words far faster than a natural
corpus's Heaps-law growth), (c) source layout. This tool times each
stage at 1x and 100x on the same spot corpus scale_spot builds, and
counts distinct pretokens at both sizes.

Usage: python tools/bpe_profile.py [--factor 100] [--runs 2]
Prints a table; the conclusion is folded into SCALING.md's 100x section.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icenetetl_spark.operators.bpe import (  # noqa: E402
    apply_merges,
    symbolize,
)
from icenetetl_spark.operators.text import BPE_TOKEN_PATTERN  # noqa: E402
from icenetetl_spark.queries.tokenizer import FIXED_MERGES  # noqa: E402
from icenetetl_spark.session import get_spark  # noqa: E402
from icenetetl_spark.sources.testdata import load_table  # noqa: E402
from tools.scale_stress import BASE_SF  # noqa: E402
from tools.scale_spot import build_scaled_subset  # noqa: E402


def _words(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower("text"), F.lit(BPE_TOKEN_PATTERN), F.lit(0)
            )
        ).alias("word"),
    )


def stages(spark, sf_dir) -> dict:
    """Wall per stage, each materialized through a noop sink."""
    out = {}
    words = _words(spark, sf_dir)

    t0 = time.time()
    words.write.format("noop").mode("overwrite").save()
    out["explode"] = time.time() - t0

    distinct = words.select("word").distinct()
    t0 = time.time()
    distinct.write.format("noop").mode("overwrite").save()
    out["distinct"] = time.time() - t0

    encoded = distinct.withColumn(
        "n_sub",
        F.size(apply_merges(symbolize(F.col("word")), FIXED_MERGES)),
    )
    t0 = time.time()
    encoded.write.format("noop").mode("overwrite").save()
    out["distinct+fold"] = time.time() - t0

    full = (
        words.join(encoded, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_sub").alias("n_tokens"))
    )
    t0 = time.time()
    full.write.format("noop").mode("overwrite").save()
    out["full query"] = time.time() - t0
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("icenetetl-bpe-profile")
    scaled = f"/tmp/icenetetl-spot{args.factor}"
    if not os.path.isdir(scaled):
        scaled = build_scaled_subset(spark, args.factor)

    n1 = _words(spark, BASE_SF).select("word").distinct().count()
    nn = _words(spark, scaled).select("word").distinct().count()
    r1 = _words(spark, BASE_SF).count()
    rn = _words(spark, scaled).count()
    print(
        f"pretokens: 1x {r1:,} rows / {n1:,} distinct; "
        f"{args.factor}x {rn:,} rows / {nn:,} distinct "
        f"(vocab grew {nn / n1:.1f}x vs corpus {rn / r1:.1f}x)"
    )

    stages(spark, BASE_SF)  # dropped warmup
    s1 = [stages(spark, BASE_SF) for _ in range(args.runs)]
    sn = [stages(spark, scaled) for _ in range(args.runs)]
    print(f"| stage | 1x sec | {args.factor}x sec | ratio |")
    print("|---|---|---|---|")
    for k in s1[0]:
        a = statistics.median(r[k] for r in s1)
        b = statistics.median(r[k] for r in sn)
        print(f"| {k} | {a:.2f} | {b:.2f} | {b / a:.1f}x |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
