"""A/B for the Bloom-prefiltered semi join (SCALING.md "Bloom-prefiltered
semi join"): plain left-semi vs bloom_semi_join at 1x (sf0.1) and 10x
(scale_stress's perturbed corpus), interleaved reps after a dropped
warmup per plan, noop sink, autoBroadcastJoinThreshold=-1 (the big-big
regime the operator targets — with planner broadcasts on, a build side
this small would be broadcast and there would be nothing to prefilter).

Usage: python tools/bloom_ab.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icenetetl_spark.operators.scale import bloom_semi_join  # noqa: E402
from icenetetl_spark.session import get_spark  # noqa: E402
from icenetetl_spark.sources.testdata import load_table  # noqa: E402
from tools import scale_stress as stress  # noqa: E402


def sides(spark, sf):
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = load_table(spark, sf, "orders")
    build = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    return li, build


def main() -> int:
    spark = get_spark("bloom-ab")
    scaled = stress.build_scaled(spark, 10)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def plain(sf):
        li, build = sides(spark, sf)
        return li.join(build, "l_orderkey", "left_semi")

    def bloom(sf):
        li, build = sides(spark, sf)
        return bloom_semi_join(li, build, "l_orderkey")

    def run(fn, sf):
        t0 = time.time()
        fn(sf).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for sf in ("/root/testdata/sf0.1", scaled):
        for t in ("lineitem", "orders"):
            load_table(spark, sf, t).count()
        run(plain, sf)
        run(bloom, sf)  # one dropped warmup per plan
        p_reps, b_reps = [], []
        for _ in range(3):  # interleaved
            p_reps.append(run(plain, sf))
            b_reps.append(run(bloom, sf))
        li, build = sides(spark, sf)
        print(
            f"{sf}: probe={li.count()} build={build.count()} "
            f"matches={plain(sf).count()} "
            f"plain={statistics.median(p_reps):.3f}s "
            f"bloom={statistics.median(b_reps):.3f}s "
            f"(reps plain={[round(x, 2) for x in p_reps]} "
            f"bloom={[round(x, 2) for x in b_reps]})"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
