"""Focused warmed on/off A/B of scale.spread() for named queries (r14,
VERDICT r13 #4: knn_sign_lsh / dedup_simhash / text_bm25_topk were
driver-regressed but builder-A/B-improved — re-measure in ONE clean
ambient window).

Method: one session, bench-style warmup, then per query an interleaved
on,off,on,off,... sequence of full bench-methodology passes (construction
+ noop sink). "off" monkeypatches spread to identity in EVERY module that
holds a bound reference (similarity.py imports the name at module top),
so the measured plan is exactly the no-spread plan; values are
partitioning-independent by the operators' contracts. First on/off pair
is warmup and excluded from the medians.

Usage: python tools/spread_onoff_ab.py [-r reps] query [query ...]
Output: per-query on/off medians + ratio; one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 4
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    names = args

    import icenetetl_spark.operators.scale as scale
    from icenetetl_spark.queries import all_queries
    from icenetetl_spark.session import get_spark
    from icenetetl_spark.sources.testdata import TABLES, load_table

    real_spread = scale.spread

    def no_spread(df, *keys, factor=1):
        return df

    def holders():
        out = []
        for mod in list(sys.modules.values()):
            if mod is None or not getattr(mod, "__name__", "").startswith(
                "icenetetl_spark"
            ):
                continue
            if getattr(mod, "spread", None) in (real_spread, no_spread):
                out.append(mod)
        return out

    def set_spread(fn):
        for mod in holders():
            mod.spread = fn

    spark = get_spark("spread-ab")
    qs = all_queries()
    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    from pyspark.sql import functions as F

    li = load_table(spark, SF_DIR, "lineitem")
    li.groupBy("l_returnflag").count().count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    spark.range(128).localCheckpoint(eager=True).count()

    out: dict = {"reps": reps, "queries": {}}
    for name in names:
        fn = qs[name]
        walls: dict[str, list[float]] = {"on": [], "off": []}
        for rep in range(reps + 1):  # +1 warmup pair
            for mode in ("on", "off"):
                set_spread(real_spread if mode == "on" else no_spread)
                scale._SPREAD_MEMO.clear()
                t0 = time.time()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                w = time.time() - t0
                if rep > 0:
                    walls[mode].append(w)
        set_spread(real_spread)
        med = {m: statistics.median(v) for m, v in walls.items()}
        out["queries"][name] = {
            "on": round(med["on"], 3),
            "off": round(med["off"], 3),
            "on_over_off": round(med["on"] / med["off"], 3),
            "on_all": [round(v, 3) for v in walls["on"]],
            "off_all": [round(v, 3) for v in walls["off"]],
        }
        print(
            f"{name}: on {med['on']:.3f}s off {med['off']:.3f}s "
            f"ratio(on/off) {med['on'] / med['off']:.3f}",
            file=sys.stderr,
            flush=True,
        )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
