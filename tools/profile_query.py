"""Per-job wall breakdown for one or more registered queries (guide §1).

Runs each named query through the bench methodology (construction +
noop-sink materialization) in a session with the REST status API enabled,
then dumps every Spark job the query issued: wall, stage count, task time,
and the first line of each stage's callsite — so a 5s query's wall can be
attributed to its construction-time driver jobs (counts/first/collect)
vs the materialization's stage chain.

Usage: python tools/profile_query.py [-r reps] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rest(app_base: str, path: str):
    with urllib.request.urlopen(app_base + path) as r:
        return json.load(r)


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    names = args

    from icenetetl_spark.queries import all_queries
    from icenetetl_spark.session import get_spark
    from icenetetl_spark.sources.testdata import TABLES, load_table

    spark = get_spark(
        "profile", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    qs = all_queries()
    # warmup: same surface as bench.py
    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    from pyspark.sql import functions as F

    li = load_table(spark, SF_DIR, "lineitem")
    li.groupBy("l_returnflag").count().count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    spark.range(128).localCheckpoint(eager=True).count()

    for name in names:
        fn = qs[name]
        walls = []
        for rep in range(reps):
            jobs_before = {j["jobId"] for j in rest(base, "/jobs")}
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t_built = time.time()
            df.write.format("noop").mode("overwrite").save()
            t1 = time.time()
            walls.append((t1 - t0, t_built - t0))
            if rep != reps - 1:
                continue
            jobs = [
                j for j in rest(base, "/jobs") if j["jobId"] not in jobs_before
            ]
            jobs.sort(key=lambda j: j["jobId"])
            print(f"\n=== {name}: wall {t1 - t0:.3f}s "
                  f"(construction {t_built - t0:.3f}s, exec {t1 - t_built:.3f}s) "
                  f"all reps: {[round(w, 3) for w, _ in walls]} "
                  f"constr: {[round(c, 3) for _, c in walls]}")
            total_job = 0.0
            for j in jobs:
                from datetime import datetime, timezone

                def ts(s):
                    return datetime.strptime(
                        s, "%Y-%m-%dT%H:%M:%S.%f%Z"
                    ).replace(tzinfo=timezone.utc).timestamp()

                dur = ts(j["completionTime"]) - ts(j["submissionTime"])
                total_job += dur
                print(
                    f"  job {j['jobId']:>4} {dur*1000:7.0f}ms "
                    f"stages={len(j.get('stageIds', []))} "
                    f"tasks={j.get('numTasks', '?')} "
                    f"{(j.get('name') or '')[:90]}"
                )
            print(f"  sum(job walls) = {total_job:.3f}s; "
                  f"gaps (driver/plan time) = {t1 - t0 - total_job:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
