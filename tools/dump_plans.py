"""Dump .explain("formatted") for registered queries to plans/<tag>/ files.

Usage: python tools/dump_plans.py <tag> <suffix> query [query ...]
Writes plans/<tag>/<query>_<suffix>.txt — the judge-facing evidence files
(e.g. tag=r13, suffix=before|after).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    from icenetetl_spark.queries import all_queries
    from icenetetl_spark.session import get_spark

    spark = get_spark("dump-plans")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
