"""graph_pagerank gate-wall breakdown (VERDICT r11 #8).

The gate constant was ~12-13s at sf0.01. This probe splits it into the
parts that could be cut: Spark-side graph CONSTRUCTION (the capped-shingle
Jaccard pair join feeding the edge list), the fixed power ITERATIONS
(per-iteration cost via iterations=5 vs 10 deltas), the final collect,
and the DuckDB oracle (which unrolls the same 10 iterations as chained
CTEs over its own pair CTE). Prints a timing table; nothing is written.

Usage: python tools/pagerank_profile.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from icenetetl_spark.operators import dedup as D
    from icenetetl_spark.operators.graph import pagerank, symmetrize
    from icenetetl_spark.queries.dedup import (
        JACCARD_T,
        PR_ITERATIONS,
        _capped_shingles,
    )
    from icenetetl_spark.session import get_spark
    from icenetetl_spark.sources.testdata import load_table

    spark = get_spark("pagerank-profile")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    docs = load_table(spark, args.sf, "documents")
    docs.count()
    print(f"scan warm:        {time.time() - t0:6.1f}s")

    t0 = time.time()
    pairs = D.jaccard_pairs(
        _capped_shingles(docs), threshold=JACCARD_T
    ).select("doc_a", "doc_b")
    edges = symmetrize(pairs)
    n_edges = edges.count()
    print(f"graph construct:  {time.time() - t0:6.1f}s  ({n_edges} edges)")

    for iters in (5, PR_ITERATIONS):
        t0 = time.time()
        pagerank(edges, iterations=iters).collect()
        print(f"pagerank x{iters:<2}:     {time.time() - t0:6.1f}s "
              "(includes its own edge persist + construction re-eval)")

    # full gate-shaped pass: query function + toPandas, as check_oracle runs
    from icenetetl_spark.queries.dedup import graph_pagerank

    t0 = time.time()
    graph_pagerank(spark, args.sf).toPandas()
    print(f"full query+pandas:{time.time() - t0:6.1f}s")

    import duckdb

    from icenetetl_spark.queries import all_oracles

    con = duckdb.connect()
    for t in ["documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )
    sql = all_oracles()["graph_pagerank"]
    t0 = time.time()
    n = len(con.execute(sql).df())
    print(f"duckdb oracle:    {time.time() - t0:6.1f}s  ({n} rows)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
