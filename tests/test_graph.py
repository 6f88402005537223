"""PageRank: analytic small-graph values, determinism, rank properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icenetetl_spark.operators.graph import pagerank, symmetrize


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_symmetric_pair_star_ranks(spark):
    # undirected star 0-1, 0-2, 0-3: center must outrank leaves, leaves equal
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "doc_a long, doc_b long"
    )
    r = {
        row["node"]: row["rank"]
        for row in pagerank(symmetrize(pairs), iterations=20).collect()
    }
    assert len(r) == 4
    assert r[1] == r[2] == r[3]
    assert r[0] > r[1]
    # analytic damped fixed point: rc = 0.0375 + 2.55*rl, rl = 0.0375 +
    # (0.85/3)*rc  =>  rc ~ 0.4797 (20 iterations gets within ~1e-2)
    assert r[0] == pytest.approx(0.4797, abs=2e-2)


def test_path_center_outranks_ends_and_regular_components_tie(spark):
    # path 1-2-3: the deg-2 middle outranks the deg-1 ends (which tie);
    # a REGULAR component (K3) converges to the uniform 1/n rank exactly —
    # teleport erases degree differences only within regular graphs
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12)],
        "doc_a long, doc_b long",
    )
    r = {
        row["node"]: row["rank"]
        for row in pagerank(symmetrize(pairs), iterations=15).collect()
    }
    assert r[1] == r[3]
    assert r[2] > r[1]
    assert r[10] == r[11] == r[12] == pytest.approx(1 / 6, abs=1e-9)


def test_rank_mass_conserved_without_dangling(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)], "doc_a long, doc_b long"
    )
    total = (
        pagerank(symmetrize(pairs), iterations=10)
        .agg(F.sum("rank"))
        .collect()[0][0]
    )
    # symmetrized graph has no dangling nodes: mass stays ~1 (fixed-point
    # quantization floors each contribution by < 1e-12)
    assert total == pytest.approx(1.0, abs=1e-6)


def test_deterministic_under_repartition(spark):
    pairs = [(i, (i * 7 + 1) % 50) for i in range(50) if i != (i * 7 + 1) % 50]
    e1 = symmetrize(spark.createDataFrame(pairs, "doc_a long, doc_b long"))
    e2 = e1.repartition(13)
    a = sorted(map(tuple, pagerank(e1, iterations=8).collect()))
    b = sorted(map(tuple, pagerank(e2, iterations=8).collect()))
    assert a == b  # bit-exact, not approx — fixed-point sums


def test_dangling_free_directed_cycle_is_uniform(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    r = {row["node"]: row["rank"] for row in pagerank(edges, 10).collect()}
    for v in r.values():
        assert v == pytest.approx(1 / 3, abs=1e-9)


def test_empty_graph(spark):
    edges = _edges(spark, []).filter("src IS NOT NULL")
    assert pagerank(edges, 5).count() == 0


def test_source_only_nodes_keep_teleport_rank(spark):
    """A node with out-edges but NO in-edges must stay in the rank vector
    with the teleport-only rank (not drop out after iteration 1), and its
    contributions must keep flowing. Also pins Spark-vs-oracle parity on
    a DIRECTED graph with such a node."""
    import duckdb

    from icenetetl_spark.operators.graph import pagerank_oracle_sql

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 1)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=4).collect()}
    assert set(got) == {0, 1, 2}
    n, d = 3, 0.85
    assert got[0] == pytest.approx((1 - d) / n, abs=1e-12)
    assert got[1] > got[0] and got[2] > got[0]
    sql = (
        "WITH e(src, dst) AS (VALUES (0, 1), (1, 2), (2, 1)),\n"
        + pagerank_oracle_sql("e", iterations=4)
    )
    oracle = dict(duckdb.connect().execute(sql).fetchall())
    assert set(oracle) == set(got)
    for k in got:
        assert got[k] == pytest.approx(oracle[k], abs=0), (k, got[k], oracle[k])


def test_final_ranks_materialized_no_live_lineage(spark):
    """Round-10 advice #3: iterations not a multiple of CHECKPOINT_EVERY
    left the tail iteration's join+agg+join chain live, so every caller
    action re-executed it. The returned frame must be a checkpoint scan
    (no Join in its optimized plan) for ANY iteration count."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "doc_a long, doc_b long"
    )
    from icenetetl_spark.operators.graph import CHECKPOINT_EVERY

    for its in (CHECKPOINT_EVERY - 1, CHECKPOINT_EVERY, CHECKPOINT_EVERY + 1):
        ranks = pagerank(symmetrize(pairs), iterations=its)
        plan = ranks._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in plan, f"live lineage at iterations={its}"
