"""Incremental view maintenance == full recompute, bit for bit, across
append / upsert / delete commits on the transactional catalog."""

from __future__ import annotations

from pyspark.sql import functions as F

from icenetetl_spark.operators.ivm import (
    apply_agg_delta,
    apply_join_delta,
    grouped_sum,
)
from icenetetl_spark.txn import TxnParquetCatalog


def _cat(spark, tmp_path) -> TxnParquetCatalog:
    return TxnParquetCatalog(spark, str(tmp_path / "wh"))


def _facts(spark, lo, hi, grp_mod=3, val=1.25):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % grp_mod).alias("g"),
        (F.col("id").cast("double") * val).alias("v"),
    )


def _dim(spark, n=3):
    return spark.range(n).select(
        F.col("id").alias("g"), F.concat(F.lit("grp-"), "id").alias("g_name")
    )


def _sorted(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(cols).collect())


def test_join_view_maintained_across_commit_history(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    dim = _dim(spark)
    cat.append_missing("facts", _facts(spark, 0, 40), ["k"])  # v0
    view = cat.read("facts", 0).join(dim, "g")

    # v1: upsert rewrites 10-19 with new values and inserts 40-49
    cat.upsert("facts", _facts(spark, 10, 50, val=2.5), ["k"])
    # v2: delete a slice
    cat.delete_where("facts", [("k", "<", 5)])

    for v_from, v_to in [(0, 1), (1, 2), (0, 2)]:
        changes = cat.table_changes("facts", v_from, v_to, keys=["k"])
        base = cat.read("facts", v_from).join(dim, "g")
        got = apply_join_delta(base, changes, dim, keys=["k"], on=["g"])
        want = cat.read("facts", v_to).join(dim, "g")
        assert _sorted(got) == _sorted(want), (v_from, v_to)


def test_agg_view_maintained_bit_exactly(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.append_missing("facts", _facts(spark, 0, 60), ["k"])  # v0
    agg0 = grouped_sum(cat.read("facts", 0), ["g"], "v")

    cat.upsert("facts", _facts(spark, 30, 80, val=0.75), ["k"])  # v1
    changes = cat.table_changes("facts", 0, 1, keys=["k"])
    got = apply_agg_delta(agg0, changes, ["g"], "v")
    want = grouped_sum(cat.read("facts", 1), ["g"], "v")
    assert _sorted(got) == _sorted(want)  # bit-exact, not approx


def test_agg_view_drops_emptied_groups(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.append_missing("facts", _facts(spark, 0, 9, grp_mod=3), ["k"])  # v0
    agg0 = grouped_sum(cat.read("facts", 0), ["g"], "v")
    # delete every row of group 0 (k % 3 == 0 -> k in 0,3,6): delete by range
    cat.delete_where("facts", [("k", "==", 0)])
    cat.delete_where("facts", [("k", "==", 3)])
    cat.delete_where("facts", [("k", "==", 6)])
    changes = cat.table_changes("facts", 0, 3, keys=["k"])
    got = apply_agg_delta(agg0, changes, ["g"], "v")
    assert {r["g"] for r in got.collect()} == {1, 2}
    want = grouped_sum(cat.read("facts", 3), ["g"], "v")
    assert _sorted(got) == _sorted(want)


def test_empty_delta_is_identity(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.append_missing("facts", _facts(spark, 0, 20), ["k"])
    agg0 = grouped_sum(cat.read("facts", 0), ["g"], "v")
    changes = cat.table_changes("facts", 0, 0, keys=["k"])
    got = apply_agg_delta(agg0, changes, ["g"], "v")
    assert _sorted(got) == _sorted(agg0)
    view = cat.read("facts", 0).join(_dim(spark), "g")
    gotj = apply_join_delta(view, changes, _dim(spark), keys=["k"], on=["g"])
    assert _sorted(gotj) == _sorted(view)
