"""Property-based tests (hypothesis) for the upsert discipline — the
reference's core invariants expressed as laws over arbitrary inputs:

- append_missing is idempotent (ON CONFLICT DO NOTHING replay safety)
- upsert agrees with last-writer-wins dict semantics
- exact dedup canonical ids are minimal members of their groups
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from icenetetl_spark.operators.relational import insert_missing, upsert

keys = st.integers(min_value=0, max_value=20)
vals = st.text(alphabet="abcxyz", min_size=0, max_size=4)
kv_lists = st.lists(st.tuples(keys, vals), min_size=0, max_size=15)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, "")], "k long, v string").limit(
        len(rows)
    )


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(existing=kv_lists, incoming=kv_lists)
def test_insert_missing_never_touches_existing_keys(spark, existing, incoming):
    e, i = _df(spark, existing), _df(spark, incoming)
    out = insert_missing(i, e, ["k"]).collect()
    ek = {k for k, _ in existing}
    assert all(r["k"] not in ek for r in out)
    # and replaying the merged state inserts nothing
    merged = e.unionByName(i.join(e.select("k"), ["k"], "left_anti"))
    assert insert_missing(i, merged, ["k"]).count() == 0


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(existing=kv_lists, incoming=kv_lists)
def test_upsert_is_last_writer_wins(spark, existing, incoming):
    # model: dict(existing) updated by dict(incoming); for duplicate keys
    # within one side the model keeps ONE of them — mirror by deduping inputs
    ex = {k: v for k, v in existing}
    inc = {k: v for k, v in incoming}
    e = _df(spark, list(ex.items()))
    i = _df(spark, list(inc.items()))
    got = {r["k"]: r["v"] for r in upsert(i, e, ["k"]).collect()}
    assert got == {**ex, **inc}
