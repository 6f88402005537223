"""Query registry: every implemented operator exposed as a named query over
the driver testdata, each (where SQL-expressible) paired with a DuckDB oracle.

Modules contribute ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLES: dict[str, str]``; this package merges them for
``__spark_entry__``.
"""

from __future__ import annotations

from icenetetl_spark.queries import (
    analytics,
    core,
    dedup,
    events,
    extended,
    headline,
    icenet,
    multimodal,
    similarity,
    text,
)

_MODULES = [
    core, headline, extended, analytics, events, dedup, text, similarity,
    multimodal, icenet,
]


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
