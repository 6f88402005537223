"""The IceNet domain pipeline as a driver query (rows-only check: the
pipeline consumes synthesized IceNet-shaped fixtures, not the TPC-H tables,
so no DuckDB oracle — the operator-level twins in queries/core.py cover each
stage's relational semantics with full hash-matching instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from icenetetl_spark.plans.icenet import latest_view_plan
from icenetetl_spark.sources.fixtures import make_raw_file


def icenet_pipeline_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full chain on a deterministic fixture: normalize -> grid/WKT ->
    broadcast cell-assign -> latest snapshot -> enrich -> deterministic
    row_number. Rows-only (no oracle): the input is the synthesized
    melted-NetCDF fixture (seed-fixed), not a testdata table the oracle can
    see; each stage's relational semantics are hash-gated individually by
    the queries/core.py twins. sf_dir is unused."""
    raw, _ = make_raw_file(spark, "2024-03-01", "north", grid_side=16, seed=42)
    return latest_view_plan(raw, "north")


QUERIES = {"icenet_pipeline_latest": icenet_pipeline_latest}
ORACLES: dict = {}
