"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship query (longest operator chain) on sf0.001.
``queries`` — one named query per implemented operator (SURVEY.md §2 +
              LLM-data-pipeline extensions), each (spark, sf_dir) -> DataFrame.
``oracle_sql`` — DuckDB twins; every aggregate/computed column is aliased
              identically on both sides (driver sorts columns by name and
              hash-compares values).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Robust against being imported by file path (spec/exec) rather than as a
# module: make the repo root importable before pulling in the package.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from icenetetl_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q3-shaped join+agg+top-k chain on sf0.001."""
    from icenetetl_spark.queries.headline import q3_top_revenue

    return q3_top_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
