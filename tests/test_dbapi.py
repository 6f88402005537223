"""Range-partitioned DB-API source (sources/jdbc.py): the Spark JDBC
partition semantics over a real stdlib database (sqlite3)."""

from __future__ import annotations

import functools
import sqlite3

import pytest
from pyspark.sql import functions as F

from icenetetl_spark.sources.jdbc import range_predicates, read_dbapi_table


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("db") / "t.sqlite")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (k INTEGER, grp TEXT, v REAL)")
    rows = [
        (None if i % 53 == 0 else i, f"g{i % 5}", float(i) / 7) for i in range(1000)
    ]
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    con.commit()
    con.close()
    return path


def test_range_predicates_partition_exactly():
    """Union covers every integer exactly once: interior strides half-open,
    first unbounded below + NULLs, last unbounded above — including values
    OUTSIDE the declared bounds (bounds steer skew, never filter)."""
    preds = range_predicates("k", 0, 100, 4)
    assert len(preds) == 4
    assert preds[0].endswith("k IS NULL")
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE t (k INTEGER)")
    values = [None, -50, 0, 24, 25, 49, 50, 74, 75, 99, 100, 10_000]
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    seen = []
    for p in preds:
        seen += [r[0] for r in con.execute(f"SELECT k FROM t WHERE {p}")]
    assert sorted(x for x in seen if x is not None) == sorted(
        x for x in values if x is not None
    )
    assert seen.count(None) == 1


def test_dbapi_read_matches_database(spark, db):
    got = read_dbapi_table(
        spark,
        functools.partial(sqlite3.connect, db),
        "t",
        "k long, grp string, v double",
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=8,
    )
    assert got.rdd.getNumPartitions() == 8
    assert got.count() == 1000  # NULL keys included, nothing lost/duplicated
    assert got.filter(F.col("k").isNull()).count() == 1000 // 53 + 1
    direct = sqlite3.connect(db).execute(
        "SELECT COUNT(*), SUM(v) FROM t"
    ).fetchone()
    agg = got.agg(F.count(F.lit(1)), F.sum("v")).collect()[0]
    # float SUM is order-sensitive in the last ulp and the distributed
    # combine order differs from sqlite's sequential scan — ulp-scale
    # tolerance, not exactness, is the correct contract here
    assert agg[0] == direct[0] and agg[1] == pytest.approx(direct[1], rel=1e-12)


def test_dbapi_pushdown_projection_and_where(spark, db):
    got = read_dbapi_table(
        spark,
        functools.partial(sqlite3.connect, db),
        "t",
        "k long, v double",
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
        columns=["k", "v"],
        where="grp = 'g1'",
    )
    assert got.columns == ["k", "v"]
    want = sqlite3.connect(db).execute(
        "SELECT COUNT(*) FROM t WHERE grp = 'g1'"
    ).fetchone()[0]
    assert got.count() == want


def test_each_task_owns_exactly_one_range_query(spark, db):
    """The parallelism claim itself: every task must carry exactly ONE
    range query (spark.range slices, not a hash repartition — hashing 8
    pids into 8 partitions birthday-collides several queries into one
    task and leaves others empty, serializing those scans; and
    getNumPartitions()==8 alone cannot see that)."""
    got = read_dbapi_table(
        spark,
        functools.partial(sqlite3.connect, db),
        "t",
        "k long, grp string, v double",
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=8,
    )
    per_task = sorted(
        got.withColumn("part", F.spark_partition_id())
        .groupBy("part")
        .count()
        .toPandas()["part"]
    )
    # every one of the 8 partitions produced rows => no task got 0 or 2+
    # range queries (each range of this table is non-empty)
    assert per_task == list(range(8))


def test_scan_plan_has_no_exchange(spark, db):
    """spark.range already lays one query per partition — a shuffle
    between the spec and the mapInPandas scan would be pure overhead (and
    at cluster scale, a needless barrier before the parallel reads)."""
    got = read_dbapi_table(
        spark,
        functools.partial(sqlite3.connect, db),
        "t",
        "k long, grp string, v double",
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=8,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_single_partition_reads_everything(spark, db):
    got = read_dbapi_table(
        spark,
        functools.partial(sqlite3.connect, db),
        "t",
        "k long, grp string, v double",
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=1,
    )
    assert got.count() == 1000
