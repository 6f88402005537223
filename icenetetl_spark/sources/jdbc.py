"""Live-database sources — the reference's Postgres table scan (S4,
processor.py:296-303: ``pd.io.sql.read_sql_query`` over a projection),
distributed two ways:

- :func:`read_jdbc_table`: Spark's built-in JDBC source (projection +
  predicate pushdown, range-partitioned parallel read). Needs a JDBC
  driver jar, which this environment lacks — thin wrapper documenting the
  production path.
- :func:`read_dbapi_table`: the SAME range-partitioning semantics over any
  Python DB-API connection — and the stdlib ships a real database
  (sqlite3), so this path is fully TESTED here. Each Spark task opens its
  own connection and issues one range query (col >= lo AND col < hi, the
  Spark JDBC partition predicate shape, NULLs routed to the first
  partition), with the column projection and an optional residual WHERE
  pushed into the generated SQL — the database scans its own index instead
  of shipping the table. At cluster scale this is how a fleet of executors
  drains a warehouse table without a lake export.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """e.g. url='jdbc:postgresql://host/db', table='north_cell' (or a
    '(SELECT ...) t' pushdown subquery, mirroring the reference's 3-column
    projection)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def range_predicates(
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
) -> list[str]:
    """The Spark JDBC partition predicates (JDBCRelation.columnPartition
    semantics, public Spark source): ``num_partitions`` WHERE clauses whose
    union covers every row exactly once — interior strides are half-open
    ``[lo, hi)``; the FIRST partition is unbounded below and also claims
    NULLs; the LAST is unbounded above (bounds only steer skew, they never
    filter)."""
    if num_partitions <= 1:
        return ["1=1"]
    stride = max(1, (upper_bound - lower_bound) // num_partitions)
    c = partition_column
    preds = []
    lo = lower_bound + stride
    preds.append(f"{c} < {lo} OR {c} IS NULL")
    for _ in range(num_partitions - 2):
        preds.append(f"{c} >= {lo} AND {c} < {lo + stride}")
        lo += stride
    preds.append(f"{c} >= {lo}")
    return preds


def read_dbapi_table(
    spark: SparkSession,
    connect: Callable[[], object],
    table: str,
    schema: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 8,
    columns: Sequence[str] | None = None,
    where: str | None = None,
) -> DataFrame:
    """Range-partitioned parallel read over a DB-API connection.

    ``connect`` is a zero-arg picklable factory (e.g.
    ``functools.partial(sqlite3.connect, path)``); every task opens its own
    connection — connections never cross process boundaries. ``schema`` is
    the result's Spark DDL string (DB-API cursors don't carry reliable
    types). ``columns``/``where`` are pushed into the generated SQL, so
    projection and filtering happen IN the database.

    Plan shape: one row per partition predicate with EXACTLY one row per
    task — ``spark.range(n, numPartitions=n)`` slices [0, n) into n
    contiguous one-element partitions by construction (a hash
    ``repartition`` on the pid would birthday-collide several range
    queries into one task and leave others empty, serializing those
    scans), then mapInPandas streams each range's rows through Arrow in
    chunks — the table itself never touches the driver, and there is no
    exchange anywhere in the plan."""
    import pandas as pd

    preds = range_predicates(
        partition_column, lower_bound, upper_bound, num_partitions
    )
    proj = ", ".join(columns) if columns else "*"
    residual = f" AND ({where})" if where else ""
    queries = [
        f"SELECT {proj} FROM {table} WHERE ({p}){residual}" for p in preds
    ]

    def read_partition(batches):
        for pdf in batches:
            for q in pdf["q"]:
                con = connect()
                try:
                    for chunk in pd.read_sql_query(str(q), con, chunksize=65536):
                        yield chunk
                finally:
                    con.close()

    qarr = F.array(*[F.lit(q) for q in queries])
    spec = spark.range(0, len(queries), 1, len(queries)).select(
        F.element_at(qarr, (F.col("id") + 1).cast("int")).alias("q")
    )
    return spec.mapInPandas(read_partition, schema)
