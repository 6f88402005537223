"""JDBC source — the literal mapping of the reference's Postgres table scan
(S4, processor.py:296-303: ``pd.io.sql.read_sql_query`` over a projection).

Spark's JDBC source pushes the projection and simple predicates to the
database and parallelizes the read by range-partitioning on a numeric
column — the distributed version of the reference's single-connection read.
No database ships in this environment, so this module is a thin, untested
wrapper documenting the production path; the engine's own table layer
(catalog.py) is the primary store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
