"""Live-database scan under the driver's hash gate (reference S4,
azfunctions/InputBlobTrigger/processor.py:296-303: a 3-column projection
read straight from the warehouse database).

No JDBC driver jar ships here, but the stdlib ships a REAL database —
sqlite3 — so the range-partitioned DB-API source (sources/jdbc.py) can be
exercised end to end: a deterministic generator writes the SAME rows to a
sqlite database file (what Spark scans, 8 parallel range queries) and a
parquet twin (what the DuckDB oracle reads) — the icenet fixture pattern
applied to a database. A partitioning bug (row lost/duplicated at a stride
boundary, NULL routing, projection/filter pushdown drift) changes the
value hash and fails the gate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

N_ROWS = 4000
_COLS = "id BIGINT, hemisphere STRING, centroid_x BIGINT, centroid_y BIGINT, area DOUBLE"


def _make_rows() -> list[tuple]:
    """Deterministic cells-like rows: id is the range-partition column
    (dense, but the read must not assume density); centroid_y carries
    NULLs every 37th row so null handling crosses the scan."""
    rows = []
    for i in range(N_ROWS):
        hemi = "north" if i % 2 == 0 else "south"
        cx = (i * 25_000) % 1_000_000 - 400_000
        cy = None if i % 37 == 0 else ((i * 7_919) % 800_000 - 300_000)
        area = float((i % 640) * 2.5)
        rows.append((i, hemi, cx, cy, area))
    return rows


def ensure_db_fixture() -> tuple[str, str]:
    """Materialize the sqlite database and its parquet twin (atomic
    tmp+rename per file; content-addressed paths so a generator edit can
    never silently reuse stale fixtures). DB_PATH/_TWIN_PATH are module
    globals resolved at call time — they are derived from a fingerprint
    that hashes THIS function's source, so they must be assigned after it
    is defined."""
    import sqlite3

    import pandas as pd

    os.makedirs(_BASE, exist_ok=True)
    rows = _make_rows()
    if not os.path.exists(DB_PATH):
        tmp = f"{DB_PATH}.tmp-{os.getpid()}"
        if os.path.exists(tmp):
            os.unlink(tmp)
        con = sqlite3.connect(tmp)
        con.execute(
            "CREATE TABLE cells (id INTEGER PRIMARY KEY, hemisphere TEXT, "
            "centroid_x INTEGER, centroid_y INTEGER, area REAL)"
        )
        con.executemany("INSERT INTO cells VALUES (?,?,?,?,?)", rows)
        con.commit()
        con.close()
        os.replace(tmp, DB_PATH)
    if not os.path.exists(_TWIN_PATH):
        tmp = f"{_TWIN_PATH}.tmp-{os.getpid()}"
        pdf = pd.DataFrame(
            rows, columns=["id", "hemisphere", "centroid_x", "centroid_y", "area"]
        )
        # sqlite INTEGER -> int64; centroid_y has NULLs -> nullable Int64
        pdf["centroid_y"] = pdf["centroid_y"].astype("Int64")
        pdf.to_parquet(tmp, engine="pyarrow", index=False)
        os.replace(tmp, _TWIN_PATH)
    return DB_PATH, _TWIN_PATH


def _fingerprint() -> str:
    """Content-addresses the fixture paths. Hashes the WRITER too
    (ensure_db_fixture) — an edit to the CREATE TABLE schema or the twin's
    dtype handling must rotate the paths, or the exists-checks would
    silently reuse stale files built by the old writer."""
    import hashlib
    import inspect

    src = (
        inspect.getsource(_make_rows)
        + inspect.getsource(ensure_db_fixture)
        + f"|{N_ROWS}"
    )
    return hashlib.md5(src.encode()).hexdigest()[:8]


_BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".fixtures",
)
DB_PATH = os.path.join(_BASE, f"cellsdb_{_fingerprint()}.sqlite")
_TWIN_PATH = os.path.join(_BASE, f"cellsdb_{_fingerprint()}.parquet")


def db_scan_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-way range-partitioned scan of the sqlite fixture with the
    projection AND the filter pushed into the database (each task's SQL
    carries both), then a per-hemisphere rollup so the gate also covers
    the post-scan shuffle. sf_dir unused (the input is the database
    fixture)."""
    import functools
    import sqlite3

    from pyspark.sql import functions as F

    from icenetetl_spark.sources.jdbc import read_dbapi_table

    db, _ = ensure_db_fixture()
    scanned = read_dbapi_table(
        spark,
        functools.partial(sqlite3.connect, db),
        "cells",
        "id long, hemisphere string, centroid_x long, centroid_y long",
        partition_column="id",
        lower_bound=0,
        upper_bound=N_ROWS,
        num_partitions=8,
        columns=["id", "hemisphere", "centroid_x", "centroid_y"],
        where="centroid_x >= 0",
    )
    return scanned.groupBy("hemisphere").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("centroid_x").alias("sum_x"),
        F.sum("centroid_y").alias("sum_y"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


def db_incremental_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core ingest loop (pull -> dedup-upsert -> read back,
    processor.py:296-333) run INCREMENTALLY from the database: batch 1
    pulls ids below a cutoff into a fresh txn catalog, a high-watermark
    (one 1-row MAX aggregate — partition metadata, not data, on the
    driver) steers batch 2 to ``id >= watermark`` — deliberately
    RE-READING the boundary row so the anti-join dedup
    (txn.append_missing, ON CONFLICT DO NOTHING semantics) is exercised
    under the gate: a duplicated or lost boundary row changes n_rows and
    every sum. The oracle is a straight rollup of the parquet twin — the
    sync must reconstruct the full table exactly, whatever the batch
    boundaries. area values are k*2.5 (exactly representable), so the
    float SUM is order-independent and hash-stable. sf_dir unused (the
    input is the database fixture)."""
    import functools
    import shutil
    import sqlite3

    from pyspark.sql import functions as F

    from icenetetl_spark.sources.jdbc import read_dbapi_table
    from icenetetl_spark.txn import TxnParquetCatalog

    db, _ = ensure_db_fixture()
    # Fingerprint-keyed warehouse, wiped at entry: the harness calls each
    # query several times per round (plan audit, warmup, measured runs) —
    # a fresh mkdtemp per call would leak a table copy every invocation.
    wh = os.path.join("/tmp", f"dbsync-{_fingerprint()}")
    shutil.rmtree(wh, ignore_errors=True)
    schema = (
        "id long, hemisphere string, centroid_x long, centroid_y long, "
        "area double"
    )
    pull = functools.partial(
        read_dbapi_table,
        spark,
        functools.partial(sqlite3.connect, db),
        "cells",
        schema,
        partition_column="id",
        lower_bound=0,
        upper_bound=N_ROWS,
        num_partitions=4,
    )
    cat = TxnParquetCatalog(spark, wh)
    cutoff = N_ROWS // 2
    cat.append_missing(
        "cells_sync", pull(where=f"id < {cutoff}"), ["id"], stats_cols=["id"]
    )
    wm = cat.read("cells_sync").agg(F.max("id")).collect()[0][0]
    cat.append_missing(
        "cells_sync", pull(where=f"id >= {wm}"), ["id"], stats_cols=["id"]
    )
    return cat.read("cells_sync").groupBy("hemisphere").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("area").alias("sum_area"),
        F.sum("centroid_y").alias("sum_y"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


QUERIES = {
    "db_scan_cells": db_scan_cells,
    "db_incremental_sync": db_incremental_sync,
}

ORACLES = {
    "db_scan_cells": f"""
        SELECT hemisphere,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(centroid_x) AS BIGINT) AS sum_x,
               CAST(SUM(centroid_y) AS BIGINT) AS sum_y,
               CAST(MIN(id) AS BIGINT) AS min_id,
               CAST(MAX(id) AS BIGINT) AS max_id
        FROM read_parquet('{_TWIN_PATH}')
        WHERE centroid_x >= 0
        GROUP BY hemisphere
    """,
    "db_incremental_sync": f"""
        SELECT hemisphere,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(area) AS DOUBLE) AS sum_area,
               CAST(SUM(centroid_y) AS BIGINT) AS sum_y,
               CAST(MIN(id) AS BIGINT) AS min_id,
               CAST(MAX(id) AS BIGINT) AS max_id
        FROM read_parquet('{_TWIN_PATH}')
        GROUP BY hemisphere
    """,
}

# Best-effort at import so the oracle's twin exists even if the driver runs
# the SQL before the Spark query (the icenet fixture pattern). Kept
# non-fatal for read-only/degraded checkouts: sqlite raises
# sqlite3.OperationalError (NOT an OSError) on an unwritable database file,
# and a failure here must not take down the whole query registry — the
# query call re-attempts and raises with the real error there.
try:
    ensure_db_fixture()
except Exception:
    pass
