"""CLI entry point — parity with the reference's manual local run
(local.py:27-39: ``python local.py <file.nc>`` drives the same pipeline the
trigger does). Here:

    python -m icenetetl_spark ingest FILE.parquet --warehouse WH \
        [--hemisphere north|south] [--keywords "..."] [--incremental-meta]
    python -m icenetetl_spark query NAME [--sf-dir DIR] [--limit N]
    python -m icenetetl_spark sql "SELECT ..." [--sf-dir DIR] [--limit N]
    python -m icenetetl_spark list

``ingest`` accepts a long-form parquet drop (the Parquet landing-zone path),
a ``.nc`` file (sources.netcdf: xarray when installed, else the built-in
NetCDF-3 classic parser), or a Zarr v2 directory store (sources.zarrstore,
detected by its ``.zgroup``). For ``.nc``/Zarr input the hemisphere is read
from the dataset's own global attributes when ``--hemisphere`` is not
given — the same routing the reference's trigger performs
(processor.py:137-153).
"""

from __future__ import annotations

import argparse
import sys


def _spark():
    from icenetetl_spark.session import get_spark

    return get_spark("icenetetl-cli")


def cmd_ingest(args: argparse.Namespace) -> int:
    from icenetetl_spark.catalog import ParquetCatalog
    from icenetetl_spark.functions.progress import StageTimer
    from icenetetl_spark.plans.icenet import FileAttrs, IceNetPipeline
    from icenetetl_spark.sources.netcdf import melt_netcdf_files, read_binary_files

    import os

    spark = _spark()
    attrs = None
    if os.path.isdir(args.file) and os.path.exists(
        os.path.join(args.file, ".zgroup")
    ):
        from icenetetl_spark.sources.netcdf import file_attrs_from_mapping
        from icenetetl_spark.sources.zarrstore import melt_zarr_stores, read_zarr

        raw = melt_zarr_stores(spark, [args.file])
        if not args.hemisphere:
            attrs = file_attrs_from_mapping(read_zarr(args.file).attrs)
            if args.keywords:
                attrs.keywords = args.keywords
    elif args.file.endswith(".nc"):
        raw = melt_netcdf_files(read_binary_files(spark, args.file, glob="*"))
        if not args.hemisphere:
            from icenetetl_spark.sources.netcdf import file_attrs

            # header-only routing: a bounded prefix covers any realistic
            # classic header; fall back to the full file if it doesn't
            with open(args.file, "rb") as f:
                prefix = f.read(8 << 20)
            file_was_larger = len(prefix) == (8 << 20)
            try:
                attrs = file_attrs(prefix)
            except Exception:
                # Retry with the whole file ONLY when the prefix was
                # genuinely partial (the file is larger than what we
                # read) — then ANY parse error may be prefix-shaped,
                # whatever its message (the classic reader says
                # "truncated", but xarray backends raise arbitrary
                # reshape/backend errors on cut-off bytes). If the prefix
                # already covered the whole file, the full read cannot
                # differ — propagate instead of re-reading to fail again.
                if not file_was_larger:
                    raise
                with open(args.file, "rb") as f:
                    attrs = file_attrs(f.read())
            if args.keywords:
                # explicit --keywords wins over the file's own: it exists
                # to disambiguate files whose attrs are missing/ambiguous
                attrs.keywords = args.keywords
    else:
        raw = spark.read.parquet(args.file)
    if attrs is None:
        attrs = FileAttrs(
            geospatial_lat_max=85.0 if args.hemisphere == "north" else None,
            geospatial_lat_min=-85.0 if args.hemisphere == "south" else None,
            keywords=args.keywords or "",
        )
    timer = StageTimer()
    timer.start("ingest")
    if args.txn:
        from icenetetl_spark.plans.icenet import make_txn_catalog

        catalog = make_txn_catalog(spark, args.warehouse)
    else:
        catalog = ParquetCatalog(spark, args.warehouse)
    pipeline = IceNetPipeline(catalog)
    pipeline.run(raw, attrs, incremental_meta=args.incremental_meta)
    n = pipeline.catalog.read("forecasts").count()
    timer.finish("ingest", n_records=n)
    print(f"forecasts table now holds {n:,} rows")
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from icenetetl_spark.queries import all_queries

    queries = all_queries()
    if args.name not in queries:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    spark = _spark()
    df = queries[args.name](spark, args.sf_dir)
    df.show(args.limit, truncate=False)
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    """Ad-hoc ANSI SQL over the testdata tables (registered as temp views) —
    the migration path for users bringing their own SQL: the same statements
    the oracle gate proves portable run here verbatim through Catalyst."""
    from icenetetl_spark.sources.testdata import register_views

    spark = _spark()
    register_views(spark, args.sf_dir)
    df = spark.sql(args.statement)
    df.show(args.limit, truncate=False)
    return 0


def cmd_list(args: argparse.Namespace) -> int:
    from icenetetl_spark.queries import all_oracles, all_queries

    oracles = all_oracles()
    for name in sorted(all_queries()):
        kind = "oracle" if name in oracles else "rows-only"
        print(f"{name:28s} [{kind}]")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="icenetetl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="run the five-stage pipeline on a file")
    pi.add_argument("file")
    pi.add_argument("--warehouse", required=True)
    pi.add_argument("--hemisphere", choices=["north", "south"], default=None)
    pi.add_argument("--keywords", default="")
    pi.add_argument("--incremental-meta", action="store_true")
    pi.add_argument(
        "--txn",
        action="store_true",
        help="write through the manifest-logged TxnParquetCatalog "
        "(concurrent-writer-safe commits) instead of the plain "
        "directory-swap catalog",
    )
    pi.set_defaults(fn=cmd_ingest)

    pq = sub.add_parser("query", help="run a named query")
    pq.add_argument("name")
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq.add_argument("--limit", type=int, default=20)
    pq.set_defaults(fn=cmd_query)

    ps = sub.add_parser("sql", help="run ad-hoc SQL over the testdata views")
    ps.add_argument("statement")
    ps.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ps.add_argument("--limit", type=int, default=20)
    ps.set_defaults(fn=cmd_sql)

    pl = sub.add_parser("list", help="list registered queries")
    pl.set_defaults(fn=cmd_list)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
