"""icenetetl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of
alan-turing-institute/IceNetETL (reference at /root/reference, read-only)
on Apache Spark: DataFrame/SQL logical plans, Catalyst/Tungsten physical
execution, a Parquet table layer with MERGE-style upsert semantics, and a
Structured Streaming shell over the same batch core.

Subpackages
-----------
- ``sources``    : parquet/testdata loaders, binary-file ingest, NetCDF reader
                   (gated behind optional xarray import)
- ``operators``  : relational operators (filters/joins/aggs/windows/upserts)
                   plus LLM-data-pipeline operators (dedup, similarity search,
                   text analysis, multimodal columns)
- ``functions``  : portable column expressions (grid/WKT geometry, portable
                   hashing, decimal-exact aggregation)
- ``plans``      : the end-to-end IceNet ingest pipeline (load -> geometry ->
                   forecasts -> latest -> meta), per reference
                   azfunctions/InputBlobTrigger/__init__.py:22-26
- ``streaming``  : Structured Streaming wrapper (file trigger ≙ blob trigger,
                   foreachBatch runs the batch pipeline), per reference
                   azfunctions/InputBlobTrigger/function.json:4-10
"""

__version__ = "0.1.0"
