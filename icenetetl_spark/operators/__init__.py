from icenetetl_spark.operators.relational import (
    insert_missing,
    latest_snapshot,
    rename_normalize,
    upsert,
)

__all__ = ["insert_missing", "latest_snapshot", "rename_normalize", "upsert"]
