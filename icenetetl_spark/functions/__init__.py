from icenetetl_spark.functions.portable import davg, dsum, epoch_bucket, portable_hash64
from icenetetl_spark.functions.geo import cell_polygon_wkt, grid_spacing_expr

__all__ = ["davg", "dsum", "epoch_bucket", "portable_hash64", "cell_polygon_wkt", "grid_spacing_expr"]
