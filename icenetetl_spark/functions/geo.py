"""Grid-cell geometry as pure column arithmetic — zero geo dependencies.

The reference builds one square polygon per grid cell with shapely
(processor.py:218-236: centroid ± half the mean grid step, 5-point closed
ring) and serializes to WKT (processor.py:236); PostGIS then parses and
reprojects it (processor.py:252). Geometry is never filtered or computed on
afterwards — it is constructed, stored, and returned — so a WKT string column
plus an SRID column reproduces the full semantics without shapely/Sedona.

Reprojection to EPSG:4326 (processor.py:252, ST_Transform) is implemented in
``icenetetl_spark.functions.reproject`` as a vectorized numpy pandas_udf of
the inverse Lambert azimuthal equal-area mapping (public formulas; Snyder,
"Map Projections: A Working Manual", USGS PP 1395, 1987).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def grid_spacing_expr(col: Column | str) -> Column:
    """Mean grid step over a column of *distinct* centroid coordinates:
    ``(max - min) / (count - 1)`` — reference utils.py:47-48.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.max(c) - F.min(c)).cast("double") / (F.count(c) - F.lit(1))


def cell_polygon_wkt(cx: Column, cy: Column, half_step: Column) -> Column:
    """Closed 5-point square ring WKT around an integer centroid.

    Ring order matches reference processor.py:227-235:
    (x-d, y+d) -> (x+d, y+d) -> (x+d, y-d) -> (x-d, y-d) -> close.
    Oracle twin uses printf with the same %d ordering.
    """
    d = half_step.cast("long")
    xmin, xmax = (cx.cast("long") - d), (cx.cast("long") + d)
    ymin, ymax = (cy.cast("long") - d), (cy.cast("long") + d)
    return F.format_string(
        "POLYGON((%d %d, %d %d, %d %d, %d %d, %d %d))",
        xmin, ymax, xmax, ymax, xmax, ymin, xmin, ymin, xmin, ymax,
    )


def build_cell_grid(centroids_x: DataFrame, centroids_y: DataFrame) -> DataFrame:
    """Cross-join two 1-column centroid DataFrames (cols ``centroid_x`` /
    ``centroid_y``) into the full grid with polygon WKT — reference
    processor.py:222-236 (nested Python loops) re-expressed as a relational
    cross join of two tiny distinct-value frames.

    Scale note: both inputs are O(grid-side) rows (~432 each for EASE2), the
    product is ~187k rows — the y side is bounded by construction (distinct
    axis values), so it is PINNED with an explicit F.broadcast: the plan is
    BroadcastNestedLoopJoin by design, not by the planner's size estimate,
    and cannot degrade to CartesianProduct when the estimate grows (the
    centroids come from a filtered scan of a table that scales with data).
    No shuffle either way.
    """
    sx = centroids_x.agg(grid_spacing_expr("centroid_x").alias("step_x"))
    sy = centroids_y.agg(grid_spacing_expr("centroid_y").alias("step_y"))
    grid = (
        centroids_x.crossJoin(F.broadcast(centroids_y))
        .crossJoin(F.broadcast(sx))
        .crossJoin(F.broadcast(sy))
    )
    half = ((F.col("step_x") + F.col("step_y")) / 2 / 2)
    return grid.select(
        F.col("centroid_x").cast("int").alias("centroid_x"),
        F.col("centroid_y").cast("int").alias("centroid_y"),
        cell_polygon_wkt(F.col("centroid_x"), F.col("centroid_y"), half).alias(
            "geom_laea_wkt"
        ),
        half.cast("long").alias("half_step"),
    )
