"""Raster ↔ vector operators (north-rule family: "H3/S2 index,
point-in-polygon, kNN, raster↔vector").

- `rasterize_points` (vector → raster): aggregate a point table onto a
  regular lon/lat grid — one hash aggregation, map-side combined; the cell
  key doubles as the spatial partition key for the written raster.
- `polygonize_cells` (raster → vector): connected components of active
  cells (4-neighbourhood) via iterative min-label propagation — the
  standard distributed CC algorithm (label = min cell key reachable):
  each round joins the frontier against the edge list and keeps strictly
  smaller labels; rounds double the propagation radius, so it converges in
  O(log(component diameter)) shuffles. Output: one row per component with
  its bounding box and cell count (the vector feature).

Both are pure DataFrame plans (no UDFs); the DuckDB oracle for the CC uses
a recursive CTE over the same edge list (driver_queries.sql_polygonize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rasterize_points(
    points: DataFrame,
    res: float = 0.05,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """→ (cx, cy, n): count of points per res×res grid cell."""
    cx = F.floor(F.col(lon_col) / F.lit(res)).cast("long")
    cy = F.floor(F.col(lat_col) / F.lit(res)).cast("long")
    return (
        points.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _cell_key(cx, cy):
    # pack to a single orderable long (offset keeps negatives ordered)
    return (cx + F.lit(1 << 20)) * F.lit(1 << 21) + (cy + F.lit(1 << 20))


def polygonize_cells(raster: DataFrame, threshold: int = 1) -> DataFrame:
    """Active cells (n >= threshold) → connected components.

    Returns (component, n_cells, total_n, min_cx, max_cx, min_cy, max_cy)
    where `component` is the minimum packed cell key of the component."""
    from .graph import connected_components

    cells = raster.filter(F.col("n") >= threshold).select(
        "cx", "cy", "n", _cell_key(F.col("cx"), F.col("cy")).alias("k")
    ).persist()
    # 4-neighbourhood edge list (one orientation; CC mirrors it)
    a = cells.select("cx", "cy", F.col("k").alias("ka"))
    b = cells.select(F.col("cx").alias("bx"), F.col("cy").alias("by"), F.col("k").alias("kb"))
    right = a.join(b, (a.cx + 1 == b.bx) & (a.cy == b.by)).select("ka", "kb")
    up = a.join(b, (a.cx == b.bx) & (a.cy + 1 == b.by)).select("ka", "kb")
    edges = right.unionByName(up)

    labels = connected_components(
        cells.select("k"), edges, v_col="k", src_col="ka", dst_col="kb"
    )
    out = (
        cells.join(labels, cells.k == labels.v)
        .groupBy(F.col("component"))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n").alias("total_n"),
            F.min("cx").alias("min_cx"),
            F.max("cx").alias("max_cx"),
            F.min("cy").alias("min_cy"),
            F.max("cy").alias("max_cy"),
        )
    )
    # Materialize the (small: one row per component) summary before dropping
    # the cached inputs — unpersisting first would force a full recompute of
    # the whole propagation when the caller evaluates `out` later.
    out = out.persist()
    out.count()
    labels.unpersist()
    cells.unpersist()
    return out
