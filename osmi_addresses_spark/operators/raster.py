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
    cells = raster.filter(F.col("n") >= threshold).select(
        "cx", "cy", "n", _cell_key(F.col("cx"), F.col("cy")).alias("k")
    )
    # undirected 4-neighbourhood edge list (both directions materialized)
    a = cells.select("cx", "cy", F.col("k").alias("ka"))
    b = cells.select(F.col("cx").alias("bx"), F.col("cy").alias("by"), F.col("k").alias("kb"))
    right = a.join(b, (a.cx + 1 == b.bx) & (a.cy == b.by)).select("ka", "kb")
    up = a.join(b, (a.cx == b.bx) & (a.cy + 1 == b.by)).select("ka", "kb")
    edges = (
        right.unionByName(up)
        .unionByName(right.selectExpr("kb as ka", "ka as kb"))
        .unionByName(up.selectExpr("kb as ka", "ka as kb"))
    )
    edges = edges.persist()

    # iterative min-label propagation to fixpoint, with pointer jumping
    # (each round also adopts the label's own label) → O(log diameter)
    # rounds instead of O(diameter)
    labels = cells.select(F.col("k"), F.col("k").alias("lbl")).persist()
    while True:
        prop = (
            edges.join(labels, edges.ka == labels.k)
            .select(F.col("kb").alias("k"), F.col("lbl"))
        )
        jump = (
            labels.alias("x")
            .join(labels.alias("y"), F.col("x.lbl") == F.col("y.k"))
            .select(F.col("x.k").alias("k"), F.col("y.lbl").alias("lbl"))
        )
        new_labels = (
            labels.unionByName(prop)
            .unionByName(jump)
            .groupBy("k")
            .agg(F.min("lbl").alias("lbl"))
        )
        new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "k")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    out = (
        cells.join(labels, "k")
        .groupBy(F.col("lbl").alias("component"))
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
    # the cached edge list and final labels — unpersisting first would force
    # a full recompute of the whole propagation when the caller evaluates
    # `out` later, and leaving them cached leaks blocks for the session.
    out = out.persist()
    out.count()
    edges.unpersist()
    labels.unpersist()
    return out
