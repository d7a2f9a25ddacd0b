"""Slippy-map (web-mercator z/x/y) tile assignment and zoom-pyramid rollup
— the tiling half of the north rule's "spatial-join + tiling engine".

The reference serves its layers through MapServer WMS tiles
(/root/reference/mapserver/addresses.map); this module gives the analytic
counterpart: per-tile feature counts at a range of zoom levels, the input
to any tile-pyramid renderer or density heatmap.

Scale shape: points are tiled ONCE at the finest zoom (one hash
aggregation, map-side combined — shuffle bytes proportional to the
DISTINCT tile count, not the point count), then every base tile row is
exploded into its ancestor tiles (one row per zoom level, xt >> k) and
re-aggregated — the OLAP cube rollup pattern as a SINGLE plan with two
shuffles, the second over tile-count-sized input. The naive per-zoom
re-tiling re-scans and re-shuffles the full 100 TB point set once per
level, and a union-of-rolled-up-levels plan silently does the same
(each union branch's lineage recomputes the base aggregation unless it
is persisted); the ancestor-explode form computes the base exactly once
with no cache dependency.

Exactness: for t >= 0, floor(t / 2^k) == floor(t) >> k, so the rolled-up
tile index at zoom z-k is bit-identical to direct assignment at z-k (the
DuckDB oracle computes each level directly from the points; clamping to
[0, 2^z - 1] commutes with the shift for the same reason).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tile_xy(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """OSM slippy tile (xt, yt) at `zoom` for WGS84 lon/lat, clamped to
    the valid [0, 2^zoom - 1] range (poles / antimeridian edges). A null
    coordinate yields a null tile index (F.least/F.greatest skip nulls,
    so a bare clamp would silently map null rows to tile 2^zoom - 1)."""
    n = F.lit(float(1 << zoom))
    lat_r = F.radians(lat)
    xt = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n)
    yt = F.floor(
        (
            F.lit(1.0)
            - F.log(F.tan(lat_r) + F.lit(1.0) / F.cos(lat_r)) / F.lit(math.pi)
        )
        / F.lit(2.0)
        * n
    )
    hi = F.lit((1 << zoom) - 1)
    has_null = lon.isNull() | lat.isNull()

    def clamp(c: Column) -> Column:
        cc = F.greatest(F.lit(0).cast("long"), F.least(c.cast("long"), hi))
        return F.when(has_null, F.lit(None).cast("long")).otherwise(cc)

    return clamp(xt), clamp(yt)


def tile_bounds(zoom: int, x: int, y: int) -> tuple[float, float, float, float]:
    """(west, south, east, north) WGS84 extent of slippy tile zoom/x/y —
    the inverse of `tile_xy` (a point tiles into the tile whose bounds
    contain it; shared edges belong to both neighbours under the
    inclusive-bbox window-read semantics)."""
    if not (0 <= x < (1 << zoom) and 0 <= y < (1 << zoom)):
        raise ValueError(f"tile {x}/{y} out of range at zoom {zoom}")
    n = float(1 << zoom)
    west = x / n * 360.0 - 180.0
    east = (x + 1) / n * 360.0 - 180.0
    north = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * y / n))))
    south = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * (y + 1) / n))))
    return west, south, east, north


def tile_pyramid(
    points: DataFrame,
    zmin: int,
    zmax: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """→ (zoom, xt, yt, n): per-tile point counts for every zoom level in
    [zmin, zmax], built as one plan: tile at zmax, explode each base tile
    into its [zmin, zmax] ancestors (xt >> (zmax - zoom)), re-aggregate."""
    if not 0 <= zmin <= zmax:
        raise ValueError(f"bad zoom range [{zmin}, {zmax}]")
    xt, yt = tile_xy(F.col(lon_col), F.col(lat_col), zmax)
    base = (
        points.filter(F.col(lon_col).isNotNull() & F.col(lat_col).isNotNull())
        .select(xt.alias("xt"), yt.alias("yt"))
        .groupBy("xt", "yt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        base.select(
            F.explode(F.sequence(F.lit(zmin), F.lit(zmax))).alias("zoom"),
            "xt",
            "yt",
            "n",
        )
        .groupBy(
            "zoom",
            F.expr(f"shiftright(xt, {zmax} - zoom)").alias("xt"),
            F.expr(f"shiftright(yt, {zmax} - zoom)").alias("yt"),
        )
        .agg(F.sum("n").alias("n"))
        .select(
            F.col("zoom").cast("int").alias("zoom"),
            "xt",
            "yt",
            F.col("n").cast("long").alias("n"),
        )
    )
