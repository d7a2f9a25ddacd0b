"""Hierarchical lat/lon grid cells (our H3/S2 stand-in; SURVEY.md §4).

Flat 0.02°×0.02° grid at the base resolution — chosen so that one cell is
never smaller than the reference's candidate radius (MAXDIST=0.01° in lat;
MAXDIST/cos(lat) in lon, < 0.02° for |lat|<60°). The street side registers a
*covering*: every cell intersecting its tolerance-padded bbox; the address
side joins on its single containing cell. This makes the (name, cell)
equi-join a strict superset of the reference's bbox±tolerance prefilter,
which is then re-applied exactly post-join.

Pure Column expressions — the covering runs JVM-side in whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

CELL_DEG = 0.02
# quantization slack: one int16 quantum (90/32767 lat, 180/32767 lon) plus
# float32 rounding headroom — the dequantized bbox can exceed the true bbox
# by at most this much per edge.
QLAT = 90.0 / 32767 + 1e-4
QLON = 180.0 / 32767 + 1e-4
_OFF = 16384
_K = 65536


def cell_of(lon: Column, lat: Column) -> Column:
    """Cell id of a point (bigint)."""
    cx = F.floor(lon / F.lit(CELL_DEG))
    cy = F.floor(lat / F.lit(CELL_DEG))
    return (cx + _OFF) * _K + (cy + _OFF)


def covering_cells(
    west: Column, east: Column, south: Column, north: Column, tol: float
) -> Column:
    """All cell ids a tolerance-padded bbox intersects (array<bigint>).

    The longitude pad uses cos at the most-polar latitude the padded bbox can
    reach, so it upper-bounds tol/cos(point_lat) for every accepted point.
    """
    pad_lat = F.lit(tol + QLAT)
    abs_lat = F.greatest(F.abs(south), F.abs(north)) + pad_lat
    abs_lat = F.least(abs_lat, F.lit(89.0))
    pad_lon = F.lit(tol) / F.cos(F.radians(abs_lat)) + F.lit(QLON)
    cx0 = F.floor((west - pad_lon) / F.lit(CELL_DEG))
    cx1 = F.floor((east + pad_lon) / F.lit(CELL_DEG))
    cy0 = F.floor((south - pad_lat) / F.lit(CELL_DEG))
    cy1 = F.floor((north + pad_lat) / F.lit(CELL_DEG))
    return F.flatten(
        F.transform(
            F.sequence(cx0, cx1),
            lambda cx: F.transform(F.sequence(cy0, cy1), lambda cy: (cx + _OFF) * _K + (cy + _OFF)),
        )
    )


def cell_of_py(lon: float, lat: float) -> int:
    return (math.floor(lon / CELL_DEG) + _OFF) * _K + (math.floor(lat / CELL_DEG) + _OFF)
