"""Column-expression geometry — JVM-side (whole-stage codegen), no UDFs.

These mirror the numpy kernels in geom_np.py; tests cross-check them
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

INT16_MAX = 32767
BIG = 1e308


def f32(c: Column) -> Column:
    return c.cast("float")


# ----------------------------------------------------------- int16 bbox ops
def lat2int16(lat: Column, increment: bool) -> Column:
    """osmi/GeometryHelper.hpp:96-103 (double math, then ceil/floor)."""
    v = lat * F.lit(float(INT16_MAX)) / F.lit(90.0)
    return (F.ceil(v) if increment else F.floor(v)).cast("int")


def lon2int16(lon: Column, increment: bool) -> Column:
    v = lon * F.lit(float(INT16_MAX)) / F.lit(180.0)
    return (F.ceil(v) if increment else F.floor(v)).cast("int")


def int162lat(v: Column) -> Column:
    """float32 arithmetic chain: float(v)*90/32767."""
    return f32(f32(v) * f32(F.lit(90.0)) / f32(F.lit(float(INT16_MAX))))


def int162lon(v: Column) -> Column:
    return f32(f32(v) * f32(F.lit(180.0)) / f32(F.lit(float(INT16_MAX))))


def is_point_near_bbox(
    bbox_n: Column, bbox_e: Column, bbox_s: Column, bbox_w: Column,
    lon: Column, lat: Column, tol: float,
) -> Column:
    """Exact replica of osmi/GeometryHelper.hpp:127-152 incl. float32 types
    (see geom_np.is_point_near_bbox for the promotion analysis)."""
    latf = f32(lat)
    lonf = f32(lon)
    n = int162lat(bbox_n)
    e = int162lon(bbox_e)
    s = int162lat(bbox_s)
    w = int162lon(bbox_w)
    tolf = f32(F.lit(tol))
    rad = f32(latf.cast("double") * F.lit(3.141592653589793238462) / F.lit(180.0))
    c = F.cos(rad.cast("double"))
    lat_hi = f32(n + tolf)  # float32 add
    lat_lo = f32(s - tolf)
    return (
        (latf < lat_hi)
        & (latf > lat_lo)
        & (lonf.cast("double") < e.cast("double") + tolf.cast("double") / c)
        & (lonf.cast("double") > w.cast("double") - tolf.cast("double") / c)
    )


# ------------------------------------------------------------- distances
def min_vertex_dist(coords: Column, plon: Column, plat: Column) -> Column:
    """Min euclidean degree-space distance from point to way vertices
    (osmi/ConnectionLinePreprocessor.hpp:266-267) — F.aggregate, JVM-side.

    Computed as sqrt(min(squared)) — identical ordering to the reference's
    per-vertex sqrt (sqrt is monotone).
    """
    min_sq = F.aggregate(
        coords,
        F.lit(BIG),
        lambda acc, c: F.least(
            acc, (c["lon"] - plon) * (c["lon"] - plon) + (c["lat"] - plat) * (c["lat"] - plat)
        ),
    )
    return F.sqrt(min_sq)


def point_dist(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    return F.sqrt((lon1 - lon2) * (lon1 - lon2) + (lat1 - lat2) * (lat1 - lat2))


# ------------------------------------------------------------- bbox of way
def bbox_struct(coords: Column) -> Column:
    """min/max fold over vertices (osmi/GeometryHelper.hpp:71-94)."""
    return F.struct(
        F.aggregate(coords, F.lit(-BIG), lambda a, c: F.greatest(a, c["lat"])).alias("north"),
        F.aggregate(coords, F.lit(-BIG), lambda a, c: F.greatest(a, c["lon"])).alias("east"),
        F.aggregate(coords, F.lit(BIG), lambda a, c: F.least(a, c["lat"])).alias("south"),
        F.aggregate(coords, F.lit(BIG), lambda a, c: F.least(a, c["lon"])).alias("west"),
    )


def is_closed(refs: Column) -> Column:
    """first ref == last ref (osmi/GeometryHelper.hpp:63-69)."""
    return F.element_at(refs, 1) == F.element_at(refs, -1)


def nonzero_length(coords: Column) -> Column:
    """≥2 vertices ∧ any vertex differs from the first
    (osmi/GeometryHelper.hpp:154-167)."""
    first = F.element_at(coords, 1)
    return (F.size(coords) >= 2) & F.exists(
        coords, lambda c: (c["lat"] != first["lat"]) | (c["lon"] != first["lon"])
    )


def centroid_cols(coords: Column) -> Column:
    """Area-weighted centroid of a closed ring (osmi/GeometryHelper.hpp:31-41
    → OGR/GEOS Centroid), as a pure Column expression (left-to-right fold,
    matching the python oracle's sequential sum).

    Zero-area rings fall back to the length-weighted boundary midpoint
    (GEOS behavior for collapsed polygons); zero-length falls back to the
    first vertex. Assumes coords already closed (first == last), which holds
    for rings assembled from closed ways.
    """
    n = F.size(coords)
    a = F.slice(coords, 1, n - 1)
    b = F.slice(coords, 2, n - 1)
    terms = F.zip_with(
        a,
        b,
        lambda p, q: F.struct(
            (p["lon"] * q["lat"] - q["lon"] * p["lat"]).alias("cross"),
            ((p["lon"] + q["lon"]) * (p["lon"] * q["lat"] - q["lon"] * p["lat"])).alias("cx"),
            ((p["lat"] + q["lat"]) * (p["lon"] * q["lat"] - q["lon"] * p["lat"])).alias("cy"),
            F.sqrt(
                (q["lon"] - p["lon"]) * (q["lon"] - p["lon"])
                + (q["lat"] - p["lat"]) * (q["lat"] - p["lat"])
            ).alias("seg"),
            ((p["lon"] + q["lon"]) / F.lit(2.0)).alias("mx"),
            ((p["lat"] + q["lat"]) / F.lit(2.0)).alias("my"),
        ),
    )
    a2 = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t["cross"])
    cx = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t["cx"])
    cy = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t["cy"])
    tot = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t["seg"])
    wx = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t["mx"] * t["seg"])
    wy = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t["my"] * t["seg"])
    first = F.element_at(coords, 1)
    lon = (
        F.when(a2 != 0.0, cx / (F.lit(3.0) * a2))
        .when(tot != 0.0, wx / tot)
        .otherwise(first["lon"])
    )
    lat = (
        F.when(a2 != 0.0, cy / (F.lit(3.0) * a2))
        .when(tot != 0.0, wy / tot)
        .otherwise(first["lat"])
    )
    return F.struct(lon.alias("lon"), lat.alias("lat"))


def fmt_id(c: Column) -> Column:
    """Reference formats ids into string fields via SetField(double(id))
    (e.g. osmi/NodesWithAddressesWriter.hpp:58) — plain digits for ids in
    the int64 range GDAL prints without exponent."""
    return c.cast("long").cast("string")
