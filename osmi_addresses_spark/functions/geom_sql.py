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


def min_segment_dist(coords: Column, plon: Column, plat: Column) -> Column:
    """GEOS point-to-linestring distance in degree space — what the
    reference's closest-way scan actually computes: OGRLineString::Distance
    (osmi/ConnectionLinePreprocessor.hpp:266) delegates to GEOS
    ``distancePointLine``, which is segment-aware. (The adjacent source
    comment claims vertices only; the reference's own golden ST_Length
    extrema on the testzone fixture prove otherwise — a building whose
    nearest street segment is 3 m away but whose nearest street *vertex*
    is 25 m away must match at 3 m to reproduce the golden max of 17.3 m.)

    Per segment (A,B) and point p (GEOS CGAlgorithms::distancePointLine):
      len2 = |B-A|²;   len2 == 0          → |p-A|
      r = ((p-A)·(B-A))/len2;   r ≤ 0     → |p-A|;   r ≥ 1 → |p-B|
      else s = ((Ay-py)(Bx-Ax) - (Ax-px)(By-Ay))/len2;  d = |s|·√len2

    Op order mirrors the DuckDB oracle and geom_np.min_segment_dist exactly.
    Empty segment list (single-vertex way) → BIG; the F7 highway filter
    (≥2 nodes, operators/streets.py) keeps those out of the index.
    """
    n = F.size(coords)
    a = F.slice(coords, 1, n - 1)
    b = F.slice(coords, 2, n - 1)

    def seg(p, q):
        ax, ay, bx, by = p["lon"], p["lat"], q["lon"], q["lat"]
        len2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
        r = ((plon - ax) * (bx - ax) + (plat - ay) * (by - ay)) / len2
        d_a = F.sqrt((plon - ax) * (plon - ax) + (plat - ay) * (plat - ay))
        d_b = F.sqrt((plon - bx) * (plon - bx) + (plat - by) * (plat - by))
        s = ((ay - plat) * (bx - ax) - (ax - plon) * (by - ay)) / len2
        return (
            F.when(len2 == 0.0, d_a)
            .when(r <= 0.0, d_a)
            .when(r >= 1.0, d_b)
            .otherwise(F.abs(s) * F.sqrt(len2))
        )

    return F.aggregate(
        F.zip_with(a, b, seg), F.lit(BIG), lambda acc, d: F.least(acc, d)
    )


def segments_of(coords: Column) -> Column:
    """coords → array<struct ax,ay,bx,by,dx,dy,len2>: per-segment geometry
    precomputed ONCE at index-build time. dx/dy/len2 are computed with the
    identical ops as min_segment_dist's inline forms (dx ≡ bx-ax bit-for-bit),
    so distances from the precomputed path equal the inline path exactly."""
    n = F.size(coords)
    return F.zip_with(
        F.slice(coords, 1, n - 1),
        F.slice(coords, 2, n - 1),
        lambda p, q: F.struct(
            p["lon"].alias("ax"),
            p["lat"].alias("ay"),
            q["lon"].alias("bx"),
            q["lat"].alias("by"),
            (q["lon"] - p["lon"]).alias("dx"),
            (q["lat"] - p["lat"]).alias("dy"),
            (
                (q["lon"] - p["lon"]) * (q["lon"] - p["lon"])
                + (q["lat"] - p["lat"]) * (q["lat"] - p["lat"])
            ).alias("len2"),
        ),
    )


def min_segment_dist_pre(segs: Column, plon: Column, plat: Column) -> Column:
    """min_segment_dist over precomputed segments (see segments_of) — the
    hot-path form: higher-order lambdas are interpreted per row, so hoisting
    dx/dy/len2 to index-build time cuts the per-candidate op count ~3×
    (measured: the candidate+argmin stage was ~470 CPU-s at sf10 with the
    inline form). One scalar-accumulator fold, no intermediate distance
    array. Bitwise-identical results to min_segment_dist."""

    def d(t):
        r = ((plon - t["ax"]) * t["dx"] + (plat - t["ay"]) * t["dy"]) / t["len2"]
        d_a = F.sqrt(
            (plon - t["ax"]) * (plon - t["ax"]) + (plat - t["ay"]) * (plat - t["ay"])
        )
        d_b = F.sqrt(
            (plon - t["bx"]) * (plon - t["bx"]) + (plat - t["by"]) * (plat - t["by"])
        )
        s = ((t["ay"] - plat) * t["dx"] - (t["ax"] - plon) * t["dy"]) / t["len2"]
        return (
            F.when(t["len2"] == 0.0, d_a)
            .when(r <= 0.0, d_a)
            .when(r >= 1.0, d_b)
            .otherwise(F.abs(s) * F.sqrt(t["len2"]))
        )

    return F.aggregate(segs, F.lit(BIG), lambda acc, t: F.least(acc, d(t)))


def point_dist(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    return F.sqrt((lon1 - lon2) * (lon1 - lon2) + (lat1 - lat2) * (lat1 - lat2))


MEAN_EARTH_R_M = 6371008.8  # IUGG mean Earth radius


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters, pure Column expression (whole-stage
    codegen — the vectorized metric refine; the reference ranks in degree
    space, this is the metric QA surface on top of it)."""
    h = F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2) + F.cos(
        F.radians(lat1)
    ) * F.cos(F.radians(lat2)) * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
    # near-antipodal pairs can round h to 1 + 2.2e-16; unclamped that makes
    # sqrt(h) > 1 and asin return NaN
    return F.lit(2.0 * MEAN_EARTH_R_M) * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


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
    first = F.element_at(coords, 1)
    # translate to the first vertex before the shoelace: the raw formula
    # cancels catastrophically on small-but-far-from-origin rings (a ~1 m
    # ring at lat 47° came out ~940 m off); GEOS — which the reference
    # calls through OGR Centroid — uses the same local-origin trick. The
    # op order mirrors geom_np.ring_centroid exactly (bit-parity with the
    # python oracle).
    xr = first["lon"]
    yr = first["lat"]
    a = F.slice(coords, 1, n - 1)
    b = F.slice(coords, 2, n - 1)
    terms = F.zip_with(
        a,
        b,
        lambda p, q: F.struct(
            (
                (p["lon"] - xr) * (q["lat"] - yr) - (q["lon"] - xr) * (p["lat"] - yr)
            ).alias("cross"),
            (
                ((p["lon"] - xr) + (q["lon"] - xr))
                * ((p["lon"] - xr) * (q["lat"] - yr) - (q["lon"] - xr) * (p["lat"] - yr))
            ).alias("cx"),
            (
                ((p["lat"] - yr) + (q["lat"] - yr))
                * ((p["lon"] - xr) * (q["lat"] - yr) - (q["lon"] - xr) * (p["lat"] - yr))
            ).alias("cy"),
            F.sqrt(
                ((q["lon"] - xr) - (p["lon"] - xr)) * ((q["lon"] - xr) - (p["lon"] - xr))
                + ((q["lat"] - yr) - (p["lat"] - yr)) * ((q["lat"] - yr) - (p["lat"] - yr))
            ).alias("seg"),
            (((p["lon"] - xr) + (q["lon"] - xr)) / F.lit(2.0)).alias("mx"),
            (((p["lat"] - yr) + (q["lat"] - yr)) / F.lit(2.0)).alias("my"),
        ),
    )
    a2 = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t["cross"])
    cx = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t["cx"])
    cy = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t["cy"])
    tot = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t["seg"])
    wx = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t["mx"] * t["seg"])
    wy = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t["my"] * t["seg"])
    lon = (
        F.when(a2 != 0.0, xr + cx / (F.lit(3.0) * a2))
        .when(tot != 0.0, xr + wx / tot)
        .otherwise(first["lon"])
    )
    lat = (
        F.when(a2 != 0.0, yr + cy / (F.lit(3.0) * a2))
        .when(tot != 0.0, yr + wy / tot)
        .otherwise(first["lat"])
    )
    return F.struct(lon.alias("lon"), lat.alias("lat"))


def fmt_id(c: Column) -> Column:
    """Reference formats ids into string fields via SetField(double(id))
    (e.g. osmi/NodesWithAddressesWriter.hpp:58) — plain digits for ids in
    the int64 range GDAL prints without exponent."""
    return c.cast("long").cast("string")
