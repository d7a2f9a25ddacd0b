"""Unit tests for the numpy geometry kernels (hand-computed values)."""

import math

import numpy as np
import pytest

from osmi_addresses_spark.functions.geom_np import (
    int162lat,
    is_point_near_bbox,
    lat2int16,
    lon2int16,
    mercator2wgs,
    refine_foot_point,
    ring_centroid,
    value_along,
    value_along_multi,
    wgs2mercator,
)


def test_mercator_roundtrip():
    lon, lat = np.array([8.78]), np.array([47.25])
    x, y = wgs2mercator(lon, lat)
    assert x[0] == pytest.approx(977_385.1, abs=1e3)
    lon2, lat2 = mercator2wgs(x, y)
    assert lon2[0] == pytest.approx(8.78, abs=1e-12)
    assert lat2[0] == pytest.approx(47.25, abs=1e-12)


def test_centroid_square():
    # unit square centered at (0.5, 0.5)
    lon = np.array([0.0, 1.0, 1.0, 0.0, 0.0])
    lat = np.array([0.0, 0.0, 1.0, 1.0, 0.0])
    cx, cy = ring_centroid(lon, lat)
    assert cx == pytest.approx(0.5)
    assert cy == pytest.approx(0.5)


def test_centroid_l_shape():
    # L-shape: area-weighted centroid, not vertex average
    lon = np.array([0.0, 2.0, 2.0, 1.0, 1.0, 0.0, 0.0])
    lat = np.array([0.0, 0.0, 1.0, 1.0, 2.0, 2.0, 0.0])
    cx, cy = ring_centroid(lon, lat)
    # area = 3; two unit squares at (0.5,0.5),(1.5,0.5) and one at (0.5,1.5)
    assert cx == pytest.approx((0.5 + 1.5 + 0.5) / 3)
    assert cy == pytest.approx((0.5 + 0.5 + 1.5) / 3)


def test_zero_area_centroid_fallback():
    lon = np.array([0.0, 1.0, 0.0])
    lat = np.array([0.0, 0.0, 0.0])
    cx, cy = ring_centroid(lon, lat)
    assert cx == pytest.approx(0.5)
    assert cy == pytest.approx(0.0)


def test_int16_quantization():
    assert lat2int16(47.25, True) == math.ceil(47.25 * 32767 / 90)
    assert lat2int16(47.25, False) == math.floor(47.25 * 32767 / 90)
    assert lon2int16(-8.7, False) == math.floor(-8.7 * 32767 / 180)
    # dequantized ceil edge is >= true value
    assert float(int162lat(lat2int16(47.2513, True))) >= 47.2513 - 1e-6


def test_near_bbox():
    n = lat2int16(47.26, True)
    s = lat2int16(47.25, False)
    e = lon2int16(8.80, True)
    w = lon2int16(8.78, False)
    assert is_point_near_bbox(n, e, s, w, 8.79, 47.255, 0.01)
    assert is_point_near_bbox(n, e, s, w, 8.79, 47.2695, 0.01)  # within lat tol
    assert not is_point_near_bbox(n, e, s, w, 8.79, 47.28, 0.01)  # beyond lat tol
    # lon tolerance is scaled by 1/cos(lat): 0.01/cos(47°) ≈ 0.0147
    assert is_point_near_bbox(n, e, s, w, 8.8135, 47.255, 0.01)
    assert not is_point_near_bbox(n, e, s, w, 8.8185, 47.255, 0.01)


def test_value_along():
    lons = np.array([0.0, 1.0, 1.0])
    lats = np.array([0.0, 0.0, 1.0])
    assert value_along(lons, lats, 0.5) == (0.5, 0.0)
    assert value_along(lons, lats, 1.5) == (1.0, 0.5)
    assert value_along(lons, lats, -1) == (0.0, 0.0)
    assert value_along(lons, lats, 99) == (1.0, 1.0)
    # exact boundary goes to the NEXT segment (strict '<' like GDAL)
    assert value_along(lons, lats, 1.0) == (1.0, 0.0)
    mlon, mlat = value_along_multi(lons, lats, np.array([0.25, 1.75]))
    assert list(mlon) == [0.25, 1.0]
    assert list(mlat) == [0.0, 0.75]


def test_refine_foot_point_perpendicular():
    # horizontal line at lat=0; point above the middle -> foot below point
    lons = np.array([0.0, 1.0, 2.0])
    lats = np.array([0.0, 0.0, 0.0])
    flon, flat = refine_foot_point(lons, lats, 0.7, 0.1)
    assert flat == pytest.approx(0.0, abs=1e-9)
    assert flon == pytest.approx(0.7, abs=1e-9)


def test_refine_restricted_to_adjacent_segments():
    # V-shape where the true foot point is on a segment NOT adjacent to the
    # closest vertex — the reference only checks the two adjacent segments.
    lons = np.array([0.0, 1.0, 1.1, 5.0])
    lats = np.array([0.0, 0.0, 5.0, 5.2])
    flon, flat = refine_foot_point(lons, lats, 0.9, -0.01)
    # closest vertex is (1,0); adjacent segments only
    assert flat == pytest.approx(0.0, abs=1e-6)


def test_segment_dist_precomputed_bitwise_equal(spark):
    """min_segment_dist_pre over segments_of must equal min_segment_dist
    over raw coords bit-for-bit (the hot path swaps in the precomputed
    form; any float drift would silently flip argmin winners)."""
    import random

    from pyspark.sql import functions as F

    from osmi_addresses_spark.functions import geom_sql as G

    rng = random.Random(3)
    rows = []
    for i in range(300):
        n = rng.randint(2, 8)
        pts = [
            {"lon": 8.78 + rng.random() * 0.02, "lat": 47.25 + rng.random() * 0.01}
            for _ in range(n)
        ]
        if i % 7 == 0:  # zero-length segment case
            pts[1] = dict(pts[0])
        rows.append((i, pts, 8.78 + rng.random() * 0.02, 47.25 + rng.random() * 0.01))
    df = spark.createDataFrame(
        rows, "id long, coords array<struct<lon:double,lat:double>>, plon double, plat double"
    )
    out = df.select(
        G.min_segment_dist(F.col("coords"), F.col("plon"), F.col("plat")).alias("a"),
        G.min_segment_dist_pre(
            G.segments_of(F.col("coords")), F.col("plon"), F.col("plat")
        ).alias("b"),
    ).collect()
    import struct as st

    for r in out:
        assert st.pack("<d", r["a"]) == st.pack("<d", r["b"])


def test_tile_pyramid_rollup_equals_direct(spark):
    """The hierarchical rollup (tile once at zmax, then x>>1/y>>1 sums) is
    bit-identical to direct per-zoom assignment, including clamped edge
    cases at the poles/antimeridian."""
    import random

    from pyspark.sql import functions as F

    from osmi_addresses_spark.functions.tiles import tile_pyramid, tile_xy

    rng = random.Random(7)
    pts = [(rng.uniform(-180, 180), rng.uniform(-89.9, 89.9)) for _ in range(400)]
    pts += [(-180.0, 0.0), (180.0, 0.0), (0.0, 89.9), (0.0, -89.9), (179.999, 85.1)]
    df = spark.createDataFrame(pts, "lon double, lat double")

    pyr = {
        (r["zoom"], r["xt"], r["yt"]): r["n"]
        for r in tile_pyramid(df, zmin=3, zmax=9).collect()
    }
    for z in (3, 5, 9):
        xt, yt = tile_xy(F.col("lon"), F.col("lat"), z)
        direct = {
            (z, r["xt"], r["yt"]): r["n"]
            for r in df.select(xt.alias("xt"), yt.alias("yt"))
            .groupBy("xt", "yt")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        assert {k: v for k, v in pyr.items() if k[0] == z} == direct, z
    # every level conserves the point mass
    for z in range(3, 10):
        assert sum(v for k, v in pyr.items() if k[0] == z) == len(pts), z


def test_tile_xy_null_coords_yield_null(spark):
    """A null coordinate must produce a null tile index (not 2^z-1, which
    least/greatest null-skipping would silently give), and tile_pyramid
    must exclude null-coordinate rows entirely."""
    from pyspark.sql import functions as F

    from osmi_addresses_spark.functions.tiles import tile_pyramid, tile_xy

    df = spark.createDataFrame(
        [(1, 8.5, 47.0), (2, None, 47.0), (3, 8.5, None)],
        "id int, lon double, lat double",
    )
    xt, yt = tile_xy(F.col("lon"), F.col("lat"), 10)
    rows = {r["id"]: (r["x"], r["y"]) for r in df.select("id", xt.alias("x"), yt.alias("y")).collect()}
    assert rows[1][0] is not None and rows[1][1] is not None
    assert rows[2] == (None, None) and rows[3] == (None, None)
    pyr = tile_pyramid(df, 5, 6).collect()
    assert sum(r["n"] for r in pyr if r["zoom"] == 5) == 1
