"""Frozen reference semantics (SURVEY.md §7 'what's hard' #1) — these tests
exist so nobody "fixes" the reference's behaviors that row-equality depends
on:

- J6 place match: best_dist is never updated (osmi/ConnectionLinePreprocessor
  .hpp:177-206) → LAST candidate under MAXDIST wins; wayy beats nody.
- J5 street argmin: strict '<' over area-then-nonarea insertion order
  (:227-237, :269) → ties go to the area side, then the lowest way id.
- G8 refine: only the two segments adjacent to the closest vertex are
  considered — NOT the true foot point.
"""

import pytest
from pyspark.sql import functions as F

from osmi_addresses_spark.operators.nearest_place import match_places
from osmi_addresses_spark.operators.nearest_street import match_streets
from osmi_addresses_spark.operators.streets import build_streets_index


def _addr(spark, lon, lat, name, via=None):
    row = {
        "akey": "n1", "obj_type": "node", "obj_id": 1, "lookup_name": name,
        "lon": lon, "lat": lat, "phase": 0, "ord1": 1, "ord2": 0,
    }
    if via:
        row["via"] = via
    return spark.createDataFrame([row])


def _places(spark, rows):
    return spark.createDataFrame(
        rows, "name string, is_nody boolean, obj_seq long, lon double, lat double"
    )


def test_place_last_under_maxdist_wins_not_closest(spark):
    # nody at dist 0.001 (closest), later nody at 0.005 -> LATER one wins
    places = _places(
        spark,
        [("X", True, 10, 8.001, 47.0), ("X", True, 20, 8.005, 47.0)],
    )
    m = match_places(_addr(spark, 8.0, 47.0, "X", via="place"), places).collect()
    assert len(m) == 1
    assert m[0]["plon"] == 8.005  # last inserted, NOT the closest


def test_place_wayy_beats_closer_nody(spark):
    places = _places(
        spark,
        [("X", True, 10, 8.0001, 47.0), ("X", False, 5, 8.009, 47.0)],
    )
    m = match_places(_addr(spark, 8.0, 47.0, "X", via="place"), places).collect()
    assert m[0]["is_nody"] is False  # wayy side scanned after nody -> wins


def test_place_beyond_maxdist_never_matches(spark):
    places = _places(spark, [("X", True, 10, 8.02, 47.0)])  # 0.02 > MAXDIST
    assert match_places(_addr(spark, 8.0, 47.0, "X", via="place"), places).count() == 0


def _ways(spark, rows):
    """rows: (way_id, name, area?, coords [(lon,lat)...])"""
    data = []
    for wid, name, area, coords in rows:
        tags = {"highway": "x", "name": name}
        if area:
            tags["area"] = "yes"
        refs = list(range(wid * 10, wid * 10 + len(coords)))
        if area:
            refs[-1] = refs[0]
        data.append((wid, refs, "2023-01-01T00:00:00Z", tags,
                     [{"lon": c[0], "lat": c[1]} for c in coords]))
    return spark.createDataFrame(
        data,
        "way_id long, refs array<long>, lastchange string, "
        "tags map<string,string>, coords array<struct<lon:double,lat:double>>",
    )


def test_street_tie_area_beats_nonarea(spark):
    # both ways contain the exact same vertex -> equal min vertex distance
    shared = (8.001, 47.0)
    ways = _ways(
        spark,
        [
            (100, "S", False, [shared, (8.003, 47.001)]),
            (200, "S", True, [shared, (8.003, 46.999), (8.004, 47.0), shared]),
        ],
    )
    streets = build_streets_index(ways)
    m = match_streets(_addr(spark, 8.0, 47.0, "S"), streets).collect()
    assert len(m) == 1
    assert m[0]["way_id"] == 200 and m[0]["is_area"] is True


def test_street_tie_insertion_order_within_side(spark):
    shared = (8.001, 47.0)
    ways = _ways(
        spark,
        [
            (300, "S", False, [shared, (8.003, 47.001)]),
            (100, "S", False, [shared, (8.003, 46.999)]),
        ],
    )
    streets = build_streets_index(ways)
    m = match_streets(_addr(spark, 8.0, 47.0, "S"), streets).collect()
    assert m[0]["way_id"] == 100  # lowest id == earliest inserted


def test_street_nonarea_strictly_closer_beats_area(spark):
    ways = _ways(
        spark,
        [
            (100, "S", True, [(8.002, 47.0), (8.003, 47.001), (8.003, 46.999), (8.002, 47.0)]),
            (200, "S", False, [(8.001, 47.0), (8.003, 47.002)]),
        ],
    )
    streets = build_streets_index(ways)
    m = match_streets(_addr(spark, 8.0, 47.0, "S"), streets).collect()
    assert m[0]["way_id"] == 200 and m[0]["is_area"] is False


def test_refine_adjacent_segments_only():
    import numpy as np

    from osmi_addresses_spark.functions.geom_np import refine_foot_point, wgs2mercator

    # closest vertex is B; true foot point lies on segment C-D (not adjacent
    # to B); the reference's restriction must pick a point on A-B or B-C
    lons = np.array([0.0, 0.10, 0.20, 0.2000001])
    lats = np.array([0.0, 0.001, 0.1, -0.10])
    flon, flat = refine_foot_point(lons, lats, 0.11, 0.0)
    # the true nearest point on C-D would have lon ~0.2; restriction keeps
    # the result near B's neighborhood
    assert flon < 0.15
