"""Explicit hot-key split in match_streets (the engine's skew axis):
result identity between the split and non-split paths, and the split
actually engaging (broadcast join present in the plan). The quantitative
balance proof (max/median task < 3 on a 20%-hot workload) lives in
tools/skew_probe.py → SKEW_PROOF.json."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmi_addresses_spark.operators.nearest_street import match_streets  # noqa: E402
from osmi_addresses_spark.operators.streets import build_streets_index  # noqa: E402
from tools.skew_probe import skewed_inputs  # noqa: E402


def _rows(m):
    return sorted(
        (r["akey"], r["way_id"], r["foot_lon"], r["foot_lat"])
        for r in m.collect()
    )


def test_hot_key_split_result_identity(spark):
    ways_geo, addr = skewed_inputs(spark, 3000, 5000, n_hot_ways=40, n_uni_names=20)
    streets = build_streets_index(ways_geo)
    geom = ways_geo.select("way_id", "coords")

    plain = match_streets(addr, streets, ways_geom=geom, skew_threshold=None)
    split = match_streets(addr, streets, ways_geom=geom, skew_threshold=500)
    # the split path engages: the hot branch is a broadcast join
    assert "BroadcastHashJoin" in split._jdf.queryExecution().executedPlan().toString()
    assert _rows(plain) == _rows(split)


def test_default_threshold_never_triggers_at_fixture_scale(spark):
    """The default threshold (2M addr rows per (name, cell)) must leave
    small runs on the single-join plan — no hot branch, no extra shuffle."""
    ways_geo, addr = skewed_inputs(spark, 2000, 2000, n_hot_ways=10, n_uni_names=10)
    streets = build_streets_index(ways_geo)
    m = match_streets(addr, streets, ways_geom=ways_geo.select("way_id", "coords"))
    assert m.count() == 4000


def test_many_hot_keys_use_broadcast_flag_path(spark):
    """Above 256 hot (name, cell) keys the literal-array predicate would
    serialize multi-MB task binaries and scan O(|hot|) structs per row
    (VERDICT r4 nit 1); the broadcast-joined is_hot flag path must engage
    and stay result-identical to the plain join."""
    ways_geo, addr = skewed_inputs(
        spark, 1500, 6000, n_hot_ways=20, n_uni_names=300
    )
    streets = build_streets_index(ways_geo)
    geom = ways_geo.select("way_id", "coords")

    plain = match_streets(addr, streets, ways_geom=geom, skew_threshold=None)
    # threshold 5: nearly every (name, cell) group qualifies -> |hot| > 256
    split = match_streets(addr, streets, ways_geom=geom, skew_threshold=5)
    assert _rows(plain) == _rows(split)
