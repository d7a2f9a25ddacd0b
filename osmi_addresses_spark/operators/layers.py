"""Filter/projection layers (SURVEY.md §2.2) and the match fan-out layers.

Every builder returns a DataFrame with the exact FIXTURES.md §4 schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import geom_sql as G
from ..schemas import layer_schema

ADDR7 = ["street", "housenumber", "postcode", "city", "country", "full", "place"]

# osmi/AddrXOnNonClosedWayWriter.hpp:19-44 — the 20 addr:* keys
ADDRX_KEYS = [
    "street", "housenumber", "full", "conscriptionnumber", "housename", "place",
    "postcode", "flats", "door", "unit", "floor", "city", "country", "hamlet",
    "suburb", "district", "subdistrict", "province", "region", "state",
]




# packed-long address keys (join keys cheaper than strings at 10^7+ rows):
# node → id*4, way centroid → id*4+1, interpolated point → ((wid<<10)+k)*4+2
# (k < 1024 always: the range-too-large guard caps interpolation spans at
# 1000 house numbers)
def akey_node(c):
    return (c * 4).cast("long")


def akey_way(c):
    return (c * 4 + 1).cast("long")


def akey_ip(way_id, k):
    return ((F.shiftleft(way_id, 10) + k) * 4 + 2).cast("long")


def _tag(k: str):
    return F.col("tags")[k]


def point_geom(lon, lat):
    return F.struct(lon.alias("lon"), lat.alias("lat"))


# ------------------------------------------------------------- pure filters
def entrances(nodes: DataFrame) -> DataFrame:
    """F1 — osmi/EntrancesWriter.hpp:20-36. The `entrance` field is set only
    when the entrance tag itself is present (building=entrance → NULL)."""
    f = nodes.filter(_tag("entrance").isNotNull() | (_tag("building") == "entrance"))
    return f.select(
        G.fmt_id(F.col("node_id")).alias("node_id"),
        F.col("lastchange"),
        _tag("entrance").alias("entrance"),
        point_geom(F.col("lon"), F.col("lat")).alias("geom"),
    )


def ways_with_postal_code(ways_p2: DataFrame) -> DataFrame:
    """F6 — osmi/WaysWithPostalCodeWriter.hpp:21-37."""
    return ways_p2.filter(_tag("postal_code").isNotNull()).select(
        G.fmt_id(F.col("way_id")).alias("way_id"),
        F.col("lastchange"),
        _tag("postal_code").alias("postalcode"),
        F.col("coords").alias("geom"),
    )


def addrx_on_nonclosed_way(ways_p2: DataFrame) -> DataFrame:
    """F5 — osmi/AddrXOnNonClosedWayWriter.hpp:19-58."""
    pred = None
    for k in ADDRX_KEYS:
        c = _tag(f"addr:{k}").isNotNull()
        pred = c if pred is None else (pred | c)
    return ways_p2.filter(~G.is_closed(F.col("refs")) & pred).select(
        G.fmt_id(F.col("way_id")).alias("way_id"),
        F.col("lastchange"),
        F.col("coords").alias("geom"),
    )


def ways_with_addresses(ways_p2: DataFrame) -> DataFrame:
    """F4 — osmi/WaysWithAddressesWriter.hpp:24-59: building ∧ closed ∧
    (street ∨ houseno ∨ place)."""
    f = ways_p2.filter(
        _tag("building").isNotNull()
        & G.is_closed(F.col("refs"))
        & (
            _tag("addr:street").isNotNull()
            | _tag("addr:housenumber").isNotNull()
            | _tag("addr:place").isNotNull()
        )
    )
    return f.select(
        G.fmt_id(F.col("way_id")).alias("way_id"),
        _tag("addr:street").alias("street"),
        _tag("addr:housenumber").alias("houseno"),
        _tag("addr:postcode").alias("postcode"),
        _tag("addr:city").alias("city"),
        _tag("addr:country").alias("country"),
        _tag("addr:full").alias("fulladdr"),
        _tag("addr:place").alias("place"),
        F.col("lastchange"),
        F.col("coords").alias("geom"),
    )


def buildings(spark: SparkSession) -> DataFrame:
    """Layer exists but is empty by construction — the reference's feed_way
    call is commented out (osmi/SecondHandler.hpp:73, golden count 0)."""
    return spark.createDataFrame([], layer_schema("buildings"))


# ------------------------------------------------------- match fan-out layers
def connection_line(street_matches: DataFrame, place_matches: DataFrame) -> DataFrame:
    """osmi/ConnectionLineWriter.hpp:20-41. Street matches carry the object's
    own id; place matches are written with objectid=0
    (osmi/ConnectionLinePreprocessor.hpp:131); interpolated points carry no id."""
    sl = street_matches.select(
        F.when(F.col("obj_type") == "node", G.fmt_id(F.col("obj_id"))).alias("node_id"),
        F.when(F.col("obj_type") == "way", G.fmt_id(F.col("obj_id"))).alias("way_id"),
        F.array(
            point_geom(F.col("lon"), F.col("lat")),
            point_geom(F.col("foot_lon"), F.col("foot_lat")),
        ).alias("geom"),
    )
    pl = place_matches.select(
        F.when(F.col("obj_type") == "node", F.lit("0")).alias("node_id"),
        F.when(F.col("obj_type") == "way", F.lit("0")).alias("way_id"),
        F.array(
            point_geom(F.col("lon"), F.col("lat")),
            point_geom(F.col("plon"), F.col("plat")),
        ).alias("geom"),
    )
    return sl.unionByName(pl)


def nearest_points(street_matches: DataFrame) -> DataFrame:
    """osmi/NearestPointsWriter.hpp — one row per street match, no dedup."""
    return street_matches.select(
        G.fmt_id(F.col("way_id")).alias("way_id"),
        point_geom(F.col("foot_lon"), F.col("foot_lat")).alias("geom"),
    )


def _first_match_per_way(matches: DataFrame) -> DataFrame:
    """A3 — first-write-wins dedup (osmi/NearestRoadsWriter.hpp:25-39): the
    name/lastchange come from the first match in reference scan order.
    Hash-aggregate argmin ((phase, ord1, ord2) is unique per match)."""
    ord_key = F.struct(F.col("phase"), F.col("ord1"), F.col("ord2"))
    payload = F.struct(*[F.col(c) for c in matches.columns])
    return (
        matches.groupBy("way_id")
        .agg(F.min_by(payload, ord_key).alias("_w"))
        .select("_w.*")
    )


def _nearest_ways_layer(street_matches: DataFrame, ways_geo: DataFrame, area: bool) -> DataFrame:
    m = _first_match_per_way(
        street_matches.filter(F.col("is_area") if area else ~F.col("is_area"))
    ).select("way_id", "lookup_name", "way_lastchange")
    geoms = ways_geo.select("way_id", "coords")
    return m.join(geoms, "way_id").select(
        G.fmt_id(F.col("way_id")).alias("way_id"),
        F.col("lookup_name").alias("name"),
        F.col("way_lastchange").alias("lastchange"),
        F.col("coords").alias("geom"),
    )


def nearest_roads(street_matches: DataFrame, ways_geo: DataFrame) -> DataFrame:
    return _nearest_ways_layer(street_matches, ways_geo, area=False)


def nearest_areas(street_matches: DataFrame, ways_geo: DataFrame) -> DataFrame:
    return _nearest_ways_layer(street_matches, ways_geo, area=True)


# ------------------------------------------------------ nodes_with_addresses
def _match_flags(street_matches: DataFrame, place_matches: DataFrame) -> DataFrame:
    """Per akey: road_id / nody_place_id / wayy_place_id out-params
    (osmi/SecondHandler.hpp:45-49; values are the literal '1',
    osmi/ConnectionLinePreprocessor.hpp:125-129,166).

    One union + one groupBy (single shuffle) instead of a full-outer join."""
    r = street_matches.select(
        "akey", F.lit(True).alias("road"), F.lit(None).cast("boolean").alias("is_nody")
    )
    p = place_matches.select("akey", F.lit(False).alias("road"), "is_nody")
    return (
        r.unionByName(p)
        .groupBy("akey")
        .agg(
            F.max(F.when(F.col("road"), "1")).alias("road_id"),
            F.max(F.when(F.col("is_nody") == True, "1")).alias("nody_place_id"),  # noqa: E712
            F.max(F.when(F.col("is_nody") == False, "1")).alias("wayy_place_id"),  # noqa: E712
        )
    )


def nwa_node_rows(nodes: DataFrame, flags: DataFrame) -> DataFrame:
    """F2 — osmi/NodesWithAddressesWriter.hpp:40-82."""
    pred = None
    for k in ADDR7:
        c = _tag(f"addr:{k}").isNotNull()
        pred = c if pred is None else (pred | c)
    base = nodes.filter(pred).select(
        akey_node(F.col("node_id")).alias("akey"),
        G.fmt_id(F.col("node_id")).alias("node_id"),
        F.lit(None).cast("string").alias("way_id"),
        F.lit(None).cast("string").alias("ip_id"),
        F.lit(0).alias("is_ip"),
        _tag("addr:street").alias("street"),
        _tag("addr:housenumber").alias("houseno"),
        _tag("addr:postcode").alias("postcode"),
        _tag("addr:city").alias("city"),
        _tag("addr:country").alias("country"),
        _tag("addr:full").alias("fulladdr"),
        _tag("addr:place").alias("place"),
        F.col("lastchange"),
        point_geom(F.col("lon"), F.col("lat")).alias("geom"),
    )
    return (
        base.join(flags, "akey", "left")
        .drop("akey")
        .select(
            "node_id", "way_id", "ip_id", "is_ip", "street", "houseno", "postcode",
            "city", "country", "fulladdr", "place", "road_id", "nody_place_id",
            "wayy_place_id", "lastchange", "geom",
        )
    )


def nwa_way_rows(way_centroids: DataFrame, flags: DataFrame) -> DataFrame:
    """F3 — osmi/NodesWithAddressesWriter.hpp:85-138: building ∧ closed ∧
    (street ∨ houseno); geometry = ring centroid."""
    f = way_centroids.filter(
        _tag("building").isNotNull()
        & (_tag("addr:street").isNotNull() | _tag("addr:housenumber").isNotNull())
    )
    base = f.select(
        akey_way(F.col("way_id")).alias("akey"),
        F.lit(None).cast("string").alias("node_id"),
        G.fmt_id(F.col("way_id")).alias("way_id"),
        F.lit(None).cast("string").alias("ip_id"),
        F.lit(0).alias("is_ip"),
        _tag("addr:street").alias("street"),
        _tag("addr:housenumber").alias("houseno"),
        _tag("addr:postcode").alias("postcode"),
        _tag("addr:city").alias("city"),
        _tag("addr:country").alias("country"),
        _tag("addr:full").alias("fulladdr"),
        _tag("addr:place").alias("place"),
        F.col("lastchange"),
        F.col("centroid").alias("geom"),
    )
    return (
        base.join(flags, "akey", "left")
        .drop("akey")
        .select(
            "node_id", "way_id", "ip_id", "is_ip", "street", "houseno", "postcode",
            "city", "country", "fulladdr", "place", "road_id", "nody_place_id",
            "wayy_place_id", "lastchange", "geom",
        )
    )


def nwa_ip_rows(ip_points: DataFrame, flags: DataFrame) -> DataFrame:
    """osmi/NodesWithAddressesWriter.hpp:140-169: is_ip=1 rows; every string
    field is set unconditionally (empty string when the tag was missing —
    SetField("") writes '' not NULL); no node/way/ip id, no lastchange."""
    base = ip_points.select(
        akey_ip(F.col("way_id"), F.col("k")).alias("akey"),
        F.lit(None).cast("string").alias("node_id"),
        F.lit(None).cast("string").alias("way_id"),
        F.lit(None).cast("string").alias("ip_id"),
        F.lit(1).alias("is_ip"),
        F.col("street"),
        F.col("houseno"),
        F.col("postcode"),
        F.col("city"),
        F.col("country"),
        F.col("fulladdr"),
        F.col("place"),
        F.lit(None).cast("string").alias("lastchange"),
        point_geom(F.col("lon"), F.col("lat")).alias("geom"),
    )
    return (
        base.join(flags.select("akey", "road_id"), "akey", "left")
        .drop("akey")
        .select(
            "node_id", "way_id", "ip_id", "is_ip", "street", "houseno", "postcode",
            "city", "country", "fulladdr", "place", "road_id",
            F.lit(None).cast("string").alias("nody_place_id"),
            F.lit(None).cast("string").alias("wayy_place_id"),
            "lastchange", "geom",
        )
    )
