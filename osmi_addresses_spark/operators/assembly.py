"""J1 — the ways ⋈ nodes location join (SURVEY.md §2.3).

The reference materializes an in-memory node-id → location index
(osmi/main.hpp:6-10) and patches coordinates into way refs. Here it is the
engine's backbone shuffle: posexplode(refs) → equi-join on node_id →
positional reassembly via array_sort(collect_list(struct(pos, lon, lat))).

Scale notes: both shuffles hash on node_id / way_id (uniform keys — no
skew); AQE coalesces the post-join partitions. Ways with any unresolved ref
get coords = NULL, mirroring the reference's ignored dangling references
(osmi/main.cpp:68, osmi/FirstHandler.hpp:102-104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_way_geometries(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """ways(way_id, refs, …) × nodes(node_id, lon, lat) → + coords.

    Output: input way columns + ``coords array<struct<lon,lat>>`` (NULL when
    any ref is dangling or refs is empty).
    """
    exploded = ways.select("way_id", F.posexplode("refs").alias("pos", "node_id"))
    locs = nodes.select("node_id", "lon", "lat")
    joined = exploded.join(locs, "node_id", "left")
    agg = joined.groupBy("way_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))).alias("_pl"),
        F.max(F.col("lon").isNull().cast("int")).alias("_dangling"),
    )
    return (
        ways.join(agg, "way_id", "left")
        .withColumn(
            "coords",
            F.when(
                F.col("_dangling") == 0,
                F.transform("_pl", lambda s: F.struct(s["lon"].alias("lon"), s["lat"].alias("lat"))),
            ),
        )
        .drop("_pl", "_dangling")
    )
