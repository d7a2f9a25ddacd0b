"""Pass-1 analog: the places index (name2place_nody ∪ name2place_wayy,
osmi/main.hpp:25-28; filled osmi/FirstHandler.hpp:29-35 for nodes and
:87-97 for closed ways).

nody entries: nodes with place= and name= tags (the point is the node).
wayy entries: closed ways (≥2 refs) with place= and name= (the point is the
ring centroid). Insertion order — needed by the J6 bug-compatible
"last candidate under MAXDIST wins" — is the scan order, i.e. osm_id within
each side; carried as ``obj_seq``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geom_sql as G


def build_places_index(nodes: DataFrame, ways_geo: DataFrame) -> DataFrame:
    """→ places(name, is_nody, obj_seq, lon, lat)."""
    nody = nodes.filter(
        F.col("tags")["place"].isNotNull() & F.col("tags")["name"].isNotNull()
    ).select(
        F.col("tags")["name"].alias("name"),
        F.lit(True).alias("is_nody"),
        F.col("node_id").alias("obj_seq"),
        "lon",
        "lat",
    )
    wayy = (
        ways_geo.filter(
            F.col("tags")["place"].isNotNull()
            & F.col("tags")["name"].isNotNull()
            & (F.size("refs") >= 2)
            & G.is_closed(F.col("refs"))
            & F.col("coords").isNotNull()
        )
        .withColumn("_c", G.centroid_cols(F.col("coords")))
        .select(
            F.col("tags")["name"].alias("name"),
            F.lit(False).alias("is_nody"),
            F.col("way_id").alias("obj_seq"),
            F.col("_c")["lon"].alias("lon"),
            F.col("_c")["lat"].alias("lat"),
        )
    )
    return nody.unionByName(wayy)
