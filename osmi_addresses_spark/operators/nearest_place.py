"""J6 — nearest-place match, bug-compatible (SURVEY.md §2.3 J6).

The reference's get_closest_place (osmi/ConnectionLinePreprocessor.hpp:171-209)
never updates best_dist (fixed at MAXDIST), so every candidate strictly under
MAXDIST *overwrites* the previous one: the winner is the LAST such candidate,
with the wayy side scanned after (and therefore beating) the nody side.
Frozen here as a window ordering — do not "fix" (row-equality with the
reference depends on it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import MAXDIST
from ..functions import geom_sql as G
from ..functions.cells import cell_of, covering_cells

# addr input contract: akey, obj_type, obj_id, lookup_name, lon, lat, via
#   via = 'street' (addr:street naming a place,
#          osmi/ConnectionLinePreprocessor.hpp:65-69) | 'place' (addr:place)


def match_places(addr: DataFrame, places: DataFrame) -> DataFrame:
    """→ one row per matched (addr, via): winner point + is_nody flag.

    Joined on (name, cell) — the place side registers every cell its
    MAXDIST-padded point bbox intersects, the address side its single
    containing cell — so a planet-hot place name ("Springfield") fans out
    per (name, cell), not per name, exactly like the street side. The
    covering strictly supersets the reference's Euclidean-degree MAXDIST
    disc (the lon pad uses tol/cos ≥ tol), and the exact distance filter
    below re-applies the reference predicate, so match rows are unchanged.
    An address has ONE cell, so no (addr, place) pair can duplicate."""
    p = places.select(
        F.col("name"),
        F.col("is_nody"),
        F.col("obj_seq"),
        F.col("lon").alias("plon"),
        F.col("lat").alias("plat"),
    ).withColumn(
        "cell",
        F.explode(
            covering_cells(
                F.col("plon"), F.col("plon"), F.col("plat"), F.col("plat"), MAXDIST
            )
        ),
    )
    a = addr.withColumn("cell", cell_of(F.col("lon"), F.col("lat")))
    cand = a.join(
        p, (a["lookup_name"] == p["name"]) & (a["cell"] == p["cell"]), "inner"
    ).drop("name", "cell")
    cand = cand.filter(
        G.point_dist(F.col("plon"), F.col("plat"), F.col("lon"), F.col("lat")) < F.lit(MAXDIST)
    )
    # last-wins: wayy side (is_nody=false) beats nody; within a side, the
    # latest-inserted (highest osm id) wins. Hash-aggregate argmin (min_by
    # over a total-order struct) instead of a window sort; (is_nody, obj_seq)
    # is unique per (akey, via) candidate.
    ord_key = F.struct(F.col("is_nody"), (-F.col("obj_seq")).alias("negseq"))
    # addr columns ride as grouping keys (akey unique per addr ⇒ same
    # groups); payload holds only the winner-specific fields so the agg
    # hash maps stay narrow.
    addr_cols = [c for c in addr.columns]
    payload = F.struct("is_nody", "plon", "plat")
    return (
        cand.groupBy(*addr_cols)
        .agg(F.min_by(payload, ord_key).alias("_w"))
        .select(*addr_cols, "_w.*")
    )
