"""Pass-1 analog: the streets index DataFrame (SURVEY.md §2.2 F7/F8, §2.4 A2).

Replaces the reference's name2highway_area / name2highway_nonarea multimaps
(osmi/main.hpp:17-23, filled osmi/FirstHandler.hpp:55-83) with a DataFrame
keyed by (street_name, cell) — the join side of the flagship nearest-street
match. One row per (way, distinct name-ish tag value) × covering cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import MAXDIST
from ..functions import geom_sql as G
from ..functions.cells import covering_cells

# osmi/FirstHandler.hpp:118 — the 7 name-ish keys; std::set dedups values
NAME_KEYS = ["name", "name:left", "name:right", "alt_name", "official_name", "short_name", "ref"]


def build_streets_index(ways_geo: DataFrame) -> DataFrame:
    """ways_geo (with coords) → streets(street_name, cell, way_id, is_area,
    bbox_n/e/s/w int16-quantized, coords, lastchange).

    Entry condition: highway tag ∧ ≥2 refs ∧ resolvable geometry
    (osmi/FirstHandler.hpp:41,55-57 + the catch blocks at :100-104).
    Zero-length ways DO enter the index (the pass-2 nonzero guard does not
    apply to pass 1).
    """
    w = ways_geo.filter(
        F.col("tags")["highway"].isNotNull()
        & (F.size("refs") >= 2)
        & F.col("coords").isNotNull()
    )
    names = F.array_distinct(
        F.filter(
            F.array(*[F.col("tags")[k] for k in NAME_KEYS]), lambda x: x.isNotNull()
        )
    )
    w = w.withColumn("street_name", F.explode(names))
    bbox = G.bbox_struct(F.col("coords"))
    w = w.select(
        "street_name",
        "way_id",
        "coords",
        # per-segment geometry precomputed once (index side is tiny next to
        # the addr side) so the per-candidate distance fold does ~1/3 the
        # interpreted ops — see geom_sql.min_segment_dist_pre
        G.segments_of(F.col("coords")).alias("segs"),
        "lastchange",
        (
            F.col("tags")["area"].isin("yes", "true") & G.is_closed(F.col("refs"))
        ).alias("is_area"),
        G.lat2int16(bbox["north"], True).alias("bbox_n"),
        G.lon2int16(bbox["east"], True).alias("bbox_e"),
        G.lat2int16(bbox["south"], False).alias("bbox_s"),
        G.lon2int16(bbox["west"], False).alias("bbox_w"),
        covering_cells(bbox["west"], bbox["east"], bbox["south"], bbox["north"], MAXDIST).alias(
            "cells"
        ),
    )
    return w.withColumn("cell", F.explode("cells")).drop("cells")
