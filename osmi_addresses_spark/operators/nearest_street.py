"""The flagship: addr → nearest street match (SURVEY.md §2.3 J2-J5, §2.6 G5-G8).

Plan shape (all relational until the winners-only refine):

    addr_points ⋈ streets ON (lookup_name = street_name AND cell = cell)
      → exact bbox±tolerance filter  (osmi/GeometryHelper.hpp:127-152)
      → GEOS segment distance (degree space, F.aggregate — JVM codegen;
        OGRLineString::Distance at ConnectionLinePreprocessor.hpp:266 is
        segment-aware, NOT vertex-only as its comment claims)
      → window argmin per addr  (dist ASC, area-before-nonarea, insertion
        order; replicates the strict-'<' scan of
        osmi/ConnectionLinePreprocessor.hpp:214-280)
      → mercator foot-point refine (Arrow UDF, winners only)

Skew: common names ("Hauptstraße") in dense cells are the hot keys; the join
key is (name, cell) so hotness is bounded per cell, and AQE skew-join splits
oversized partitions at runtime.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import MAXDIST
from ..functions import geom_sql as G
from ..functions.cells import cell_of
from ..functions.geom_np import refine_foot_points_batch

# Contract for addr match input (shared with nearest_place):
#   akey       unique key per address point
#   obj_type   'node' | 'way' | 'ip'   (object_type, osmi/main.hpp enum)
#   obj_id     osm id (0 for interpolated points — DUMMY_ID)
#   lookup_name  the addr:street value being matched
#   lon, lat   the address point (node loc / way centroid / interpolated)
#   phase, ord1, ord2   reference scan order (nodes→ways; id; within-way step)


def match_streets(
    addr: DataFrame, streets: DataFrame, ways_geom: DataFrame | None = None
) -> DataFrame:
    """→ one row per *matched* addr point, with the winning way.

    Columns: addr cols + way_id, is_area, way_lastchange, foot_lon/lat
    (the refined connection-line endpoint).

    ``ways_geom`` (way_id, coords — one row per way) feeds the winners-only
    refine; derived from ``streets`` when not supplied.
    """
    a = addr.withColumn("cell", cell_of(F.col("lon"), F.col("lat")))
    s = streets.select(
        F.col("street_name"),
        F.col("cell"),
        F.col("way_id"),
        F.col("is_area"),
        F.col("bbox_n"),
        F.col("bbox_e"),
        F.col("bbox_s"),
        F.col("bbox_w"),
        F.col("coords").alias("way_coords"),
        F.col("lastchange").alias("way_lastchange"),
    )
    cand = a.join(
        s, (a["lookup_name"] == s["street_name"]) & (a["cell"] == s["cell"]), "inner"
    ).drop("street_name", "cell")
    cand = cand.filter(
        G.is_point_near_bbox(
            F.col("bbox_n"), F.col("bbox_e"), F.col("bbox_s"), F.col("bbox_w"),
            F.col("lon"), F.col("lat"), MAXDIST,
        )
    )
    # dist is computed inside the join stage (codegen) and way_coords never
    # leaves it: the aggregation below moves only ids through its hash maps.
    # Payload width matters doubly here — partial min_by state lives in the
    # agg hash map per group, and wide payloads (the full candidate row incl.
    # the linestring) made the partial-agg stage GC-bound (measured 557 s GC
    # in an 877 s stage at sf10/32 cores).
    cand = cand.withColumn(
        "dist", G.min_segment_dist(F.col("way_coords"), F.col("lon"), F.col("lat"))
    ).drop("bbox_n", "bbox_e", "bbox_s", "bbox_w", "way_coords")
    # strict-'<' scan order: closer wins; ties → area side (scanned first),
    # then insertion (way id) order. min_by over a total-order struct is a
    # hash aggregate (partial+final, map-side combine, no sort) — same
    # semantics as a row_number window, far cheaper at 10^7 candidates.
    # (akey, way_id) is unique per candidate, so the ordering is total and
    # the result deterministic. Addr columns ride along as grouping keys
    # (akey is unique ⇒ identical groups, no re-join needed).
    addr_cols = [c for c in addr.columns]
    ord_key = F.struct(
        F.col("dist"), (~F.col("is_area")).alias("na"), F.col("way_id")
    )
    payload = F.struct("way_id", "is_area", "way_lastchange")
    winners = (
        cand.groupBy(*addr_cols)
        .agg(F.min_by(payload, ord_key).alias("_w"))
        .select(*addr_cols, "_w.*")
    )
    # winners-only geometry: one slim equi-join on way_id feeds the refine;
    # hot ways (many addrs on one street) are AQE-skew-split.
    if ways_geom is None:
        ways_geom = streets.select("way_id", "coords").dropDuplicates(["way_id"])
    geom = ways_geom.select("way_id", F.col("coords").alias("way_coords"))
    winners = winners.join(geom, "way_id")
    return _with_foot_point(winners).drop("way_coords")


def _with_foot_point(winners: DataFrame) -> DataFrame:
    """Winners-only refine: wgs→mercator, closest vertex, closest point on
    the ≤2 adjacent segments, mercator→wgs
    (osmi/ConnectionLinePreprocessor.hpp:147-154, 283-364)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        winners.schema.fields
        + [StructField("foot_lon", DoubleType()), StructField("foot_lat", DoubleType())]
    )

    def gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            if not batch.num_rows:
                continue
            coords = batch.column("way_coords")
            if isinstance(coords, pa.ChunkedArray):
                coords = coords.combine_chunks()
            offs = coords.offsets.to_numpy().astype(np.int64)
            vals = coords.values
            base = offs[0]
            # the values buffer may be shared/sliced: restrict to this batch
            vals = vals.slice(base, offs[-1] - base)
            offs = offs - base
            lons_all = np.asarray(vals.field("lon"), dtype=np.float64)
            lats_all = np.asarray(vals.field("lat"), dtype=np.float64)
            plon = np.asarray(batch.column("lon"), dtype=np.float64)
            plat = np.asarray(batch.column("lat"), dtype=np.float64)
            flon, flat = refine_foot_points_batch(lons_all, lats_all, offs, plon, plat)
            yield pa.RecordBatch.from_arrays(
                [*batch.columns, pa.array(flon), pa.array(flat)],
                names=[*batch.schema.names, "foot_lon", "foot_lat"],
            )

    return winners.mapInArrow(gen, schema=schema)
