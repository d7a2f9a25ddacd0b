"""Native OSM PBF ingestion (sources/osm_pbf.py): wire-format round-trip
against the span parser, blob-parallel decode, and pipeline equivalence.

PBF stores coordinates as 1e-7-degree fixed point (granularity 100), so
coordinate comparisons use that quantum; everything else is exact."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmi_addresses_spark.sources.osm_pbf import (  # noqa: E402
    read_osm_pbf,
    scan_blobs,
    write_osm_pbf,
)
from osmi_addresses_spark.sources.parser import parse_documents  # noqa: E402


def _norm(rows, coord_digits=7):
    out = []
    for r in rows:
        d = r.asDict(recursive=True)
        out.append(
            (
                d["entity"],
                d["osm_id"],
                None if d["lat"] is None else round(d["lat"], coord_digits),
                None if d["lon"] is None else round(d["lon"], coord_digits),
                d["lastchange"],
                tuple(sorted((d["tags"] or {}).items())),
                tuple(d["refs"] or ()),
            )
        )
    return sorted(out, key=str)


def test_pbf_matches_span_parser(spark, small_world, small_docs, tmp_path):
    p = write_osm_pbf(
        str(tmp_path / "world.osm.pbf"), small_world.nodes, small_world.ways
    )
    via_pbf = _norm(read_osm_pbf(spark, p).collect())
    via_spans = _norm(parse_documents(small_docs, minimal=True).collect())
    assert via_pbf == via_spans


def test_pbf_blob_parallelism(spark, small_world, tmp_path):
    # small blob size → many OSMData blobs → many independent decode tasks
    p = write_osm_pbf(
        str(tmp_path / "many.osm.pbf"),
        small_world.nodes,
        small_world.ways,
        blob_nodes=50,
    )
    blobs = scan_blobs(p)
    assert len(blobs) > 5, "expected multiple blobs"
    assert all(t == "OSMData" for *_x, t in blobs)
    ents = read_osm_pbf(spark, p)
    assert ents.filter("entity = 'node'").count() == len(small_world.nodes)
    assert ents.filter("entity = 'way'").count() == len(small_world.ways)


def test_pipeline_from_pbf(spark, small_world, small_docs, tmp_path):
    from osmi_addresses_spark.plans.pipeline import run_all

    p = write_osm_pbf(
        str(tmp_path / "world.osm.pbf"), small_world.nodes, small_world.ways
    )
    from_pbf = run_all(spark, None, entities=read_osm_pbf(spark, p))
    from_docs = run_all(spark, small_docs)
    for layer in ("entrances", "ways_with_postal_code"):
        a, b = from_pbf[layer], from_docs[layer]
        assert a.count() == b.count() > 0
        # coords differ below the 1e-7 PBF quantum; compare non-geom columns
        cols = [c for c in a.columns if c != "geom"]
        assert a.select(cols).exceptAll(b.select(cols)).count() == 0, layer
