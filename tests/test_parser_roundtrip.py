"""M0: span-sequence equality — the per-row invariant from BASELINE.json.

parse → serialize must reproduce (kind, text, media_ref, offset order)
exactly per doc_id.
"""

import pyspark.sql.functions as F

from osmi_addresses_spark.sources.parser import parse_documents, serialize_entities


def test_span_roundtrip_exact(spark, small_docs):
    entities = parse_documents(small_docs)
    rebuilt = serialize_entities(entities)

    orig = {r["doc_id"]: r["spans"] for r in small_docs.collect()}
    new = {r["doc_id"]: r["spans"] for r in rebuilt.collect()}
    assert set(orig) == set(new)
    mismatches = [d for d in orig if orig[d] != new[d]]
    assert not mismatches, f"span mismatch for {mismatches[:5]}: {orig[mismatches[0]]} vs {new[mismatches[0]]}"


def test_parse_fields(spark, small_docs, small_world):
    entities = parse_documents(small_docs).cache()
    nodes = entities.filter(F.col("entity") == "node")
    ways = entities.filter(F.col("entity") == "way")
    assert nodes.count() == len(small_world.nodes)
    assert ways.count() == len(small_world.ways)

    # spot check one node with tags against the generator's source of truth
    tagged = [n for n in small_world.nodes if n["tags"]][0]
    row = nodes.filter(F.col("osm_id") == tagged["id"]).collect()[0]
    assert row["lat"] == tagged["lat"]
    assert row["lon"] == tagged["lon"]
    assert dict(row["tags"]) == tagged["tags"]
    assert row["lastchange"] == tagged["ts"]

    wayd = [w for w in small_world.ways if len(w["refs"]) > 2][0]
    row = ways.filter(F.col("osm_id") == wayd["id"]).collect()[0]
    assert list(row["refs"]) == wayd["refs"]
    assert row["lat"] is None

    # noise spans preserved
    noisy = entities.filter(F.size("noise") > 0).count()
    assert noisy > 0
