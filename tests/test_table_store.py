"""Iceberg-lite TableStore: atomic commit, lineage, resumable write_once."""

import json
import os

from osmi_addresses_spark.io.table import TableStore


def test_write_read_manifest(spark, tmp_path):
    store = TableStore(str(tmp_path / "warehouse"))
    df = spark.range(100).selectExpr("id", "id % 4 AS part")
    store.write("t1", df, partition_by=["part"])
    m = store.manifest("t1")
    assert m["partition_by"] == ["part"]
    assert len([p for p in m["partitions"] if p.startswith("part=")]) == 4
    back = store.read(spark, "t1")
    assert back.count() == 100


def test_write_once_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(10).write.parquet(src)
    store = TableStore(str(tmp_path / "warehouse"))
    calls = []

    def factory():
        calls.append(1)
        return spark.read.parquet(src)

    store.write_once("t2", factory, source_path=src)
    store.write_once("t2", factory, source_path=src)  # skipped: same lineage
    assert len(calls) == 1
    # source changed -> recompute
    spark.range(5).write.mode("append").parquet(src)
    store.write_once("t2", factory, source_path=src)
    assert len(calls) == 2
    assert store.read(spark, "t2").count() == 15


def test_crash_leaves_no_manifest(spark, tmp_path):
    store = TableStore(str(tmp_path / "warehouse"))
    df = spark.range(10)
    store.write("t3", df)
    # simulate torn write: data dir exists but manifest removed
    os.remove(store._manifest_path("t3"))
    assert not store.exists("t3")


def test_write_layers_end_to_end(spark, small_docs, tmp_path):
    from osmi_addresses_spark.plans.pipeline import run_all, write_layers

    store = TableStore(str(tmp_path / "wh"))
    layers = run_all(spark, small_docs)
    paths = write_layers(layers, store, layer_names=["entrances", "nearest_points"])
    for name, p in paths.items():
        m = store.manifest(f"layer_{name}")
        assert m is not None
        assert store.read(spark, f"layer_{name}").count() == layers[name].count()
