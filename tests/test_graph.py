"""operators/graph.connected_components: hand-checkable graphs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmi_addresses_spark.operators.graph import connected_components  # noqa: E402


def _cc(spark, vertices, edges):
    v = spark.createDataFrame([(x,) for x in vertices], "v long")
    e = spark.createDataFrame(edges or [(None, None)], "src long, dst long").filter(
        "src is not null"
    )
    out = connected_components(v, e)
    got = {r["v"]: r["component"] for r in out.collect()}
    out.unpersist()
    return got


def test_chain_singleton_and_two_components(spark):
    # chain 1-2-3-4, pair 10-11, singleton 20
    got = _cc(spark, [1, 2, 3, 4, 10, 11, 20], [(2, 1), (2, 3), (4, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_long_path_log_rounds(spark):
    # a 64-vertex path exercises pointer jumping (diameter >> rounds)
    n = 64
    got = _cc(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)])
    assert set(got.values()) == {0}


def test_no_edges(spark):
    got = _cc(spark, [5, 6], [])
    assert got == {5: 5, 6: 6}


def test_reliable_checkpoint_mode(spark, tmp_path):
    """checkpoint() rounds (cluster-durable) produce identical components to
    localCheckpoint rounds, and auto-enable once a checkpoint dir is set."""
    import pytest

    v = spark.createDataFrame([(i,) for i in range(8)], ["v"])
    e = spark.createDataFrame([(i, i + 1) for i in range(0, 6)], ["src", "dst"])
    want = {r["v"]: r["component"] for r in connected_components(v, e).collect()}

    with pytest.raises(ValueError, match="setCheckpointDir"):
        connected_components(v, e, reliable_checkpoint=True)

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        got = {
            r["v"]: r["component"]
            for r in connected_components(v, e, reliable_checkpoint=True).collect()
        }
        # with a checkpoint dir configured, reliable mode is the default
        auto = {
            r["v"]: r["component"] for r in connected_components(v, e).collect()
        }
    finally:
        spark.sparkContext.setCheckpointDir(None)
    assert got == want == auto
