"""tools/diff_layers.py — the regression-diff analog of the reference's
compare_sqlite.sh: a resumed run must be row-identical to a clean run, and
injected differences must be reported."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmi_addresses_spark.io.table import TableStore  # noqa: E402
from osmi_addresses_spark.plans.pipeline import run_all, write_layers  # noqa: E402
from tools.diff_layers import diff_stores, is_clean  # noqa: E402

LAYERS = ["entrances", "ways_with_postal_code"]


def _run(spark, docs, root):
    store = TableStore(root)
    layers = run_all(spark, docs, store=store)
    write_layers(layers, store, LAYERS)
    return store


def test_resumed_run_matches_clean_run(spark, small_docs, tmp_path):
    s1 = _run(spark, small_docs, str(tmp_path / "clean"))
    s2 = _run(spark, small_docs, str(tmp_path / "resume"))
    # simulate a crash after the ways_geo data landed but before commit:
    # no manifest → table reads as absent → the re-run recomputes it
    os.remove(s2._manifest_path("ways_geo"))
    assert not s2.exists("ways_geo")
    layers = run_all(spark, small_docs, store=s2)
    write_layers(layers, s2, LAYERS)

    report = diff_stores(spark, s1.root, s2.root)
    assert is_clean(report), report
    assert {f"layer_{n}" for n in LAYERS} <= set(report)


def test_diff_reports_injected_difference(spark, small_docs, tmp_path):
    s1 = _run(spark, small_docs, str(tmp_path / "a"))
    s2 = _run(spark, small_docs, str(tmp_path / "b"))
    full = s1.read(spark, "layer_entrances")
    n = full.count()
    assert n > 1
    # drop one row from b's entrances
    import shutil

    shutil.rmtree(s2._dir("layer_entrances"))
    os.remove(s2._manifest_path("layer_entrances"))
    s2.write("layer_entrances", full.limit(n - 1))

    report = diff_stores(spark, s1.root, s2.root, tables=["layer_entrances"])
    e = report["layer_entrances"]
    assert e["only_a"] == 1 and e["only_b"] == 0
    assert e["sample_only_a"]
    assert not is_clean(report)


def test_diff_missing_table(spark, small_docs, tmp_path):
    s1 = _run(spark, small_docs, str(tmp_path / "a2"))
    s2 = TableStore(str(tmp_path / "b2"))
    report = diff_stores(spark, s1.root, s2.root, tables=["layer_entrances"])
    e = report["layer_entrances"]
    assert e["missing_in"] == "b" and e["only_a"] > 0
