#!/usr/bin/env python
"""Per-phase scaling probe: run the bench pipeline once at a given core
count with a kept TableStore, and report how each phase's wall time scales
— separates the compute phases (should scale with cores) from the
host-storage-bound phases (cannot scale on one box) to attribute the
single-box efficiency gap (BASELINE.md scaling section).

Usage: python tools/phase_scaling_probe.py CORES [SF]
Prints one JSON line: {"cores": k, "phases": {...}, "total": s}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cores = int(sys.argv[1])
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    shuffle = int(sys.argv[3]) if len(sys.argv) > 3 else 2 * max(cores, 8)

    from osmi_addresses_spark.fixtures.generator import write_fixture
    from osmi_addresses_spark.io.table import TableStore
    from osmi_addresses_spark.plans.pipeline import run_all
    from osmi_addresses_spark.session import get_spark, warm_python_workers

    fx = write_fixture(sf)
    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/scratch")
    os.makedirs(scratch, exist_ok=True)
    extra = {"spark.local.dir": os.path.join(scratch, "spark-phase-local")}
    # experiment knobs (see BASELINE.md scaling section)
    if os.environ.get("SPARK_GRAFT_NO_AQE"):
        extra["spark.sql.adaptive.enabled"] = "false"
    if os.environ.get("SPARK_GRAFT_LOCALITY0"):
        extra["spark.locality.wait"] = "0"
    if os.environ.get("SPARK_GRAFT_CODEC"):
        extra["spark.sql.parquet.compression.codec"] = os.environ["SPARK_GRAFT_CODEC"]
    evlog = os.environ.get("SPARK_GRAFT_EVLOG")
    if evlog:
        os.makedirs(evlog, exist_ok=True)
        extra.update(
            {"spark.eventLog.enabled": "true", "spark.eventLog.dir": evlog}
        )
    spark = get_spark(
        f"phase-{cores}",
        cores=cores,
        shuffle_partitions=shuffle,
        extra_conf=extra,
    )
    warm_python_workers(spark, cores)
    docs = spark.read.parquet(os.path.join(fx, "documents.parquet"))
    wd = tempfile.mkdtemp(prefix=f"phase{cores}_", dir=scratch)
    store = TableStore(wd)

    phases: dict[str, float] = {}
    t_all = time.time()

    t0 = time.time()
    layers = run_all(spark, docs, store=store, source_path=fx)
    phases["build_plan_and_checkpoints"] = round(time.time() - t0, 2)
    # split out the two store writes from their manifests
    for t in ("entities", "ways_geo"):
        m = store.manifest(t)
        phases[f"write_{t}"] = m["write_seconds"] if m else None

    t0 = time.time()
    n = layers["nodes_with_addresses"].count()
    phases["match_and_nwa"] = round(time.time() - t0, 2)

    from concurrent.futures import ThreadPoolExecutor

    names = [
        "connection_line", "nearest_points", "nearest_roads", "nearest_areas",
        "interpolation", "ways_with_addresses", "entrances",
        "street_not_found", "place_not_found",
    ]
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=len(names)) as ex:
        list(ex.map(lambda nm: layers[nm].count(), names))
    phases["other_layers"] = round(time.time() - t0, 2)

    total = round(time.time() - t_all, 2)
    print(json.dumps({"cores": cores, "sf": sf, "n": n, "total": total, "phases": phases}))
    spark.stop()
    import shutil

    shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
