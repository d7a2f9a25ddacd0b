#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N-vs-4N-executor criterion is
evidenced by running the identical job on the identical input at local[8]
and local[32] (fresh JVM each) and reporting throughput at both plus
  efficiency = (throughput_32 / throughput_8) / (32 / 8).

Measurement protocol for this host (virtualized, high run-to-run variance —
±50% observed on identical configs): each parallelism level runs
SPARK_GRAFT_SCALING_RUNS times (default 3), alternating levels to de-bias
machine drift, with page-cache drops and a cooldown between runs; the
per-level result is the MINIMUM pipeline time (noise is strictly additive
here — the fastest run is the closest to the machine's true capability).

Writes BENCH_SCALING.json and a markdown section for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _drop_caches() -> None:
    try:
        subprocess.run(["sync"], check=False)
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3")
    except OSError:
        pass


def run_at(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ONLY_PIPELINE="1",
        SPARK_GRAFT_FIXTURE_SF=os.environ.get("SPARK_GRAFT_FIXTURE_SF", "1.0"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = (
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_CORES", "8,32").split(",")
    )
    n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    cooldown = int(os.environ.get("SPARK_GRAFT_SCALING_COOLDOWN", "20"))
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for i in range(n_runs):
        for cpus in (lo, hi):
            _drop_caches()
            time.sleep(cooldown)
            r = run_at(cpus, sf_dir)
            runs[cpus].append(r)
            print(
                f"run {i + 1}/{n_runs} cores={cpus}: pipeline={r['pipeline_sec']}s "
                f"thr={r['value']}/s",
                file=sys.stderr,
            )
    best_lo = min(runs[lo], key=lambda r: r["pipeline_sec"])
    best_hi = min(runs[hi], key=lambda r: r["pipeline_sec"])
    eff = (best_hi["value"] / best_lo["value"]) / (hi / lo)
    out_name = os.environ.get("SPARK_GRAFT_SCALING_OUT", "BENCH_SCALING.json")
    result = {
        "fixture_sf": best_lo["sf"],
        "n_validated": best_lo["n_validated"],
        "cores_lo": lo,
        "cores_hi": hi,
        "runs_per_level": n_runs,
        "estimator": "min pipeline_sec per level (additive-noise host)",
        "throughput_lo": best_lo["value"],
        "throughput_hi": best_hi["value"],
        "pipeline_sec_lo": best_lo["pipeline_sec"],
        "pipeline_sec_hi": best_hi["pipeline_sec"],
        "all_pipeline_sec_lo": [r["pipeline_sec"] for r in runs[lo]],
        "all_pipeline_sec_hi": [r["pipeline_sec"] for r in runs[hi]],
        "serial_floor_lo": best_lo.get("serial_floor"),
        "serial_floor_hi": best_hi.get("serial_floor"),
        "scaling_efficiency": round(eff, 3),
    }
    with open(out_name, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    # serial-floor regression guard (tools/stage_report.py): when bench ran
    # with SPARK_GRAFT_EVENTLOG, assert the driver-idle decomposition stayed
    # inside budget — a silent regression here is exactly what erodes the
    # N→4N efficiency the north rule gates on. Runs AFTER the artifact is
    # written so a threshold trip never discards the measurement.
    for level, best in ((lo, best_lo), (hi, best_hi)):
        sfm = best.get("serial_floor")
        if sfm and "error" not in sfm:
            max_gap = float(os.environ.get("SPARK_GRAFT_MAX_GAP_S", "10"))
            max_total = float(os.environ.get("SPARK_GRAFT_MAX_TOTAL_GAP_S", "40"))
            assert sfm["max_gap_s"] <= max_gap, (
                f"cores={level}: driver-idle gap {sfm['max_gap_s']}s > {max_gap}s"
            )
            assert sfm["total_gap_s"] <= max_total, (
                f"cores={level}: total driver-idle {sfm['total_gap_s']}s > {max_total}s"
            )


if __name__ == "__main__":
    main()
