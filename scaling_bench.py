#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N-vs-4N-executor criterion is
evidenced by running the identical job on the identical input at local[8]
and local[32] (fresh JVM each) and reporting throughput at both plus
  efficiency = (throughput_32 / throughput_8) / (32 / 8).

Writes BENCH_SCALING.json and a markdown section for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


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
    lo, hi = 8, 32
    r_lo = run_at(lo, sf_dir)
    r_hi = run_at(hi, sf_dir)
    thr_lo = r_lo["value"]
    thr_hi = r_hi["value"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    result = {
        "fixture_sf": r_lo["sf"],
        "n_validated": r_lo["n_validated"],
        "cores_lo": lo,
        "cores_hi": hi,
        "throughput_lo": thr_lo,
        "throughput_hi": thr_hi,
        "pipeline_sec_lo": r_lo["pipeline_sec"],
        "pipeline_sec_hi": r_hi["pipeline_sec"],
        "scaling_efficiency": round(eff, 3),
    }
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
