#!/usr/bin/env python
"""Planet-shaped soak (VERDICT r3 item 8): one large-SF pipeline run with
peak-RSS tracking, committed as a BENCH artifact.

The reference's planet run peaks at 148 GB RSS and documents an
OOM-then-segfault failure mode when the in-memory node-location index
outgrows RAM (/root/reference/README.md:188-197, BASELINE.md). This engine
checkpoints the parsed entities and every shared intermediate to parquet,
so memory is bounded by executor working set, not input size — the soak
evidences that: peak RSS across the whole process tree during an sf100-ish
run, a clean exit, and the layer counts.

    python tools/soak.py [sf] [cpus]    # writes BENCH_SOAK_sf{sf}.json
"""

from __future__ import annotations

import json
import os

import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tree_rss_kb() -> int:
    """Total RSS of this process and every descendant (the JVM and the
    Python workers are children of the bench process), via a /proc walk."""
    total = 0
    me = os.getpid()
    children: dict[int, list[int]] = {}
    rss: dict[int, int] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        rss[int(pid)] = int(line.split()[1])
                        break
            children.setdefault(ppid, []).append(int(pid))
        except (OSError, IndexError, ValueError):
            continue
    stack, seen = [me], set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        total += rss.get(p, 0)
        stack.extend(children.get(p, []))
    return total


class PeakTracker(threading.Thread):
    def __init__(self, interval: float = 2.0):
        super().__init__(daemon=True)
        self.peak_kb = 0
        self.interval = interval
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            self.peak_kb = max(self.peak_kb, _tree_rss_kb())
            self._stop.wait(self.interval)

    def stop(self):
        self._stop.set()


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    cpus = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")

    tracker = PeakTracker()
    tracker.start()
    t0 = time.time()

    os.environ["SPARK_GRAFT_FIXTURE_SF"] = str(sf)
    os.environ["SPARK_GRAFT_BENCH_ONLY_PIPELINE"] = "1"
    import bench

    result = bench.run_bench(cpus, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    wall = time.time() - t0
    tracker.stop()

    out = {
        "soak_sf": sf,
        "cpus": int(cpus),
        "clean_exit": True,
        "total_wall_s": round(wall, 1),
        "pipeline_sec": result["pipeline_sec"],
        "throughput_addr_per_s": result["value"],
        "n_validated": result["n_validated"],
        "peak_rss_gb": round(tracker.peak_kb / 1e6, 2),
        "host_ram_gb": round(
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 1e9, 1
        ),
        "counts": result["counts"],
        "reference_planet_peak_gb": 148,
        "note": (
            "peak RSS = max over the whole process tree (driver JVM + python "
            "workers) sampled every 2s; the reference's in-memory "
            "node-location index OOMs at planet scale (README.md:188-197) "
            "while this engine's checkpointed intermediates keep RSS bounded"
        ),
    }
    name = f"BENCH_SOAK_sf{int(sf)}.json"
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
