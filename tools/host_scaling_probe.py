#!/usr/bin/env python
"""Host scaling-capability probe — context for BENCH_SCALING numbers.

Two microbenchmarks, each run at k = 1, 2, 4, 8, 16, 32 processes:

- cpu: L2-resident numpy arithmetic (no DRAM pressure) — measures how many
  truly concurrent compute threads the (virtualized) host sustains.
- membw: STREAM-like 200 MB copies — measures aggregate memory bandwidth
  vs process count.

A data-engine pipeline sits between the two: its achievable N→4N scaling
efficiency on a single box is bounded by these curves. On a real cluster,
going N→4N *executors* multiplies memory bandwidth by 4 — single-box
core-scaling beyond the bandwidth saturation point understates cluster
scaling, which is why BENCH evidence also reports a below-saturation pair.

Prints one JSON line: {probe: {k: {"wall": s, "per_unit": s, "total_rate": x}}}
"""

from __future__ import annotations

import json
import time
from multiprocessing import Process, Queue

import numpy as np


def _cpu_work(q: Queue) -> None:
    rng = np.random.RandomState(0)
    a = rng.rand(200_000)  # ~1.6 MB: L2-resident
    s = 0.0
    t0 = time.process_time()
    for _ in range(300):
        s += float(np.hypot(a, a[::-1]).sum())
    q.put(time.process_time() - t0)


def _membw_work(q: Queue) -> None:
    a = np.ones(200_000_000 // 8)
    b = np.empty_like(a)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 3:
        np.copyto(b, a)
        n += 1
    q.put(n * a.nbytes * 2 / (time.time() - t0) / 1e9)


def _run(target, k: int) -> tuple[float, list[float]]:
    q: Queue = Queue()
    ps = [Process(target=target, args=(q,)) for _ in range(k)]
    t0 = time.time()
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return time.time() - t0, vals


def main() -> None:
    out: dict = {}
    for name, target in (("cpu", _cpu_work), ("membw", _membw_work)):
        out[name] = {}
        for k in (1, 2, 4, 8, 16, 32):
            wall, vals = _run(target, k)
            if name == "cpu":
                out[name][k] = {"wall": round(wall, 2), "mean_cpu_s": round(sum(vals) / k, 2)}
            else:
                out[name][k] = {"total_GBps": round(sum(vals), 1), "per_proc_GBps": round(sum(vals) / k, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
