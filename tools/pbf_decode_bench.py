#!/usr/bin/env python
"""Micro-benchmark: numpy-vectorized packed-varint scanner vs the
python-loop reference (sources/osm_pbf.py `_packed` vs `_packed_py`).

The packed arrays (dense-node ids/lats/lons, way refs, kv indexes) carry
the overwhelming majority of a planet file's bytes, so this ratio is the
blob-decode throughput ratio to first order.

    python tools/pbf_decode_bench.py
    → one JSON line {"py_mb_s": ..., "np_mb_s": ..., "speedup": ...}
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmi_addresses_spark.sources.osm_pbf import (  # noqa: E402
    _enc_packed,
    _packed,
    _packed_py,
)


def main():
    rng = random.Random(11)
    # delta-coded coordinates: small signed deltas, the dominant shape
    deltas_world = [rng.randrange(-50_000, 50_000) for _ in range(2_000_000)]
    vals = []
    acc = 0
    for d in deltas_world:
        acc += d
        vals.append(acc)
    buf = _enc_packed(vals, signed=True, delta=True)
    mb = len(buf) / 1e6

    # warm both paths (first numpy call pays ufunc/page-cache setup that a
    # long-running decode task pays once), then take best-of-3
    warm = _enc_packed(vals[:500], signed=True, delta=True)
    _packed(warm, signed=True, delta=True)
    _packed_py(warm, signed=True, delta=True)

    def best_of(fn, n=3):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn()
            times.append(time.perf_counter() - t0)
        return r, min(times)

    want, t_py = best_of(lambda: _packed_py(buf, signed=True, delta=True))
    got, t_np = best_of(lambda: _packed(buf, signed=True, delta=True))

    assert list(got) == want
    out = {
        "bytes": len(buf),
        "py_mb_s": round(mb / t_py, 2),
        "np_mb_s": round(mb / t_np, 2),
        "speedup": round(t_py / t_np, 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
