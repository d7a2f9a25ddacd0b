#!/usr/bin/env python
"""Profile the pure-driver plan-construction phase of run_all (no actions).

The serial-floor item: ~8 s of py4j round trips while the cluster idles.
This script times DAG construction only (cache path, no store, no count)
and dumps a cProfile breakdown so the hot constructors are named.
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmi_addresses_spark.fixtures.generator import write_fixture
from osmi_addresses_spark.plans.pipeline import run_all
from osmi_addresses_spark.session import get_spark


def main():
    fx = write_fixture(0.001)
    spark = get_spark("plan-profile", cores="8")
    docs = spark.read.parquet(os.path.join(fx, "documents.parquet"))

    # warm-up construction (py4j classloading, first-touch caches)
    t0 = time.time()
    run_all(spark, docs)
    warm = time.time() - t0

    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    layers = run_all(spark, docs)
    prof.disable()
    cold = time.time() - t0

    print(f"construction: warm-up {warm:.2f}s, profiled {cold:.2f}s, "
          f"{len(layers)} layers")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    st.print_stats(30)
    st.sort_stats("tottime")
    st.print_stats(20)
    spark.stop()


if __name__ == "__main__":
    main()
