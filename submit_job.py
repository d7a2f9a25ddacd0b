#!/usr/bin/env python
"""spark-submit entry point for the full layer pipeline.

Usage (cluster):
    python package.py                       # builds dist/osmi_addresses_spark.zip
    spark-submit --py-files dist/osmi_addresses_spark.zip \
        submit_job.py --input <documents parquet/iceberg path> \
        --output <warehouse dir> [--layers nodes_with_addresses,...]

The job is resumable: re-running with the same --output skips every table
whose manifest lineage still matches (io/table.py); per-partition metrics
land in the manifests.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents table path")
    ap.add_argument("--output", required=True, help="warehouse directory")
    ap.add_argument("--layers", default=None, help="comma list; default all")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from osmi_addresses_spark.io.table import TableStore
    from osmi_addresses_spark.plans.pipeline import run_all, write_layers

    spark = SparkSession.builder.appName("osmi-addresses-spark").getOrCreate()
    store = TableStore(args.output)
    docs = spark.read.parquet(args.input)
    layers = run_all(spark, docs, store=store, source_path=args.input)
    names = args.layers.split(",") if args.layers else None
    paths = write_layers(layers, store, layer_names=names)
    print(json.dumps({"written": paths}))


if __name__ == "__main__":
    sys.exit(main())
