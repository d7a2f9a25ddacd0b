"""Document-table source.

The engine's source of truth is an Iceberg-style table
``documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
(BASELINE.json input_hint). Locally this is partitioned Parquet; the reader
below is where a real ``spark.read.format("iceberg")`` would swap in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_documents(spark: SparkSession, path: str) -> DataFrame:
    """Read the documents table (directory of parquet or a single file)."""
    return spark.read.parquet(path)
