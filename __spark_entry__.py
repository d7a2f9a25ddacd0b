"""Driver contract for the spark-graft builder (PySpark target).

entry(): flagship query smoke-check on /root/testdata/sf0.001.
queries()/oracle_sql(): one entry per implemented operator family from
SURVEY.md §2 — relational parity on the star schema, the geospatial engine
over the committed OSM-document fixture (both Spark and the DuckDB oracle
read the same parquet), and the training-data-pipeline operators
(dedup / similarity / text analysis / multimodal plumbing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osmi_addresses_spark import driver_queries as DQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship shape (J3+J5: equi-join + window argmin + when-cascade) on
    the sf0.001 star schema, plus a run of the geospatial flagship on the
    matching OSM fixture to exercise the engine end-to-end."""
    sf_dir = "/root/testdata/sf0.001"
    # geospatial flagship: nearest-street assignment over the OSM fixture
    geo = DQ.g_nearest_street(spark, sf_dir)
    n_matched = geo.count()
    assert n_matched >= 0
    # relational flagship on the driver tables (returned for the smoke check)
    return DQ.q_join_argmin(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return DQ.all_queries()


def oracle_sql() -> dict[str, str]:
    return DQ.all_oracles()
