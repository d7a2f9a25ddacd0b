"""SparkSession factory with scale-oriented defaults.

Designed for a multi-executor cluster at 100 TB (AQE on, skew-join handling,
Arrow transfers); tested on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # Adaptive execution: runtime re-plan, skew-join splitting, coalescing
    # of small shuffle partitions — our backstop for hot (name, cell) groups.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Arrow for all pandas/Arrow UDF exchange (the parser hot path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Sized for local runs; on a real cluster set via spark-submit.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.driver.memory": "8g",
    # Parquet scan hygiene.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Broadcast threshold: dimension-sized sides (places at small SF) go
    # broadcast automatically; big fact-fact joins stay shuffle.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.ui.enabled": "false",
    # deterministic timestamp semantics for the DuckDB oracle comparisons
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.extraJavaOptions": "-Djava.net.preferIPv6Addresses=false",
}


def get_spark(
    app_name: str = "osmi-addresses-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or '*'.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cores}]")
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
