"""Structured Streaming ingest (SURVEY.md §2.7).

The reference is a batch tool; the streaming surface here is the engine's
incremental-ingest path for the same documents table:

- `stream_documents`: file-source stream of documents parquet → the same
  explode-free Arrow parser → an entities stream (append mode). New document
  files landing in the directory become parsed entities incrementally.
- `windowed_event_counts`: watermarked tumbling-window aggregation over an
  event stream (late data dropped past the watermark) — the streaming mirror
  of driver_queries.q_event_window_agg.

Both run with Trigger.AvailableNow in tests (bounded, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import DOCUMENTS_SCHEMA
from ..sources.parser import parse_documents


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """Streaming documents(doc_id, spans) → streaming entities."""
    docs = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(path)
    return parse_documents(docs)


def windowed_event_counts(
    events: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data watermark."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → LTZ
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_events(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.readStream.schema(schema).parquet(path)


def stream_interval_join(
    clicks: DataFrame, views: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream interval join: every (click, view) pair of
    the same user with view_ts in [click_ts - horizon, click_ts].

    Both sides carry a watermark equal to the horizon and the join
    condition bounds event time in BOTH directions, so Spark can expire
    join state: a buffered view older than (max click watermark - horizon)
    can never match a future click and is dropped — state is
    horizon-bounded, not unbounded, which is what makes this run forever
    on an infinite stream. A view arriving in one micro-batch joins
    clicks arriving in later batches (and vice versa) through that state —
    see tests/test_streaming_media_dedup.py for the cross-batch proof.
    The flip side of bounded state: an input row arriving LATER than its
    side's watermark allows (older than max-seen event time - horizon) is
    dropped before the join, so emission equals the batch range join only
    for data at most `horizon` out of order — the standard stream-stream
    contract. (The driver-gate run drains everything in one availableNow
    batch, where the watermark is still at epoch and nothing can be late.)
    Outer variants would additionally need the watermark to close rows.
    """
    # Watermarks require TIMESTAMP (instant) columns — an NTZ input is
    # interpreted in the session timezone by this cast, so callers feeding
    # wall-clock NTZ data should pin spark.sql.session.timeZone (a DST
    # boundary inside the horizon would otherwise shift the bound).
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_uid"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    ).withWatermark("c_ts", horizon)
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_uid"),
        F.col("ts").cast("timestamp").alias("v_ts"),
    ).withWatermark("v_ts", horizon)
    joined = c.join(
        v,
        (F.col("c_uid") == F.col("v_uid"))
        & (F.col("v_ts") <= F.col("c_ts"))
        & (F.col("v_ts") >= F.expr(f"c_ts - INTERVAL {horizon}")),
        "inner",
    )
    return joined.select(
        F.col("click_id"),
        F.col("c_uid").alias("user_id"),
        F.col("view_id"),
        F.expr("timestampdiff(MICROSECOND, v_ts, c_ts)").alias("lag_us"),
    )


def stream_osm(spark: SparkSession, path: str, fmt: str = "xml") -> DataFrame:
    """Growing extract directory of native OSM files → streaming entities
    (the incremental-ingest analog of stream_documents for the reference's
    own input formats). ``fmt``: 'xml' (.osm[.gz|.bz2]) or 'pbf'
    (.osm.pbf). Each newly-landed file decodes as one unit inside an
    executor task via the same kernels as the batch readers — binaryFile is
    a streaming-capable source, so checkpointing/AvailableNow semantics
    match the documents stream."""
    bin_schema = (
        "path string, modificationTime timestamp, length long, content binary"
    )
    if fmt == "xml":
        from ..sources.osm_xml import xml_entities_df

        files = (
            spark.readStream.format("binaryFile")
            .schema(bin_schema)
            .option("pathGlobFilter", "*.osm*")
            .load(path)
            .select("path", "content")
        )
        return xml_entities_df(files)
    if fmt == "pbf":
        from collections.abc import Iterator

        import pandas as pd

        from ..schemas import ENTITY_MIN_SCHEMA
        from ..sources.osm_pbf import decode_pbf_buffer

        files = (
            spark.readStream.format("binaryFile")
            .schema(bin_schema)
            .option("pathGlobFilter", "*.pbf")
            .load(path)
            .select("path", "content")
        )
        cols = [f.name for f in ENTITY_MIN_SCHEMA.fields]

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for p, content in zip(pdf["path"], pdf["content"]):
                    rows = decode_pbf_buffer(bytes(content), origin=p)
                    if rows:
                        yield pd.DataFrame(rows, columns=cols)

        return files.mapInPandas(gen, schema=ENTITY_MIN_SCHEMA)
    raise ValueError(f"stream_osm: unknown fmt {fmt!r} (use 'xml' or 'pbf')")
