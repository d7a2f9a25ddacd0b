"""Multimodal columns: media spans as opaque references with typed metadata.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_media` raises NotImplementedError unless `fake=True`, in which case a
deterministic hash-derived feature vector stands in for real features. The
Spark-side plumbing — schema, Arrow batching via mapInPandas, partitioning —
is real and tested; swapping in a real decoder only changes `_fake_features`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_features(ref: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: md5(ref) → 8 floats."""
    h = hashlib.md5(ref.encode()).digest()
    return (np.frombuffer(h[:FEATURE_DIM], dtype=np.uint8).astype(np.float32) / 255.0)


def decode_media(ref: str, payload: bytes | None = None, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_features(ref)
    raise NotImplementedError(
        "real media decode requires image/audio libs not present in this "
        "container; run with fake=True for the deterministic stand-in"
    )


def media_spans(entities: DataFrame) -> DataFrame:
    """entities → one row per media span (doc_id, media_ref, caption)."""
    media = F.filter(F.col("noise"), lambda s: s["kind"] == "media")
    return (
        entities.filter(F.size(media) > 0)
        .select("doc_id", F.explode(media).alias("m"))
        .select(
            "doc_id",
            F.col("m")["media_ref"].alias("media_ref"),
            F.col("m")["text"].alias("caption"),
        )
    )


def extract_media_features(entities: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over media spans (mapInPandas).

    One batch in → one batch out; per-batch numpy work, no per-row Python in
    the Spark plan. Partitioning/batching is identical to what a real
    decoder would use.
    """
    spans = media_spans(entities)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [
                _fake_features(r).tolist() for r in pdf["media_ref"].tolist()
            ]
            pdf = pdf.assign(features=feats)
            yield pdf[["doc_id", "media_ref", "caption", "features"]]

    return spans.mapInPandas(gen, schema=MEDIA_FEATURE_SCHEMA)
