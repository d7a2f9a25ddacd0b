"""Deduplication operators beyond the driver-query suite (training-data
pipeline components): SimHash and embedding-cosine near-dup.

All shuffle keys are content-derived (digest / band bucket / hyperplane
signature) — uniform by construction, no skew handling needed; the candidate
joins are equi-joins Catalyst can plan freely.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIMHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
)


def simhash(documents: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """64-bit SimHash over whitespace tokens (Arrow-batched numpy).

    token hash = first 8 bytes of md5 (stable across engines/versions);
    sign-sum per bit, sign → bit.
    """
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = str(text).split()
                if not toks:
                    out.append((doc_id, 0))
                    continue
                hs = np.array(
                    [
                        int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                        for t in set(toks)
                    ],
                    dtype=np.uint64,
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                    np.int64
                )
                sums = (2 * bits - 1).sum(axis=0)
                sig = int(((sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
                out.append((doc_id, sig - (1 << 64) if sig >= (1 << 63) else sig))
            yield pd.DataFrame(out, columns=["doc_id", "simhash"])

    return documents.select(id_col, text_col).mapInPandas(gen, schema=SIMHASH_SCHEMA)


def simhash_near_dups(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4×16-bit keys (any
    pair within hamming ≤ 3 shares at least one exact band), then verify
    hamming distance exactly."""
    sigs = simhash(documents).cache()
    bands = None
    for b in range(4):
        band = sigs.select(
            "doc_id",
            "simhash",
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
        )
        bands = band if bands is None else bands.unionByName(band)
    a, b2 = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b2, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.filter(hamming <= max_hamming).select(
        "doc_a", "doc_b", hamming.alias("hamming")
    )


def embedding_near_dups(
    embeddings: DataFrame,
    id_col="vec_id",
    vec_col="embedding",
    threshold: float = 0.99,
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup: random-hyperplane LSH buckets (deterministic
    seed) → exact cosine verify within buckets. Scale path: the bucket join
    replaces the O(n²) cross join; multiply bucket tables for higher recall."""
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = first["d"]
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)

    def sig_expr(vec):
        bits = None
        for i in range(n_planes):
            dot = F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(x)) for x in planes[i]]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bit = F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
            bits = bit if bits is None else (bits + bit)
        return bits

    e = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    ).withColumn("bucket", sig_expr(F.col("v")))
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .filter(F.col("a.vid") < F.col("b.vid"))
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = dot(F.col("a.v"), F.col("b.v")) / (
        F.sqrt(dot(F.col("a.v"), F.col("a.v"))) * F.sqrt(dot(F.col("b.v"), F.col("b.v")))
    )
    return cand.select(
        F.col("a.vid").alias("vec_a"),
        F.col("b.vid").alias("vec_b"),
        F.round(cos, 6).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)
