"""Similarity search over an embedding column (array<float>).

Two tiers, as a training-data pipeline needs them:

- exact brute-force cosine top-k (driver_queries.s_ann_topk): the oracle-
  checkable baseline — O(Q·N) dot products, all JVM Column expressions.
- `ann_ivf_topk` (here): the scale path — IVF coarse quantization. Vectors
  are assigned to their nearest of `nlist` deterministic centroids (one
  shuffle-free Arrow-batched matmul per partition); each query probes its
  `nprobe` closest centroid lists and brute-forces only those buckets.
  Candidate volume drops from Q·N to ~Q·N·(nprobe/nlist) with recall
  controlled by nprobe (tests assert recall@k against the exact baseline).

At 100 TB the same plan holds: centroids are a broadcast-sized side
(kilobytes), assignment is a narrow map, and the probe join is an equi-join
on centroid id — shuffle volume scales with the bucketed candidates only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _unit_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _deterministic_centroids(
    embeddings: DataFrame,
    nlist: int,
    id_col: str,
    vec_col: str,
    sample: int = 4096,
    iters: int = 8,
) -> np.ndarray:
    """nlist unit centroids: seeds = first nlist vectors in stable id-hash
    order, refined with a few spherical-k-means (Lloyd) iterations over a
    hash-ordered sample — fully deterministic (no RNG), driver-side on a
    bounded sample, reproducible across runs and cluster sizes."""
    rows = (
        embeddings.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .withColumn("_h", F.hash(F.col("i")))
        .orderBy("_h", "i")
        .limit(sample)
        .collect()
    )
    x = _unit_rows(np.array([r["v"] for r in rows], dtype=np.float64))
    c = x[:nlist].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c = _unit_rows(c)
    return c


def _assign_batches(cn: np.ndarray, vec_field: str, out_name: str, top: int):
    """mapInArrow generator: append argmax-cosine centroid ids (top=1) or
    the top-`top` probe list for queries."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if not batch.num_rows:
                continue
            col = batch.column(vec_field)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            offs = col.offsets.to_numpy().astype(np.int64)
            vals = np.asarray(col.values, dtype=np.float64)
            base = offs[0]
            vals = vals[base : offs[-1]]
            dim = cn.shape[1]
            m = vals.reshape(-1, dim)
            sims = _unit_rows(m) @ cn.T  # batch × nlist
            if top == 1:
                out = pa.array(np.argmax(sims, axis=1).astype(np.int32))
                yield pa.RecordBatch.from_arrays(
                    [*batch.columns, out], names=[*batch.schema.names, out_name]
                )
            else:
                idx = np.argsort(-sims, axis=1)[:, :top].astype(np.int32)
                lists = pa.FixedSizeListArray.from_arrays(
                    pa.array(idx.ravel()), top
                ).cast(pa.list_(pa.int32()))
                yield pa.RecordBatch.from_arrays(
                    [*batch.columns, lists], names=[*batch.schema.names, out_name]
                )

    return gen


def ann_ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred=None,
) -> DataFrame:
    """IVF approximate top-k neighbours: (q_id, n_id, rank, score).

    ``query_pred``: Column predicate selecting the query rows (default
    ``vec_id < 5`` to mirror the exact baseline).
    """
    if query_pred is None:
        query_pred = F.col(id_col) < 5
    cn = _deterministic_centroids(embeddings, nlist, id_col, vec_col)
    nprobe = min(nprobe, cn.shape[0])

    base = embeddings.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    schema_a = T.StructType(
        list(base.schema.fields) + [T.StructField("centroid", T.IntegerType())]
    )
    bucketed = base.mapInArrow(_assign_batches(cn, "nv", "centroid", 1), schema_a)

    q = embeddings.filter(query_pred).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    schema_q = T.StructType(
        list(q.schema.fields)
        + [T.StructField("probes", T.ArrayType(T.IntegerType()))]
    )
    probed = q.mapInArrow(_assign_batches(cn, "qv", "probes", nprobe), schema_q)
    probed = probed.withColumn("centroid", F.explode("probes")).drop("probes")

    j = probed.join(bucketed, "centroid").filter(F.col("q_id") != F.col("n_id"))

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = dot(F.col("qv"), F.col("nv")) / (
        F.sqrt(dot(F.col("qv"), F.col("qv"))) * F.sqrt(dot(F.col("nv"), F.col("nv")))
    )
    j = j.withColumn("score", F.round(cos, 6))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id").asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "score")
    )
