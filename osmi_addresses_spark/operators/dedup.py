"""Deduplication operators beyond the driver-query suite (training-data
pipeline components): SimHash and embedding-cosine near-dup.

All shuffle keys are content-derived (digest / band bucket / hyperplane
signature) — uniform by construction, no skew handling needed; the candidate
joins are equi-joins Catalyst can plan freely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _md5_hash64(col):
    """First 8 bytes of md5(col) as a signed-range-safe pair (hi32, lo32) —
    hash value = hi32·2³² + lo32 big-endian, identical to DuckDB's
    CAST('0x'||substr(md5(x),1,8)/9,8) AS BIGINT) halves (the oracle)."""
    h = F.md5(F.encode(col, "utf-8"))
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return hi, lo


def simhash(documents: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """64-bit SimHash over whitespace tokens — fully JVM-side.

    explode(distinct tokens) → md5-based 64-bit token hash (32-bit halves so
    every shift stays in signed long range) → 64 map-side-combined sign-sum
    aggregates → signature reassembly. No Python in the plan (the round-1
    per-token hashlib loop was this component's throughput floor); md5 keeps
    the DuckDB oracle exact — xxhash64 is the drop-in if oracle parity is
    not needed.
    """
    toks = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), r"[ \t\n\r\f]+")).alias("t"),
        )
        .filter(F.col("t") != "")
        .distinct()
    )
    hi, lo = _md5_hash64(F.col("t"))
    terms = toks.select(
        "doc_id",
        *[
            (
                F.shiftright(lo if i < 32 else hi, i % 32)
                .bitwiseAND(F.lit(1))
                * 2
                - 1
            ).alias(f"b{i}")
            for i in range(64)
        ],
    )
    sums = terms.groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"s{i}") for i in range(64)]
    )
    sig = F.lit(0).cast("long")
    for i in range(63):
        sig = sig + F.when(F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")).otherwise(0)
    sig = sig + F.when(F.col("s63") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(0)
    sigs = sums.select("doc_id", sig.alias("simhash"))
    # docs with no tokens → signature 0 (kept for row parity with input)
    return (
        documents.select(F.col(id_col).alias("doc_id"))
        .join(sigs, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


def simhash_near_dups(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4×16-bit keys (any
    pair within hamming ≤ 3 shares at least one exact band), then verify
    hamming distance exactly. Banding is one posexplode pass (no 4-way
    union rescanning the signature aggregate)."""
    sigs = simhash(documents)
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), b * 16)
                    .bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band", "key"),
    )
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


def plane_signs(n_planes: int, max_dim: int = 256) -> list[list[int]]:
    """Rademacher (±1) hyperplane entries: sign(i,k) = +1 iff the first hex
    digit of md5(f"{i}_{k}") < '8'. Deterministic, engine-agnostic (the
    DuckDB oracle regenerates the identical literals), and valid for
    random-projection LSH (±1 entries preserve the sign-of-dot-product
    collision probability ∝ angle)."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{i}_{k}".encode()).hexdigest()[0] < "8" else -1
            for k in range(max_dim)
        ]
        for i in range(n_planes)
    ]


def embedding_near_dups(
    embeddings: DataFrame,
    id_col="vec_id",
    vec_col="embedding",
    threshold: float = 0.99,
    bands: int = 4,
    rows_per_band: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup: banded random-hyperplane LSH → exact
    cosine verify within band buckets.

    bands × rows_per_band hyperplanes; a pair collides if ALL rows_per_band
    bits of at least one band agree, so per-band bucket count is
    2^rows_per_band per band — size rows_per_band ≈ log2(N / target bucket
    size) so the within-bucket self-join stays near-linear as data grows
    (round 1 used a single 8-bit table: a fixed 256-bucket n²/256 join at
    scale).

    Plane entries are derived JVM-side from the same deterministic rule as
    ``plane_signs`` — sign(i,k) = +1 iff md5(f"{i}_{k}")[0] < '8' — but
    materialized once per DISTINCT vector length into a tiny broadcast
    table rather than baked as fixed-width literals, so arbitrary
    embedding dims (768, 1536, 4096, ...) work with zero oracle drift and
    the per-row cost is one broadcast-hash probe, not n_planes×dim md5
    calls per row.
    """
    n_planes = bands * rows_per_band

    def sign_array(i: int):
        """array<double> of ±1 signs for plane i at the row's `dim`."""
        return F.when(
            F.col("dim") > 0,
            F.transform(
                F.sequence(F.lit(0), F.col("dim") - 1),
                lambda k: F.when(
                    F.substring(
                        F.md5(
                            F.encode(
                                F.concat_ws("_", F.lit(str(i)), k.cast("string")),
                                "utf-8",
                            )
                        ),
                        1,
                        1,
                    )
                    < "8",
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
        ).otherwise(F.array().cast("array<double>"))

    # one row per distinct dim (a column-pruned scan + map-side-combined
    # distinct — tiny at any scale), carrying the n_planes sign arrays
    signs_tbl = (
        embeddings.select(F.size(F.col(vec_col)).alias("dim"))
        .distinct()
        .select("dim", *[sign_array(i).alias(f"sgn{i}") for i in range(n_planes)])
    )

    def dot_signs(i):
        return F.aggregate(
            F.zip_with(
                F.col("v"),
                F.col(f"sgn{i}"),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def band_bucket(b):
        bits = F.lit(0)
        for r in range(rows_per_band):
            i = b * rows_per_band + r
            bits = bits + F.when(dot_signs(i) > 0, F.lit(1 << r)).otherwise(0)
        return bits

    e = (
        embeddings.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("v"),
            F.size(F.col(vec_col)).alias("dim"),
        )
        .join(F.broadcast(signs_tbl), "dim")
        .select(
            "vid",
            "v",
            F.posexplode(F.array(*[band_bucket(b) for b in range(bands)])).alias(
                "band", "bucket"
            ),
        )
    )
    a, b = e.alias("a"), e.alias("b")
    # candidate pairs as bare ids: the multi-band dedup shuffle stays
    # dim-independent; vectors re-join only for the verify step
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(F.col("a.vid").alias("vec_a"), F.col("b.vid").alias("vec_b"))
        .distinct()
    )
    vecs = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    cand = (
        pairs.join(vecs.select(F.col("vid").alias("vec_a"), F.col("v").alias("va")), "vec_a")
        .join(vecs.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb")), "vec_b")
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = dot(F.col("va"), F.col("vb")) / (
        F.sqrt(dot(F.col("va"), F.col("va"))) * F.sqrt(dot(F.col("vb"), F.col("vb")))
    )
    return cand.select(
        "vec_a",
        "vec_b",
        F.round(cos, 6).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)
