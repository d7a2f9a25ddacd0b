"""Unit tests for the deterministic sketches (operators/sketch.py) and
fixed-iteration PageRank (operators/graph.pagerank) — semantics beyond what
the driver oracle rows (approx_distinct_hll / bloom_semi_join /
graph_pagerank / sample_stratified) already hash-prove."""

import math

import pytest
from pyspark.sql import functions as F

from osmi_addresses_spark.operators.graph import pagerank
from osmi_addresses_spark.operators.sketch import (
    bloom_semi_join,
    hll_distinct,
    hll_registers,
)


def test_hll_estimate_within_error_bound(spark):
    # 5k distinct values, p=8 → standard error 1.04/sqrt(256) ≈ 6.5%;
    # assert a generous 3-sigma bound. Duplicates must not move the sketch.
    df = spark.range(5000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    dups = df.unionByName(df.limit(1234))
    est = hll_distinct(dups, ["grp"], "v", p=8).collect()[0]["hll_est"]
    assert abs(est - 5000) / 5000 < 0.20
    # duplicate-insensitivity: registers identical with and without dups
    r1 = sorted(
        (r["bucket"], r["reg"]) for r in hll_registers(df, ["grp"], "v").collect()
    )
    r2 = sorted(
        (r["bucket"], r["reg"]) for r in hll_registers(dups, ["grp"], "v").collect()
    )
    assert r1 == r2


def test_hll_small_range_linear_counting(spark):
    # 10 distinct values → E ≤ 2.5m with zero registers present: the
    # linear-counting branch must engage and be near-exact.
    df = spark.range(10).select(F.lit("g").alias("grp"), F.col("id").alias("v"))
    est = hll_distinct(df, ["grp"], "v", p=8).collect()[0]["hll_est"]
    assert abs(est - 10) < 1.5


def test_hll_rejects_bad_p(spark):
    df = spark.range(4).select(F.lit("g").alias("grp"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        hll_distinct(df, ["grp"], "v", p=7)


def test_bloom_no_false_negatives_and_deterministic(spark):
    build = spark.range(0, 200).select(F.col("id").alias("k"))
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    passed = bloom_semi_join(probe, "k", build, "k", m_bits=4096, k=3)
    got = {r["k"] for r in passed.collect()}
    # every true member passes
    assert set(range(200)) <= got
    # false-positive rate sane for m=4096,k=3,n=200: (1-e^{-kn/m})^k ≈ 0.2%
    fp = len(got) - 200
    assert fp <= 0.02 * 1800, f"{fp} false positives"
    # identical on a re-run (md5, not RNG)
    got2 = {r["k"] for r in bloom_semi_join(probe, "k", build, "k", m_bits=4096, k=3).collect()}
    assert got == got2
    # probe schema preserved (no helper columns leak)
    assert passed.columns == ["k"]


def _pagerank_numpy(n, edges, iters=5, d=0.85):
    """Dense reference: synchronous updates, dangling mass uniform."""
    import numpy as np

    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dang = sum(pr[v] for v in range(n) if v not in out)
        for s, ts in out.items():
            share = pr[s] / len(ts)
            for t in ts:
                nxt[t] += d * share
        nxt += d * dang / n
        pr = nxt
    return pr


def test_pagerank_matches_dense_reference(spark):
    # 6 vertices: a cycle 0→1→2→0, 3→0, 4 dangling, 5 isolated sink of 3
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (3, 5)]
    v = spark.createDataFrame([(i,) for i in range(6)], ["v"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["v"]: r["pr"] for r in pagerank(v, e, iters=5, damping=0.85).collect()}
    want = _pagerank_numpy(6, edges)
    for i in range(6):
        assert got[i] == pytest.approx(want[i], abs=1e-12), i
    # mass conserved
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)


def test_pagerank_empty_graph(spark):
    v = spark.createDataFrame([(1,), (2,)], ["v"])
    e = spark.createDataFrame([], "src long, dst long")
    got = {r["v"]: r["pr"] for r in pagerank(v, e, iters=3).collect()}
    # all mass dangling every round → stays uniform
    assert got[1] == pytest.approx(0.5, abs=1e-12)
    assert got[2] == pytest.approx(0.5, abs=1e-12)


def test_cms_never_underestimates_and_bounded_state(spark):
    from osmi_addresses_spark.operators.sketch import cms_counters, cms_estimate

    # zipf-ish stream: value i appears (200 // (i+1)) + 1 times
    rows = [(i,) for i in range(300) for _ in range(200 // (i + 1) + 1)]
    df = spark.createDataFrame(rows, ["v"])
    exact = {r["v"]: r["c"] for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()}
    # tiny sketch (1 row, 64 cols) → collisions guaranteed; still never under
    counters = cms_counters(df, "v", d=1, w=64)
    assert counters.count() <= 64
    items = df.select("v").distinct()
    est1 = {r["v"]: r["cms_est"] for r in cms_estimate(items, counters, "v", d=1, w=64).collect()}
    assert all(est1[v] >= exact[v] for v in exact)
    assert any(est1[v] > exact[v] for v in exact), "collisions expected at w=64"
    # full-width sketch: d=4 rows tighten the estimate, still never under
    c4 = cms_counters(df, "v", d=4, w=1024)
    assert c4.count() <= 4 * 1024
    est4 = {r["v"]: r["cms_est"] for r in cms_estimate(items, c4, "v", d=4, w=1024).collect()}
    assert all(exact[v] <= est4[v] <= est1[v] for v in exact)


def test_cms_rejects_bad_d(spark):
    from osmi_addresses_spark.operators.sketch import cms_counters

    df = spark.range(3).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        cms_counters(df, "v", d=5)


def test_bloom_filter_is_a_value_not_a_relation(spark):
    # the reworked bloom collects the bit set once (≤ m_bits values) and
    # filters with InSet: arbitrary probe columns (incl. old helper names)
    # pass through untouched, an empty build matches nothing, and an
    # oversized m_bits is rejected as not driver-safe
    build = spark.range(3).select(F.col("id").alias("k"))
    probe = spark.range(5).select(F.col("id").alias("k"), F.lit(1).alias("_bloom_p0"))
    out = bloom_semi_join(probe, "k", build, "k")
    assert out.columns == ["k", "_bloom_p0"]
    assert {r["k"] for r in out.collect()} >= {0, 1, 2}
    assert bloom_semi_join(probe, "k", build.filter("k < 0"), "k").count() == 0
    with pytest.raises(ValueError, match="m_bits"):
        bloom_semi_join(probe, "k", build, "k", m_bits=1 << 23)


def test_weighted_sample_favors_heavy_docs(spark):
    # A-ES sanity on a synthetic frame: with weight 1000 vs 1, the heavy
    # items should dominate the top-k (deterministic md5 draw, so this is a
    # fixed fact of the hash values, checked against an independent python
    # computation rather than probability).
    import hashlib
    import math as m

    rows = [(i, "x", 1000 if i < 20 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    u32 = lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
    key = lambda i, w: m.log((u32(i) + 1.0) / 4294967296.0) / w
    want = [
        i for i, _ in sorted(
            ((i, key(i, 1000 if i < 20 else 1)) for i in range(200)),
            key=lambda t: (-t[1], t[0]),
        )[:5]
    ]
    from osmi_addresses_spark import driver_queries as DQ

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = [
            r["doc_id"]
            for r in DQ.t_sample_weighted(spark, td).orderBy("rn").collect()
        ]
    assert got == want
    assert all(i < 20 for i in got), "all winners should be heavy-weight docs"


def test_hll_merge_equals_union(spark):
    # mergeability: max-merge of two register sets == registers of the union
    from osmi_addresses_spark.operators.sketch import (
        hll_estimate_from_registers,
        hll_merge,
    )

    a = spark.range(0, 3000).select(F.lit("g").alias("grp"), F.col("id").alias("v"))
    b = spark.range(2000, 5000).select(F.lit("g").alias("grp"), F.col("id").alias("v"))
    both = a.unionByName(b)
    merged = hll_merge(
        [hll_registers(a, ["grp"], "v"), hll_registers(b, ["grp"], "v")], ["grp"]
    )
    direct = hll_registers(both, ["grp"], "v")
    as_set = lambda df: {(r["bucket"], r["reg"]) for r in df.collect()}
    assert as_set(merged) == as_set(direct)
    est_m = hll_estimate_from_registers(merged, ["grp"]).collect()[0]["hll_est"]
    est_d = hll_distinct(both, ["grp"], "v").collect()[0]["hll_est"]
    assert est_m == est_d  # bit-identical, not just close


def test_cms_merge_equals_multiset_union(spark):
    from osmi_addresses_spark.operators.sketch import cms_counters, cms_merge

    a = spark.createDataFrame([(i % 7,) for i in range(100)], ["v"])
    b = spark.createDataFrame([(i % 5,) for i in range(80)], ["v"])
    merged = cms_merge([cms_counters(a, "v", d=2, w=64), cms_counters(b, "v", d=2, w=64)])
    direct = cms_counters(a.unionByName(b), "v", d=2, w=64)
    as_set = lambda df: {(r["row"], r["col"], r["cnt"]) for r in df.collect()}
    assert as_set(merged) == as_set(direct)


def test_stream_hll_across_batches(spark, tmp_path):
    # two file drops, one checkpoint: complete-mode streaming agg must
    # carry register state across restarts and end bit-identical to the
    # batch sketch of the union.
    import os

    from osmi_addresses_spark.operators.sketch import hll_registers

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    a = spark.range(0, 400).select(F.lit("t").alias("g"), F.col("id").alias("v"))
    b = spark.range(300, 900).select(F.lit("t").alias("g"), F.col("id").alias("v"))
    a.write.parquet(src)

    def drain(qname):
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        q = (
            hll_registers(stream, ["g"], "v")
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", ck)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain("shll_run1")
    b.write.mode("append").parquet(src)
    drain("shll_run2")
    got = {(r["bucket"], r["reg"]) for r in spark.table("shll_run2").collect()}
    want = {
        (r["bucket"], r["reg"])
        for r in hll_registers(a.unionByName(b), ["g"], "v").collect()
    }
    assert got == want


def test_embed_quantize_invariants(spark, tmp_path):
    # int8 scalar quantization: reconstruction error per element is bounded
    # by half a quantization step, and a constant dimension reconstructs
    # exactly (scale=0 path).
    import os

    from osmi_addresses_spark import driver_queries as DQ

    rows = [
        (i, [float(i), 7.0, (i % 3) * 100.0], 0)  # dim1 constant
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.write.parquet(os.path.join(str(tmp_path), "embeddings.parquet"))
    out = {r["vec_id"]: r for r in DQ.s_embed_quantize(spark, str(tmp_path)).collect()}
    assert len(out) == 50
    # scales: dim0 = 49, dim1 = 0, dim2 = 200 → worst per-element err
    # (scale/510)^2; mse over 3 dims bounded by max single-element err
    worst = (200.0 / 510.0) ** 2
    for r in out.values():
        assert 0 <= r["mse"] <= worst + 1e-12
        assert 0 <= r["q_sum"] <= 3 * 255
    # all-identical vector set except dim0: vec 0 has x=min in dim0 → q=0
    # there; its dim1 (constant) contributes exactly 0 error, making mse
    # only dim0+dim2 rounding — sanity: the minimum vector's dim0 code is 0
    # so q_sum for vec 0 is 0 + 0 + 0 (dim2: 0 % 3 == 0 → min → code 0)
    assert out[0]["q_sum"] == 0


def test_pagerank_conserves_mass_with_external_edges(spark):
    # edges referencing vertices outside the declared set are dropped (both
    # endpoints restricted), so Σpr stays 1 instead of leaking
    v = spark.createDataFrame([(0,), (1,)], ["v"])
    e = spark.createDataFrame([(0, 1), (0, 99), (98, 1)], ["src", "dst"])
    got = {r["v"]: r["pr"] for r in pagerank(v, e, iters=4).collect()}
    assert set(got) == {0, 1}
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-12)
    # identical to the graph with only the in-set edge
    want = {
        r["v"]: r["pr"]
        for r in pagerank(
            v, spark.createDataFrame([(0, 1)], ["src", "dst"]), iters=4
        ).collect()
    }
    assert got == want
