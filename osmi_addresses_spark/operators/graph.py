"""Distributed connected components — the generic clustering primitive
behind raster→vector polygonization (operators/raster.py) and near-dup
document clustering (driver_queries.d_dedup_cluster).

Algorithm: iterative min-label propagation with pointer jumping. Each round
every vertex adopts the minimum of (its label, neighbours' labels, its
label's label); the jump step doubles the propagation radius per round, so
convergence takes O(log component-diameter) shuffle rounds — the standard
distributed CC (large-star/small-star family). All hash-partitioned
equi-joins and hash aggregates; no driver-side graph state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    v_col: str = "v",
    src_col: str = "src",
    dst_col: str = "dst",
    reliable_checkpoint: bool | None = None,
) -> DataFrame:
    """→ (v, component): component = min vertex id reachable.

    ``vertices``: one row per vertex (isolated vertices become singleton
    components). ``edges``: undirected edge list — each pair may appear in
    either (or both) orientations; both directions are materialized here.
    The returned DataFrame is persisted and already materialized (the
    iteration has to run to know the fixpoint); callers may unpersist.

    ``reliable_checkpoint``: per-round state durability. localCheckpoint
    blocks are unreplicated executor-local — in cluster mode one executor
    loss mid-iteration kills the whole job. With True (or by default when
    a checkpoint dir is configured via spark.sparkContext.setCheckpointDir),
    rounds use reliable checkpoint() to that directory instead, surviving
    executor loss; local mode keeps the cheaper localCheckpoint."""
    v = vertices.select(F.col(v_col).alias("k")).distinct()
    e = edges.select(F.col(src_col).alias("ka"), F.col(dst_col).alias("kb"))
    e = e.unionByName(e.selectExpr("kb as ka", "ka as kb")).distinct().persist()

    sc = vertices.sparkSession.sparkContext
    if reliable_checkpoint is None:
        reliable_checkpoint = sc.getCheckpointDir() is not None
    if reliable_checkpoint and sc.getCheckpointDir() is None:
        raise ValueError(
            "reliable_checkpoint=True requires "
            "spark.sparkContext.setCheckpointDir(<fault-tolerant path>)"
        )

    def ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable_checkpoint else df.localCheckpoint(
            eager=True
        )

    # Each round references the previous labels three times (propagate,
    # jump, union), so carrying the logical plan across rounds grows it as
    # 3^rounds and OOMs the planner on long paths. Checkpointing truncates
    # the lineage every round — the iteration state is the materialized
    # block, never the plan. (Checkpointed RDD blocks are released by the
    # ContextCleaner once the previous round's DataFrame goes out of scope.)
    labels = ckpt(v.select("k", F.col("k").alias("lbl")))
    while True:
        prop = (
            e.join(labels, e.ka == labels.k)
            .select(F.col("kb").alias("k"), F.col("lbl"))
        )
        jump = (
            labels.alias("x")
            .join(labels.alias("y"), F.col("x.lbl") == F.col("y.k"))
            .select(F.col("x.k").alias("k"), F.col("y.lbl").alias("lbl"))
        )
        new_labels = ckpt(
            labels.unionByName(prop)
            .unionByName(jump)
            .groupBy("k")
            .agg(F.min("lbl").alias("lbl"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "k")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    out = labels.select(F.col("k").alias("v"), F.col("lbl").alias("component"))
    out = out.persist()
    out.count()  # materialize before dropping the cached edge list
    e.unpersist()
    return out


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    v_col: str = "v",
    src_col: str = "src",
    dst_col: str = "dst",
    reliable_checkpoint: bool | None = None,
) -> DataFrame:
    """→ (v, pr): PageRank after exactly ``iters`` synchronous iterations
    from the uniform init 1/N, damping d. Directed edges (deduped here);
    dangling-vertex mass (no out-edges) is redistributed uniformly each
    iteration, so Σpr stays 1. A FIXED iteration count — not a convergence
    test — makes the result a deterministic function of the graph alone,
    which is what lets the DuckDB oracle unroll the same ``iters`` steps and
    value-match it (driver query `graph_pagerank`).

    Update, written identically in engine and oracle so the fp ops agree:
        pr'(v) = (1-d)/N + d * ( Σ_{u→v} pr(u)/outdeg(u) + dangling/N )

    Scale: each iteration is one hash join ranks⋈edges on src (edges are
    persisted so only the O(N)-row rank state moves) + one map-side-combined
    sum on dst; the dangling mass is a single-scalar driver reduce. Rank
    lineage is checkpoint-truncated per round exactly as in
    connected_components (same executor-loss caveat and opt-in)."""
    v = vertices.select(F.col(v_col).alias("k")).distinct()
    # edges referencing vertices outside `vertices` would silently leak
    # rank mass (their contribution lands on no row of the per-iteration
    # rebuild) — restrict both endpoints to the declared vertex set so the
    # documented Σpr = 1 invariant holds unconditionally
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .join(v.select(F.col("k").alias("src")), "src", "left_semi")
        .join(v.select(F.col("k").alias("dst")), "dst", "left_semi")
        .persist()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()

    sc = vertices.sparkSession.sparkContext
    if reliable_checkpoint is None:
        reliable_checkpoint = sc.getCheckpointDir() is not None
    if reliable_checkpoint and sc.getCheckpointDir() is None:
        raise ValueError(
            "reliable_checkpoint=True requires "
            "spark.sparkContext.setCheckpointDir(<fault-tolerant path>)"
        )

    def ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable_checkpoint else df.localCheckpoint(
            eager=True
        )

    n = v.count()
    if n == 0:
        e.unpersist()
        outdeg.unpersist()
        return v.select(F.col("k").alias("v"), F.lit(0.0).alias("pr"))
    base = (F.lit(1.0) - F.lit(damping)) / F.lit(float(n))
    ranks = ckpt(v.select("k", (F.lit(1.0) / F.lit(float(n))).alias("pr")))
    for _ in range(iters):
        r_od = ranks.join(outdeg, ranks.k == outdeg.src, "left").select(
            "k", "pr", "deg"
        )
        dang = (
            r_od.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("m"))
            .collect()[0]["m"]
        )
        contrib = (
            r_od.filter(F.col("deg").isNotNull())
            .join(e, F.col("k") == e.src)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("c"))
        )
        ranks = ckpt(
            v.join(contrib, v.k == contrib.dst, "left").select(
                "k",
                (
                    base
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.lit(dang) / F.lit(float(n))
                    )
                ).alias("pr"),
            )
        )
    out = ranks.select(F.col("k").alias("v"), "pr").persist()
    out.count()
    e.unpersist()
    outdeg.unpersist()
    return out
