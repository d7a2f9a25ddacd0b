"""As-of join: for every left event, the most recent right event of the
same key at or before it (ties on timestamp broken by largest right id).

Two result-identical plans:

- `asof_join` — the sort-merge union form: ONE hash exchange on the key,
  one in-partition sort, `last(..., ignorenulls)` over the
  unbounded-preceding frame. The right plan almost always; its only
  pressure point is a pathologically hot key, whose whole history sorts
  in one task.
- `asof_join_bucketed` — the skew-resilient two-level form: rows first
  resolve WITHIN (key, time-bucket) partitions (so a hot key splits
  across its buckets), and left rows with no in-bucket match take the
  bucket "carry" — the latest right row of any strictly-earlier bucket,
  computed as a per-(key, bucket) aggregate followed by a running-max
  window over the key's bucket spine (rows per key = bucket count, tiny)
  and joined back. Exactly the same output as `asof_join` by
  construction: the latest right row ≤ a left row is either in the left
  row's own bucket or is the latest row of an earlier bucket.

Both emit -1 sentinels for match-less left rows so no nullable bigint
reaches downstream hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sides(left: DataFrame, right: DataFrame, key: str, ts: str, idc: str):
    l = left.select(
        F.col(key).alias("k"),
        F.col(ts).alias("t"),
        F.col(idc).alias("l_id"),
        F.lit(1).alias("is_l"),
        F.lit(None).cast("long").alias("r_id"),
        F.lit(None).cast(left.schema[ts].dataType).alias("r_ts"),
    )
    r = right.select(
        F.col(key).alias("k"),
        F.col(ts).alias("t"),
        F.lit(None).cast("long").alias("l_id"),
        F.lit(0).alias("is_l"),
        F.col(idc).alias("r_id"),
        F.col(ts).alias("r_ts"),
    )
    return l, r


def _finish(matched: DataFrame) -> DataFrame:
    return matched.select(
        F.col("l_id").alias("left_id"),
        F.col("k").alias("key"),
        F.coalesce(F.col("m.r_id"), F.lit(-1).cast("long")).alias("right_id"),
        F.coalesce(
            F.expr("timestampdiff(MICROSECOND, m.r_ts, t)"),
            F.lit(-1).cast("long"),
        ).alias("lag_us"),
    )


def asof_join(
    left: DataFrame, right: DataFrame, key: str, ts: str, idc: str
) -> DataFrame:
    """→ (left_id, key, right_id, lag_us); right_id/lag_us = -1 when no
    right row at or before the left row exists for the key."""
    l, r = _sides(left, right, key, ts, idc)
    u = l.unionByName(r)
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_l").asc(), F.col("r_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last(
        F.when(F.col("is_l") == 0, F.struct("r_ts", "r_id")), ignorenulls=True
    ).over(w)
    return _finish(u.withColumn("m", m).filter(F.col("is_l") == 1))


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    idc: str,
    bucket: str = "day",
) -> DataFrame:
    """Result-identical to `asof_join`; sorts per (key, bucket) instead of
    per key, so a hot key's history splits across its time buckets.
    `bucket` is a date_trunc unit (hour/day/week/...)."""
    l, r = _sides(left, right, key, ts, idc)
    b = F.date_trunc(bucket, F.col("t"))
    u = l.unionByName(r).withColumn("b", b)
    # level 1: resolve within (key, bucket) — the hot key's big sort is
    # now bounded by its densest bucket, not its lifetime
    w_in = (
        Window.partitionBy("k", "b")
        .orderBy(F.col("t").asc(), F.col("is_l").asc(), F.col("r_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m_in = F.last(
        F.when(F.col("is_l") == 0, F.struct("r_ts", "r_id")), ignorenulls=True
    ).over(w_in)
    lev1 = u.withColumn("m", m_in).filter(F.col("is_l") == 1)
    # level 2: per-(key, bucket) latest right row (map-side-combined max of
    # a total-order struct), then the carry = running max over strictly
    # earlier buckets on the key's bucket spine. Spine rows per key =
    # number of buckets — the window input is bucket-count-sized, not
    # row-count-sized.
    last_in_bucket = (
        u.filter(F.col("is_l") == 0)
        .groupBy("k", "b")
        .agg(F.max(F.struct("r_ts", "r_id")).alias("lv"))
    )
    spine = u.select("k", "b").distinct().join(last_in_bucket, ["k", "b"], "left")
    w_carry = (
        Window.partitionBy("k")
        .orderBy(F.col("b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = spine.withColumn("cv", F.max("lv").over(w_carry)).select("k", "b", "cv")
    matched = (
        lev1.join(carry, ["k", "b"], "left")
        .withColumn("m", F.coalesce(F.col("m"), F.col("cv")))
        .drop("cv", "b")
    )
    return _finish(matched)
