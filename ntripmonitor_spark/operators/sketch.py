"""Deterministic distinct-count sketch: K-minimum-values (KMV).

Why not `approx_count_distinct`: Spark's HLL++ and DuckDB's HLL give
different estimates, so the result would be unverifiable. KMV with a
fixed portable hash is exactly reproducible in ANY engine while still
being a genuine sketch — O(k) state per group, mergeable (union of two
sketches = k smallest of the concatenation), and the standard
(k−1)/R_k estimator.

Scale shape: one distinct-reduce keyed by (group, member) — map-side
combine collapses repeats — then a per-group top-k window (rank ≤ k
keeps only k·|groups| rows past the exchange). At 100 TB the sketch
column itself (k 8-byte hashes per group) is what a rollup stores and
merges, not the member set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ntripmonitor_spark.operators.sampling import KNUTH

HASH_SPACE = float(1 << 32)


def kmv_distinct(df: DataFrame, group_col: str = "event_type",
                 member_col: str = "user_id", k: int = 64) -> DataFrame:
    """Per-group KMV distinct estimate of ``member_col``, alongside the
    exact count for verification. Estimate = (k−1)·2³²/h_k where h_k is
    the k-th smallest member hash; groups with fewer than k distinct
    members fall back to the exact count (the standard KMV rule)."""
    d = (
        df.select(group_col, member_col)
        .distinct()
        .withColumn("h", F.pmod(F.col(member_col).cast("long") * F.lit(KNUTH), F.lit(1 << 32)))
    )
    w = Window.partitionBy(group_col).orderBy(F.col("h").asc(), F.col(member_col).asc())
    kth = (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == k)
        .select(group_col, F.col("h").alias("hk"))
    )
    exact = d.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    est = F.when(
        F.col("exact_distinct") < k, F.col("exact_distinct").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("hk"), 4) + 0.0
    )
    return (
        exact.join(kth, group_col, "left")
        .select(group_col, "exact_distinct", est.alias("kmv_estimate"))
    )


# ---------------------------------------------------------------------------
# Mergeable KMV state — the property the sketch exists for, exercised
# by the streaming twin (streaming/pipeline.kmv_sink + merge-on-read).
# ---------------------------------------------------------------------------


def kmv_hash(member: Column) -> Column:
    return F.pmod(member.cast("long") * F.lit(KNUTH), F.lit(1 << 32))


def kmv_partial(df: DataFrame, group_col: str = "event_type",
                member_col: str = "user_id", k: int = 64) -> DataFrame:
    """One slice's KMV state: the ≤k smallest member hashes per group,
    with the member kept for cross-slice dedup. Mergeable: the union
    of two states re-ranked to k is the state of the union."""
    d = (
        df.select(group_col, member_col)
        .distinct()
        .withColumn("h", kmv_hash(F.col(member_col)))
    )
    w = Window.partitionBy(group_col).orderBy(F.col("h").asc(), F.col(member_col).asc())
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(group_col, member_col, "h")
    )


def kmv_merge_estimate(partials: DataFrame, group_col: str = "event_type",
                       member_col: str = "user_id", k: int = 64) -> DataFrame:
    """Merge-on-read over unioned partial states: dedup members seen in
    several slices, re-rank to the global k smallest, apply the
    (k−1)·2³²/h_k estimator (groups still under k members report their
    exact size — identical to the batch ``kmv_distinct`` estimate)."""
    d = partials.select(group_col, member_col, "h").distinct()
    w = Window.partitionBy(group_col).orderBy(F.col("h").asc(), F.col(member_col).asc())
    state = d.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    agg = state.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_state"), F.max("h").alias("hk")
    )
    est = F.when(
        F.col("n_state") < k, F.col("n_state").cast("double")
    ).otherwise(F.round(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("hk"), 4) + 0.0)
    return agg.select(group_col, est.alias("kmv_estimate"))
