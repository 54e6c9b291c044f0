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

from pyspark.sql import DataFrame, Window
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
