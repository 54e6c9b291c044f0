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


CMS_DEPTH = 4
CMS_WIDTH = 512


def _cms_bucket(member_str: Column, d: int, width: int = CMS_WIDTH) -> Column:
    """Row d of the Count-Min hash family: the first 7 hex digits of
    md5('d|member') as an integer, mod width. Portable — DuckDB spells
    the identical bucket as CAST('0x'||substr(md5(..),1,7) AS BIGINT)."""
    h = F.md5(F.concat(F.lit(f"{d}|"), member_str))
    return F.pmod(F.conv(F.substring(h, 1, 7), 16, 10).cast("long"), F.lit(width))


def countmin_counters(df: DataFrame, member_col: str = "user_id",
                      depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """The CMS counter table for one input slice: (d, bkt, cnt).
    Mergeable state — the sketch of a union is the per-(d, bkt) SUM of
    the slices' counters (see ``countmin_merge``), which is what a
    streaming rollup stores per window and what lets 1000 executors
    each sketch their partition and combine for free."""
    m = F.col(member_col).cast("string")
    return (
        df.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(d).alias("d"), _cms_bucket(m, d, width).alias("bkt")
                    )
                    for d in range(depth)
                ])
            ).alias("c")
        )
        .select("c.d", "c.bkt")
        .groupBy("d", "bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_merge(partials: DataFrame) -> DataFrame:
    """Merge unioned per-slice counter tables: per-(d, bkt) sum."""
    return partials.groupBy("d", "bkt").agg(F.sum("cnt").alias("cnt"))


def countmin_heavy_hitters(df: DataFrame, member_col: str = "user_id",
                           top_n: int = 20, depth: int = CMS_DEPTH,
                           width: int = CMS_WIDTH) -> DataFrame:
    """Count-Min sketch frequency estimates for the top-``top_n``
    heavy hitters, alongside the exact counts that bound them
    (CMS guarantees estimate ≥ exact; estimate − exact ≤ εN w.h.p.).

    Deterministic by construction: with a fixed md5-derived hash
    family the counter table — and therefore every estimate — is a
    pure function of the data, so the sketch itself is
    oracle-checkable (unlike HLL/approx_percentile internals).

    Scale shape: the counter build explodes each row into ``depth``
    (row, bucket) pairs, but map-side combine collapses every task's
    output to at most depth×width (=2048 default) partial counters, so
    the exchange moves O(tasks·depth·width) rows no matter how many
    input rows there are — this is exactly why a 100 TB pipeline keeps
    CMS state instead of exact per-key counts. The probe side is
    top_n·depth rows, broadcast onto the counter table. The exact
    counts computed here for comparison are the one piece that would
    be dropped at scale (that aggregate is member-cardinality-bound).
    """
    counters = countmin_counters(df, member_col, depth=depth, width=width)
    exact = df.groupBy(member_col).agg(F.count(F.lit(1)).alias("n_exact"))
    top = exact.orderBy(F.col("n_exact").desc(), F.col(member_col).asc()).limit(top_n)
    probes = top.select(
        member_col,
        "n_exact",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _cms_bucket(F.col(member_col).cast("string"), d, width).alias("bkt"),
                )
                for d in range(depth)
            ])
        ).alias("c"),
    ).select(member_col, "n_exact", "c.d", "c.bkt")
    return (
        counters.join(F.broadcast(probes), ["d", "bkt"])
        .groupBy(member_col, "n_exact")
        .agg(F.min("cnt").alias("n_cms"))
    )


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


def kmv_set_algebra(df: DataFrame, group_col: str = "event_type",
                    member_col: str = "user_id", k: int = 64) -> DataFrame:
    """Theta-sketch-style set algebra over per-group KMV sketches:
    estimated distinct UNION and INTERSECTION of every group pair's
    member sets, computed entirely from the k-hash sketches — the
    reason sketches beat exact distinct at 100 TB is exactly this:
    once per-slice sketches exist (mergeable partial-agg state, k
    8-byte values per group), any cross-slice overlap question is
    sketch-vs-sketch arithmetic on k·|groups| rows, never a second
    corpus pass.

      union     = KMV merge: k smallest of the two sketches' hash
                  union (dedup — a shared member hashes identically),
                  then the standard (k−1)/h_k estimator;
      intersect = theta rule: common hashes below θ = min(θ_A, θ_B),
                  scaled by 2³²/θ.

    Exact counts per group ride along only as the <k fallback (the
    standard KMV small-set rule). Everything is the portable Knuth
    hash — the oracle replays the identical sketches in SQL.
    """
    d = (
        df.select(group_col, member_col)
        .distinct()
        .withColumn("h", F.pmod(F.col(member_col).cast("long") * F.lit(KNUTH), F.lit(1 << 32)))
    )
    w = Window.partitionBy(group_col).orderBy(F.col("h").asc(), F.col(member_col).asc())
    # The sketch relation (k x |groups| rows) feeds FIVE plan branches
    # (theta, both merge legs, both intersection sides); without
    # materialization each branch re-runs the corpus distinct-reduce —
    # the one input-scaled job this operator has. Persisting the
    # bounded sketch makes everything downstream sketch-vs-sketch
    # arithmetic, which is the operator's entire premise. The cache
    # entry (k x |groups| rows, bounded) outlives this call by design —
    # the plan is lazy, so it cannot be unpersisted here; blocks are
    # LRU-evictable and a serving session owns clearCache().
    sk = (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(F.col(group_col).alias("g"), "h", "rk")
        .persist()
    )
    theta = sk.groupBy("g").agg(F.max("h").alias("theta"), F.count(F.lit(1)).alias("n_sk"))

    pairs = (
        theta.select(F.col("g").alias("ga"), F.col("theta").alias("th_a"), F.col("n_sk").alias("na"))
        .crossJoin(theta.select(F.col("g").alias("gb"), F.col("theta").alias("th_b"), F.col("n_sk").alias("nb")))
        .filter(F.col("ga") < F.col("gb"))
    )

    ha = sk.select(F.col("g").alias("ga"), "h")
    hb = sk.select(F.col("g").alias("gb"), "h")
    merged = (
        pairs.select("ga", "gb").join(ha, "ga").select("ga", "gb", "h")
        .unionByName(pairs.select("ga", "gb").join(hb, "gb").select("ga", "gb", "h"))
        .distinct()
    )
    wp = Window.partitionBy("ga", "gb").orderBy(F.col("h").asc())
    msk = merged.withColumn("rk", F.row_number().over(wp)).filter(F.col("rk") <= k)
    mstats = msk.groupBy("ga", "gb").agg(
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("hk_u"),
        F.count(F.lit(1)).alias("n_u"),
    )

    common = (
        ha.join(hb, "h")
        .join(F.broadcast(pairs.select("ga", "gb", F.least("th_a", "th_b").alias("th_min"))), ["ga", "gb"])
        .filter(F.col("h") < F.col("th_min"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )

    out = (
        pairs.join(mstats, ["ga", "gb"], "left")
        .join(common, ["ga", "gb"], "left")
    )
    union_est = F.when(
        F.col("n_u") < k, F.col("n_u").cast("double")
    ).otherwise(F.round(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("hk_u"), 4) + 0.0)
    inter_est = F.round(
        F.coalesce(F.col("n_common"), F.lit(0)).cast("double")
        * F.lit(HASH_SPACE) / F.least("th_a", "th_b").cast("double"),
        4,
    ) + 0.0
    return out.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        union_est.alias("union_est"),
        inter_est.alias("inter_est"),
    )


def kmv_jaccard(df: DataFrame, group_col: str = "event_type",
                member_col: str = "user_id", k: int = 64) -> DataFrame:
    """KMV set ALGEBRA between groups: for every group pair (a < b),
    the sketch-estimated Jaccard and union cardinality of their member
    sets, with the exact values alongside — the mergeable-sketch
    operation that makes an |groups|² audience-overlap matrix cost
    O(k·|groups|²) instead of |groups|² set intersections. The merged
    sketch of a pair is the k smallest hashes of the UNION of the two
    sketches (the KMV union rule); Jaccard ≈ |merged ∩ both sketches|
    / k, union ≈ (k−1)·2³²/h_k(merged).

    Determinism: the Knuth hash is odd-multiplier bijective mod 2³², so
    member hashes are unique and every rank cut is tie-free; estimates
    are exact integer ratios quantized to millionths (tenths for the
    union size) and emitted as BIGINT integer-units columns
    (functions/portable.py). Scale shape: the member-distinct reduce +
    per-group top-k window are sk01's exchanges; everything after runs
    on k·|groups| sketch rows (tiny), and the exact contrast is a
    member-keyed self-join bounded by |groups| rows per member —
    at true scale the exact legs are dropped and only sketches meet.
    """
    from ntripmonitor_spark.functions.portable import quantize

    d = (
        df.select(group_col, member_col)
        .distinct()
        .withColumn(
            "h", F.pmod(F.col(member_col).cast("long") * F.lit(KNUTH), F.lit(1 << 32))
        )
    )
    wg = Window.partitionBy(group_col).orderBy(F.col("h").asc())
    sk = (
        d.withColumn("rk", F.row_number().over(wg))
        .filter(F.col("rk") <= k)
        .select(F.col(group_col).alias("g"), "h")
    )
    sizes = d.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_exact"))

    ga = sizes.select(F.col(group_col).alias("ga"), F.col("n_exact").alias("na"))
    gb = sizes.select(F.col(group_col).alias("gb"), F.col("n_exact").alias("nb"))
    pairs = ga.join(gb, F.col("ga") < F.col("gb"))

    ma = pairs.join(sk, sk["g"] == pairs["ga"]).select(
        "ga", "gb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    mb = pairs.join(sk, sk["g"] == pairs["gb"]).select(
        "ga", "gb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        ma.unionByName(mb)
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("ga", "gb").orderBy(F.col("h").asc())
    top = merged.withColumn("rk", F.row_number().over(wp)).filter(F.col("rk") <= k)
    est = top.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("m"),  # < k when the union is small
        F.sum((F.col("in_a") + F.col("in_b") == 2).cast("int")).alias("overlap"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("hk"),
    )

    # exact contrast: member-keyed self-join, bounded per member
    da = d.select(F.col(group_col).alias("ga"), F.col(member_col).alias("m_id"))
    db = d.select(F.col(group_col).alias("gb"), F.col(member_col).alias("m_id"))
    inter = (
        da.join(db, ["m_id"])
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )

    out = (
        pairs.join(est, ["ga", "gb"], "left")
        .join(inter, ["ga", "gb"], "left")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0)))
    )
    exact_union = F.col("na") + F.col("nb") - F.col("n_inter")
    kmv_j = F.col("overlap").cast("double") / F.col("m").cast("double")
    est_union = F.when(
        F.col("m") < k, F.col("m").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("hk").cast("double")
    )
    exact_j = F.col("n_inter").cast("double") / exact_union.cast("double")
    return out.select(
        F.col("ga").alias("group_a"), F.col("gb").alias("group_b"),
        "n_inter", exact_union.alias("n_union"),
        quantize(exact_j, 6).alias("exact_jaccard_ppm"),
        quantize(kmv_j, 6).alias("kmv_jaccard_ppm"),
        quantize(est_union, 1).alias("kmv_union_e1"),
    )
