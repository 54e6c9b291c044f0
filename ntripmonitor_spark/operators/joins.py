"""Temporal join operators Spark has no primitive for: as-of join and
range (interval-containment) join, expressed in the shapes that
survive 100 TB.

* As-of: NOT an inequality join (which Catalyst would plan as a
  BroadcastNestedLoopJoin / cartesian): union both sides, one
  window-sorted pass per key carrying the last right-side timestamp
  forward — the distributed merge-join formulation. One shuffle,
  keyed by the join key; linear scan per partition.
* Range join: NOT `ON ts BETWEEN lo AND hi` (same cartesian trap):
  intervals of bounded length are exploded to the fixed-grain time
  buckets they cover (≤ 2 buckets when grain = max interval length),
  probes join on (key, bucket) — an equi-join Catalyst hash-joins —
  and the exact containment predicate filters the candidates. Each
  (probe, interval) pair meets in exactly one bucket (the probe's),
  so no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ntripmonitor_spark.functions.timeutil import epoch_us


def asof_join_latest(events: DataFrame, right_pred: Column,
                     key_col: str = "user_id", ts_col: str = "ts",
                     tolerance_s: int | None = None) -> DataFrame:
    """For every left row (``right_pred`` false), the latest right row
    timestamp at-or-before its own, per key (inclusive: a right row at
    the exact same timestamp matches).

    Single-pass merge: tag right rows 0 / left rows 1, sort per key by
    (ts, tag, event_id) — right-before-left on ties — and carry the
    last right timestamp forward with ``last(ignorenulls)``. Output:
    (event_id, key, ts, asof_ts, gap_us), gap_us null when no prior
    right row exists.

    ``tolerance_s`` bounds the lookback (pandas ``merge_asof``
    tolerance semantics): a match further back than the tolerance is
    reported as no match (NULL asof_ts/gap_us). Applied as a post-pass
    column condition, so the plan shape — one keyed shuffle, one
    window pass — is unchanged.
    """
    tagged = events.select(
        "event_id", key_col, ts_col,
        F.when(right_pred, 0).otherwise(1).alias("tag"),
    ).withColumn("m_ts", F.when(F.col("tag") == 0, F.col(ts_col)))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("tag").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn("asof_ts", F.last("m_ts", ignorenulls=True).over(w))
    out = filled.filter(F.col("tag") == 1).select(
        "event_id",
        key_col,
        ts_col,
        "asof_ts",
        (epoch_us(ts_col) - epoch_us("asof_ts")).alias("gap_us"),
    )
    if tolerance_s is not None:
        within = F.col("gap_us") <= tolerance_s * 1_000_000
        out = out.select(
            "event_id", key_col, ts_col,
            F.when(within, F.col("asof_ts")).alias("asof_ts"),
            F.when(within, F.col("gap_us")).alias("gap_us"),
        )
    return out


def asof_join_nearest(events: DataFrame, right_pred: Column,
                      key_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """As-of join, ``direction='nearest'`` (pandas merge_asof family;
    aj01 is ``backward``): for every left row, the right-side
    timestamp with the smallest absolute gap — before OR after — per
    key; ties break to the earlier (backward) match.

    Same distributed merge formulation as aj01, still ONE keyed
    shuffle: the backward candidate is ``last(ignorenulls)`` over the
    preceding frame and the forward candidate ``first(ignorenulls)``
    over the following frame — both windows share the identical
    partitioning and sort order, so Catalyst plans them on a single
    exchange. Right rows sort before left rows at equal timestamps
    (tag asc in the backward frame, tag desc in the forward frame's
    mirrored sort would break sharing — instead the forward frame
    starts at ``currentRow``, which is correct because an equal-ts
    right row already matched backward with gap 0 and wins every tie).
    """
    tagged = events.select(
        "event_id", key_col, ts_col,
        F.when(right_pred, 0).otherwise(1).alias("tag"),
    ).withColumn("m_ts", F.when(F.col("tag") == 0, F.col(ts_col)))
    order = [F.col(ts_col).asc(), F.col("tag").asc(), F.col("event_id").asc()]
    base = Window.partitionBy(key_col).orderBy(*order)
    back = F.last("m_ts", ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.first("m_ts", ignorenulls=True).over(
        base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = tagged.withColumn("b_ts", back).withColumn("f_ts", fwd)
    ts_us = epoch_us(ts_col)
    b_gap = ts_us - epoch_us("b_ts")
    f_gap = epoch_us("f_ts") - ts_us
    pick_back = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (b_gap <= f_gap)
    )
    return filled.filter(F.col("tag") == 1).select(
        "event_id",
        key_col,
        ts_col,
        F.when(pick_back, F.col("b_ts")).otherwise(F.col("f_ts")).alias("asof_ts"),
        F.when(pick_back, b_gap).otherwise(f_gap).alias("gap_us"),
    )


def range_join_intervals(events: DataFrame, interval_pred: Column,
                         length_s: int = 300, key_col: str = "user_id",
                         ts_col: str = "ts") -> DataFrame:
    """Interval-containment join: probe rows (``interval_pred`` false)
    against [t, t+length_s) windows opened by interval rows, same key.

    Buckets at ``length_s`` grain: an interval covers its start bucket
    and the next one; probes carry their single bucket; the join is an
    equi-join on (key, bucket) + exact containment filter. Output one
    row per (probe, containing interval): (event_id, interval_id, key,
    ts, interval_start).
    """
    len_us = length_s * 1_000_000
    # F.floor, not a plain long cast: casting truncates toward zero, so for
    # pre-1970 timestamps a probe and its containing interval could land in
    # non-adjacent buckets and the pair would be silently dropped.
    bucket = lambda c: F.floor(epoch_us(c) / len_us).cast("long")  # noqa: E731

    probes = events.filter(~interval_pred).select(
        "event_id", key_col, ts_col, bucket(F.col(ts_col)).alias("bkt")
    )
    intervals = events.filter(interval_pred).select(
        F.col("event_id").alias("interval_id"),
        F.col(key_col).alias("ikey"),
        F.col(ts_col).alias("interval_start"),
        bucket(F.col(ts_col)).alias("b0"),
    ).withColumn("bkt", F.explode(F.array(F.col("b0"), F.col("b0") + 1))).drop("b0")

    joined = probes.join(
        intervals,
        (probes[key_col] == intervals["ikey"]) & (probes["bkt"] == intervals["bkt"]),
    )
    ts_us = epoch_us(ts_col)
    start_us = epoch_us("interval_start")
    return joined.filter((ts_us >= start_us) & (ts_us < start_us + len_us)).select(
        "event_id", "interval_id", key_col, ts_col, "interval_start"
    )


def scd2_history(events: DataFrame, key_col: str = "user_id",
                 attr_col: str = "event_type", ts_col: str = "ts") -> DataFrame:
    """SCD Type-2 history build: collapse a change stream into validity
    intervals — one row per (key, attribute-value run) with
    [valid_from, valid_to) bounds and an ``is_current`` flag, the
    standard warehouse upsert-with-history shape (kimball dimension
    maintenance, here derived from the raw event log).

    Shape: one keyed shuffle. Run detection (``lag``) and interval
    close (``lead`` after the run filter) share the same partitioning
    and sort order, so Catalyst plans both window passes on a single
    exchange; the event log never joins against itself. Per-key work
    is a linear scan, so a skewed key costs O(its rows), not O(rows²).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    runs = events.select("event_id", key_col, ts_col, attr_col).withColumn(
        "_prev", F.lag(attr_col).over(w)
    ).filter(F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev")))
    out = runs.withColumn("valid_to", F.lead(ts_col).over(w))
    return out.select(
        key_col,
        F.col(attr_col).alias("attr_value"),
        F.col(ts_col).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def event_funnel(events: DataFrame, stages: list[tuple[str, str]],
                 key_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Ordered conversion funnel: for each key, the earliest timestamp
    of stage 1, then the earliest stage-2 event strictly after it, and
    so on — the product-analytics "did the user view, then click, then
    purchase, in that order" question.

    stages = [(event_type_value, output_col), ...].

    Shape: chained conditional window minimums over ONE key
    partitioning — stage i's cutoff is a window column stage i+1's
    predicate reads, so Catalyst plans all windows plus the final
    per-key reduction on a single exchange. No joins, no per-stage
    passes over the data.
    """
    w = Window.partitionBy(key_col)
    out = events.select(key_col, ts_col, type_col)
    prev: Column | None = None
    cols = []
    for stage_type, out_col in stages:
        cond = F.col(type_col) == stage_type
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        out = out.withColumn(out_col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = out_col
        cols.append(out_col)
    return out.groupBy(key_col).agg(*[F.min(c).alias(c) for c in cols])


def cohort_retention(events: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    day; for each (cohort_day, days_since) cell, how many of that
    cohort's users were active that day.

    Shape: the cohort assignment is a window minimum on the key
    partitioning (no self-join back onto the activity — the classic
    formulation joins first-seen per user against the event log; the
    window form never moves the log twice), then one aggregate with
    count-distinct. Two exchanges total at any scale.
    """
    w = Window.partitionBy(key_col)
    t0 = F.min(F.col(ts_col)).over(w)
    staged = events.select(
        key_col,
        F.to_date(t0).alias("cohort_day"),
        F.to_date(F.col(ts_col)).alias("_day"),
    )
    return (
        staged.groupBy(
            "cohort_day", F.datediff(F.col("_day"), F.col("cohort_day")).alias("days_since")
        )
        .agg(F.countDistinct(key_col).alias("n_users"))
    )


def interval_overlap_join(events: DataFrame, a_pred: Column, b_pred: Column,
                          a_len_s: int = 300, b_len_s: int = 600,
                          key_col: str = "user_id", ts_col: str = "ts",
                          grain_s: int | None = None) -> DataFrame:
    """Interval-OVERLAP join (the third temporal join Spark lacks,
    after as-of and point-in-interval): bounded intervals opened by
    ``a_pred`` rows ([t, t+a_len_s)) against intervals opened by
    ``b_pred`` rows ([t, t+b_len_s)), same key, one output row per
    overlapping pair with the overlap length.

    NOT ``ON a0 < b1 AND b0 < a1`` (Catalyst plans that inequality
    join as a nested loop): both sides explode to the fixed-grain
    buckets they cover (≤ len/grain + 1 each), the join is an
    equi-join on (key, bucket) + the exact overlap predicate, and each
    pair is credited EXACTLY ONCE by keeping only the bucket holding
    the later interval's start — a time point both intervals cover, so
    the pair is guaranteed to meet there and nowhere else is counted.
    One keyed shuffle; candidate fan-out is bounded by the
    length-to-grain ratios, independent of corpus size.
    """
    g_us = (grain_s or min(a_len_s, b_len_s)) * 1_000_000
    a_us, b_us = a_len_s * 1_000_000, b_len_s * 1_000_000

    def staged(pred: Column, pre: str, length_us: int) -> DataFrame:
        start = epoch_us(ts_col)
        return events.filter(pred).select(
            F.col("event_id").alias(f"{pre}_id"),
            F.col(key_col),
            F.col(ts_col).alias(f"{pre}_start"),
            start.alias(f"{pre}0"),
            (start + length_us).alias(f"{pre}1"),
        ).withColumn(
            "bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{pre}0") / g_us),
                    F.floor((F.col(f"{pre}1") - 1) / g_us),
                )
            ),
        )

    a = staged(a_pred, "a", a_us)
    b = staged(b_pred, "b", b_us).withColumnRenamed(key_col, "_bkey")
    joined = a.join(
        b, (a[key_col] == b["_bkey"]) & (a["bkt"] == b["bkt"])
    )
    credit = F.floor(F.greatest(F.col("a0"), F.col("b0")) / g_us)
    overlap = (F.col("a0") < F.col("b1")) & (F.col("b0") < F.col("a1"))
    return (
        joined.filter(overlap & (a["bkt"] == credit))
        .select(
            "a_id", "b_id", key_col, "a_start", "b_start",
            F.floor(
                (F.least(F.col("a1"), F.col("b1"))
                 - F.greatest(F.col("a0"), F.col("b0"))) / F.lit(1_000_000)
            ).alias("overlap_s"),
        )
    )


def window_funnel(events: DataFrame, stages: tuple[str, str, str] = ("view", "click", "purchase"),
                  window_s: int = 3600, key_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """ClickHouse-``windowFunnel``-style per-instance funnel: for EVERY
    stage-1 event (not per user, like ``event_funnel``), the deepest
    stage reached by a strictly-ordered chain that fits inside
    ``window_s`` of the stage-1 timestamp; output is the (max_step →
    event count, distinct users) histogram.

    Greedy-earliest matching is exact for a 3-step funnel: with
    c* = the earliest stage-2 event after t0, a chain via ANY stage-2
    event c implies a chain via c* (the first stage-3 event after c* is
    at-or-before the one after c), so only c* needs examining.

    Shape: ONE keyed exchange. All three stages sort on
    (epoch, tag, event_id) with LATER stages tagged to sort EARLIER at
    equal timestamps, so a strictly-following row frame never admits an
    equal-timestamp successor — "strictly after" falls out of the sort
    order instead of a per-pair predicate. Two stacked
    ``first(ignorenulls)`` forward frames on that one sort give each
    stage-2 row its next stage-3 epoch and each stage-1 row its
    (stage-2 epoch, that row's stage-3 epoch) pair; a missing stage-3
    match rides as a far-future sentinel so both fields come from the
    SAME stage-2 row (two independent ignorenulls scans could otherwise
    mix rows). The window cap is a post-pass arithmetic check; the
    event log is never self-joined.
    """
    s1, s2, s3 = stages
    w_us = window_s * 1_000_000
    sentinel = F.lit(1 << 62).cast("long")
    e = events.filter(F.col(type_col).isin(*stages)).select(
        "event_id", key_col,
        epoch_us(ts_col).alias("us"),
        F.col(type_col),
        # later funnel stages sort FIRST at equal timestamps
        F.when(F.col(type_col) == s3, 0)
         .when(F.col(type_col) == s2, 1)
         .otherwise(2).alias("tag"),
    )
    base = Window.partitionBy(key_col).orderBy("us", "tag", "event_id")
    fwd = base.rowsBetween(1, Window.unboundedFollowing)
    p_after = F.first(
        F.when(F.col(type_col) == s3, F.col("us")), ignorenulls=True
    ).over(fwd)
    with_p = e.withColumn("p_after", p_after)
    c_us = F.first(
        F.when(F.col(type_col) == s2, F.col("us")), ignorenulls=True
    ).over(fwd)
    c_p = F.first(
        F.when(F.col(type_col) == s2, F.coalesce(F.col("p_after"), sentinel)),
        ignorenulls=True,
    ).over(fwd)
    staged = with_p.withColumn("c_us", c_us).withColumn("c_p", c_p)
    step2 = F.col("c_us").isNotNull() & (F.col("c_us") <= F.col("us") + w_us)
    step3 = step2 & (F.col("c_p") <= F.col("us") + w_us)
    v = staged.filter(F.col(type_col) == s1).select(
        key_col,
        F.when(step3, 3).when(step2, 2).otherwise(1).alias("max_step"),
    )
    return v.groupBy("max_step").agg(
        F.count(F.lit(1)).alias("n_starts"),
        F.count_distinct(key_col).alias("n_users"),
    )


def linear_attribution(events: DataFrame, touch_types: tuple[str, str] = ("view", "click"),
                       convert_type: str = "purchase", window_s: int = 7 * 86400,
                       key_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type") -> DataFrame:
    """Linear (equal-credit) marketing attribution: every conversion
    splits one unit of credit equally across the user's touch events in
    the ``window_s`` lookback ENDING strictly before the conversion;
    output is per-channel total credit plus how many conversions each
    channel participated in.

    Shape: per-channel touch counts are conditional COUNTs over ONE
    value-RANGE window frame (``[-window_us, -1]`` on the epoch order),
    so every channel shares a single keyed exchange and the log is
    never joined against itself (the textbook formulation is a
    conversions×touches inequality join). The value-range frame also
    makes equal-timestamp ties deterministic — frames are by epoch
    VALUE, not peer order. Credit shares are summed as DECIMAL(18,6) on
    both engines (the ``_dsum`` discipline), so the totals are
    summation-order-independent at any partition count.
    """
    w_us = window_s * 1_000_000
    e = events.filter(F.col(type_col).isin(convert_type, *touch_types)).select(
        key_col, F.col(type_col), epoch_us(ts_col).alias("us")
    )
    w = Window.partitionBy(key_col).orderBy("us").rangeBetween(-w_us, -1)
    counts = [
        F.count(F.when(F.col(type_col) == t, F.lit(1))).over(w).alias(f"n_{i}")
        for i, t in enumerate(touch_types)
    ]
    conv = (
        e.select(key_col, type_col, "us", *counts)
        .filter(F.col(type_col) == convert_type)
    )
    n_touch = sum(F.col(f"n_{i}") for i in range(len(touch_types)))
    conv = conv.withColumn("n_touch", n_touch).filter(F.col("n_touch") > 0)
    per_channel = [
        conv.select(
            F.lit(t).alias("channel"),
            F.round(F.col(f"n_{i}") / F.col("n_touch"), 6)
             .cast("decimal(18,6)").alias("share"),
        )
        for i, t in enumerate(touch_types)
    ]
    stacked = per_channel[0]
    for df in per_channel[1:]:
        stacked = stacked.unionByName(df)
    return stacked.groupBy("channel").agg(
        F.sum("share").cast("double").alias("credit"),
        F.count(F.when(F.col("share") > 0, F.lit(1))).alias("n_conversions"),
    )


def scd2_audit(hist: DataFrame, key_col: str = "user_id") -> DataFrame:
    """SCD2 history INTEGRITY audit — the check a warehouse runs after
    every dimension-maintenance batch: per key, are the validity
    intervals a clean chain (no overlaps, no gaps), is there exactly
    one open (NULL valid_to) row, and does the open row come last?
    Emits one corpus-rollup row per violation class so the report is
    O(1) however large the dimension.

    Shape: one window pass on the (key, valid_from) ordering — the
    SAME partitioning the history build used, so run back-to-back the
    audit reuses the exchange — then a per-key flag aggregate and a
    bounded rollup. Per-key work is linear; a skewed key costs O(its
    rows).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col("valid_from").asc(), F.col("attr_value").asc()
    )
    flagged = hist.select(
        key_col, "valid_from", "valid_to",
        F.lag("valid_to").over(w).alias("prev_to"),
        F.lead(F.lit(1)).over(w).isNull().alias("is_last"),
    )
    per_key = flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (F.col("prev_to").isNotNull()
             & (F.col("valid_from") < F.col("prev_to"))).cast("int")
        ).alias("n_overlaps"),
        F.sum(
            (F.col("prev_to").isNotNull()
             & (F.col("valid_from") > F.col("prev_to"))).cast("int")
        ).alias("n_gaps"),
        F.sum(F.col("valid_to").isNull().cast("int")).alias("n_open"),
        F.sum(
            (F.col("valid_to").isNull() & ~F.col("is_last")).cast("int")
        ).alias("n_open_not_last"),
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("n_rows"),
        F.sum((F.col("n_overlaps") > 0).cast("int")).alias("keys_with_overlap"),
        F.sum((F.col("n_gaps") > 0).cast("int")).alias("keys_with_gap"),
        F.sum("n_gaps").alias("total_gaps"),
        F.sum((F.col("n_open") == 0).cast("int")).alias("keys_no_open_row"),
        F.sum((F.col("n_open") > 1).cast("int")).alias("keys_multi_open"),
        F.sum("n_open_not_last").alias("open_rows_not_last"),
    )
