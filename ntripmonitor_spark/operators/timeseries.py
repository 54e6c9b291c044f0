"""Per-key time-series operators: rolling-statistic anomaly detection
and gap filling (LOCF + linear interpolation) over a bucket spine.

These extend the reference's gap analytics — the Grafana heatmap panel
counts epochs per (bucket, mountpoint) and reads empty buckets as data
gaps (/root/reference/initgrafana/dashboards/RTCM monitor.json:949,
SURVEY.md §2.5 Q16) — to the fill side TimescaleDB users get from
``locf()``/``interpolate()`` in time_bucket_gapfill.

100 TB shapes: both operators are window passes over a single keyed
exchange (the key partitioning bounds state; no self-joins). The spine
explode in :func:`gap_fill` emits (range/bucket) rows per key — output-
proportional, not input-proportional — and composes with the shard
trick from the packing operators if one key's range dwarfs the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ntripmonitor_spark.functions.timeutil import epoch_us


def rolling_zscore(events: DataFrame, n: int = 20, key_col: str = "user_id",
                   ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """z-score of each value against the trailing ``n`` values of the
    same key (the current row excluded, so a spike can't mask itself).

    One exchange on the key; the rolling frame is ROWS-bounded so
    per-row state is O(n) regardless of data volume.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
        .rowsBetween(-n, -1)
    )
    return events.select(
        "event_id",
        key_col,
        ts_col,
        value_col,
        F.avg(value_col).over(w).alias("roll_mean"),
        F.stddev_samp(value_col).over(w).alias("roll_std"),
        F.count(value_col).over(w).alias("roll_n"),
    )


def zscore_anomalies(events: DataFrame, n: int = 20, z: float = 3.0,
                     min_n: int = 8, **kw) -> DataFrame:
    """Events whose value sits more than ``z`` rolling standard
    deviations from the trailing mean (warm-up rows with fewer than
    ``min_n`` trailing samples are not judged)."""
    r = rolling_zscore(events, n=n, **kw)
    zcol = (F.col("value") - F.col("roll_mean")) / F.col("roll_std")
    return (
        r.filter((F.col("roll_n") >= min_n) & (F.col("roll_std") > 0))
        .withColumn("zscore", zcol)
        .filter(F.abs(F.col("zscore")) > z)
        .select("event_id", "user_id", "ts", "value", "zscore")
    )


def event_transitions(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """First-order Markov transition matrix of event types: for every
    observed (prev_type → next_type) step within a key's timeline, the
    step count and the conditional probability P(next | prev).

    The per-key sequencing is one ``lag`` window pass (a single
    exchange on ``key_col``); the matrix aggregation that follows is a
    standard hash aggregate with map-side combine, and the probability
    normalization runs over the aggregated matrix — |types|² rows, not
    the event stream — so nothing after the first exchange scales with
    input volume. Extends the reference's per-mountpoint message-type
    frequency panel (SURVEY.md §2.5 Q5) to type *sequences*.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    steps = (
        events.select(
            key_col,
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_prev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_prev), 9).alias("p"),
    )


def gap_fill(events: DataFrame, bucket_s: int = 3600, key_col: str = "user_id",
             ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Dense per-key bucket series with gap fill.

    Buckets ``ts`` at ``bucket_s`` grain, averages observed values per
    (key, bucket), then generates every bucket between each key's first
    and last observation and fills the empty ones two ways:

    * ``v_locf``  — last observation carried forward;
    * ``v_interp`` — linear interpolation between the surrounding
      observations (null before the first / after the last, where LOCF
      still answers).

    Output: (key, bkt, v_obs, v_locf, v_interp) — ``v_obs`` null marks
    a filled gap. Two exchanges: the bucket aggregation and the spine
    window pass, both keyed by ``key_col``.
    """
    bkt_us = bucket_s * 1_000_000
    observed = (
        events.select(
            key_col,
            F.floor(epoch_us(ts_col) / bkt_us).cast("long").alias("bkt"),
            F.col(value_col).alias("v"),
        )
        .groupBy(key_col, "bkt")
        .agg(F.avg("v").alias("v_obs"))
    )
    spine = (
        observed.groupBy(key_col)
        .agg(F.min("bkt").alias("_mn"), F.max("bkt").alias("_mx"))
        .select(key_col, F.explode(F.sequence("_mn", "_mx")).alias("bkt"))
    )
    dense = spine.join(observed, [key_col, "bkt"], "left")

    w_back = (
        Window.partitionBy(key_col).orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key_col).orderBy("bkt")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last("v_obs", ignorenulls=True).over(w_back)
    next_v = F.first("v_obs", ignorenulls=True).over(w_fwd)
    prev_b = F.last(F.when(F.col("v_obs").isNotNull(), F.col("bkt")), ignorenulls=True).over(w_back)
    next_b = F.first(F.when(F.col("v_obs").isNotNull(), F.col("bkt")), ignorenulls=True).over(w_fwd)

    interp = F.when(
        F.col("v_obs").isNotNull(), F.col("v_obs")
    ).otherwise(
        prev_v + (next_v - prev_v) * (F.col("bkt") - prev_b) / (next_b - prev_b)
    )
    return dense.select(
        key_col,
        "bkt",
        "v_obs",
        prev_v.alias("v_locf"),
        interp.alias("v_interp"),
    )


def seasonal_anomalies(events: DataFrame, z: float = 3.0, min_n: int = 12,
                       key_col: str = "event_type", ts_col: str = "ts",
                       value_col: str = "value") -> DataFrame:
    """Seasonality-aware anomaly detection: score each event against
    the (key, hour-of-day) baseline rather than a trailing window —
    the complement of `rolling_zscore` for metrics with a daily cycle
    (an 09:00 traffic spike is normal at 09:00, anomalous at 03:00).

    Scale shape: the baseline is one map-side-combined aggregate to
    |keys|×24 rows, broadcast back onto the stream — the corpus never
    shuffles (contrast an01's keyed window sort). Baselines with
    fewer than ``min_n`` observations or zero variance don't judge.
    """
    hod = F.hour(F.col(ts_col))
    base = (
        events.groupBy(key_col, hod.alias("hod"))
        .agg(
            F.avg(value_col).alias("mu"),
            F.stddev_samp(value_col).alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    zcol = (F.col(value_col) - F.col("mu")) / F.col("sd")
    return (
        events.withColumn("hod", hod)
        .join(F.broadcast(base), [key_col, "hod"])
        .filter((F.col("n") >= min_n) & (F.col("sd") > 0) & (F.abs(zcol) > z))
        .select("event_id", key_col, ts_col, value_col, F.round(zcol, 6).alias("zscore"))
    )


def mean_shift_changepoints(events: DataFrame, n: int = 10,
                            threshold: float = 40.0,
                            key_col: str = "user_id", ts_col: str = "ts",
                            value_col: str = "value") -> DataFrame:
    """Changepoint detection by windowed mean shift: for every event,
    the mean of the trailing ``n`` values (current row excluded) vs
    the mean of the leading ``n`` values (current row included); rows
    where the level moved by more than ``threshold`` are flagged.

    The CUSUM recursion is inherently sequential (S_i depends on
    S_{i-1} through a max), so the distributed-friendly formulation is
    this two-sided window contrast — the standard e-divisive/sliding
    window changepoint family. Both frames are ROWS-bounded on the
    SAME key partitioning and sort, so Catalyst plans one exchange and
    per-row state is O(n) at any scale. Warm-up/cool-down rows with
    short windows are not judged.
    """
    order = (F.col(ts_col).asc(), F.col("event_id").asc())
    wt = Window.partitionBy(key_col).orderBy(*order).rowsBetween(-n, -1)
    wl = Window.partitionBy(key_col).orderBy(*order).rowsBetween(0, n - 1)
    staged = events.select(
        "event_id", key_col, ts_col,
        F.avg(value_col).over(wt).alias("trail_mean"),
        F.avg(value_col).over(wl).alias("lead_mean"),
        F.count(value_col).over(wt).alias("n_trail"),
        F.count(value_col).over(wl).alias("n_lead"),
    )
    shift = F.col("lead_mean") - F.col("trail_mean")
    return (
        staged.filter((F.col("n_trail") == n) & (F.col("n_lead") == n))
        .filter(F.abs(shift) > threshold)
        .select(
            "event_id", key_col, ts_col,
            F.round("trail_mean", 6).alias("trail_mean"),
            F.round("lead_mean", 6).alias("lead_mean"),
            F.round(shift, 6).alias("shift"),
        )
    )


def ewma_daily(events: DataFrame, alpha: float = 0.3,
               key_col: str = "event_type", ts_col: str = "ts",
               value_col: str = "value") -> DataFrame:
    """Per-key exponentially-weighted moving average of the daily mean
    — the classic control-chart smoother — WITHOUT a sequential
    recursion: ewma_t = a·x_t + (1-a)·ewma_{t-1} unrolls to the closed
    form (1-a)^t · Σ_i c_i·x_i·(1-a)^(-i)  (c_0 = 1, else a), which is
    one window running sum over the daily aggregate. Recursions that
    unroll to a weighted prefix sum belong in a window, not a loop.

    Scale shape: the per-(key, day) mean is a map-side-combined
    aggregate to |keys|×|days| rows; the EWMA pass is a window over
    that BOUNDED relation — the raw corpus is aggregated once and
    never window-sorted. The daily mean aggregates in exact decimal so
    the value is independent of float summation order.

    Numeric bound: (1-a)^(-i) grows geometrically — fine to ~10^4
    points per key in IEEE double (alpha 0.3 → overflow near t≈2000);
    longer series need segment-wise restarts of the same plan. Daily
    grains never get there (10^4 days ≈ 27 years).
    """
    # to_date, not date_trunc: the day grain is a calendar DATE (and
    # DuckDB's date_trunc('day') yields DATE — keeping the types aligned
    # keeps the cross-engine value canon aligned too)
    day = F.to_date(F.col(ts_col).cast("timestamp_ltz"))
    daily = events.groupBy(F.col(key_col), day.alias("day")).agg(
        (F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1))).alias("x")
    )
    w = Window.partitionBy(key_col).orderBy("day")
    i = F.row_number().over(w) - 1
    staged = daily.withColumn("i", i)
    decay = F.lit(1.0 - alpha)
    coeff = F.when(F.col("i") == 0, F.lit(1.0)).otherwise(F.lit(alpha))
    term = F.col("x") * coeff * F.pow(F.lit(1.0) / decay, F.col("i"))
    acc = F.sum(term).over(
        Window.partitionBy(key_col).orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return staged.select(
        key_col,
        "day",
        F.round("x", 6).alias("day_mean"),
        F.round(F.pow(decay, F.col("i")) * acc, 6).alias("ewma"),
    )


def ohlc_downsample(events: DataFrame, bucket_s: int = 3600,
                    key_col: str = "event_type", ts_col: str = "ts",
                    value_col: str = "value") -> DataFrame:
    """OHLC downsampling — the render-side reduction every dashboard
    applies before plotting a dense series: per (key, time bucket) the
    opening / high / low / closing value plus the event count.

    Open/close need ORDER within the bucket: two row_number windows
    (asc, desc) on the SAME (key, bucket) partitioning — Catalyst
    plans one exchange, two sorts — then a conditional aggregate picks
    the rank-1 rows. Ties broken by event_id, so the result is
    deterministic and engine-reproducible (min_by/arg_min with
    composite keys are not portable across engines' tie rules).
    Per-bucket state is O(1); bucket grain controls output size, not
    shuffle count.
    """
    bkt = F.floor(epoch_us(ts_col) / (bucket_s * 1_000_000)).cast("long")
    staged = events.select(
        F.col(key_col), bkt.alias("bkt"), F.col(ts_col), "event_id", F.col(value_col)
    )
    asc = Window.partitionBy(key_col, "bkt").orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    desc = Window.partitionBy(key_col, "bkt").orderBy(F.col(ts_col).desc(), F.col("event_id").desc())
    ranked = staged.select(
        key_col, "bkt", value_col,
        F.row_number().over(asc).alias("rf"),
        F.row_number().over(desc).alias("rl"),
    )
    return ranked.groupBy(key_col, "bkt").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.max(F.when(F.col("rf") == 1, F.col(value_col))), 6).alias("open"),
        F.round(F.max(value_col), 6).alias("high"),
        F.round(F.min(value_col), 6).alias("low"),
        F.round(F.max(F.when(F.col("rl") == 1, F.col(value_col))), 6).alias("close"),
    )


def seasonal_decompose(events: DataFrame, period_days: int = 7,
                       key_col: str = "event_type", ts_col: str = "ts",
                       value_col: str = "value", raw: bool = False) -> DataFrame:
    """Classical additive decomposition of each key's daily series:
    trend (centered moving average over one full period), weekday
    seasonal index (mean detrended value per (key, weekday)), residual
    — what's left for the anomaly detectors after the level and the
    weekly cycle are explained. an02 judges against an hour-of-day
    baseline; this is its day-grain trend-aware sibling.

    Shapes: daily means aggregate the corpus once (exact decimal);
    the centered-MA window runs on the bounded (key, day) relation;
    the seasonal index is a |keys|x7 aggregate broadcast back. Edge
    days without a full centered window get null trend/residual
    (never a partial-window average, which would bias the ends).
    """
    day = F.to_date(F.col(ts_col).cast("timestamp_ltz"))
    daily = events.groupBy(F.col(key_col), day.alias("day")).agg(
        (F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1))).alias("x")
    )
    half = period_days // 2
    w = Window.partitionBy(key_col).orderBy("day").rowsBetween(-half, half)
    staged = daily.select(
        key_col, "day", "x",
        F.avg("x").over(w).alias("_ma"),
        F.count("x").over(w).alias("_mn"),
    ).withColumn("trend", F.when(F.col("_mn") == period_days, F.col("_ma")))
    det = staged.withColumn("detr", F.col("x") - F.col("trend"))
    seas = det.groupBy(key_col, F.weekday("day").alias("wd")).agg(
        F.avg("detr").alias("seasonal")
    )
    out = det.withColumn("wd", F.weekday("day")).join(
        F.broadcast(seas), [key_col, "wd"]
    )
    if raw:
        # un-rounded components for downstream consumers that apply
        # their own portable quantization (seasonal_strength) — feeding
        # them round()ed values would re-introduce the engine-version
        # round() dependence the portable layer exists to avoid
        return out.select(
            key_col, "day",
            F.col("x").alias("day_mean"),
            F.col("trend"),
            F.col("seasonal"),
            (F.col("detr") - F.col("seasonal")).alias("residual"),
        )
    return out.select(
        key_col, "day",
        F.round("x", 6).alias("day_mean"),
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round(F.col("detr") - F.col("seasonal"), 6).alias("residual"),
    )


def twap_locf(events: DataFrame, key_col: str = "user_id",
              ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Time-weighted average under last-observation-carried-forward
    interpolation — TimescaleDB's ``time_weight('LOCF', ...)``
    aggregate (the honest average for irregularly-sampled gauges,
    where the arithmetic mean over-weights bursts of dense samples).

    Each observation holds its value until the key's next observation;
    TWAP = sum(value_i * dt_i) / sum(dt_i) over the key's span. The
    final observation carries no forward interval and equal-timestamp
    ties are zero-width (the (ts, id) sort makes that deterministic).

    Shape: one keyed window pass (``lead`` on the shared sort) + one
    aggregate on the same key — a single exchange. The value*dt
    products are identical IEEE doubles on both engines (one multiply
    each); they ride as DECIMAL(38,6) through the sum so the total is
    summation-order-free at any partition count.
    """
    from pyspark.sql import Window

    from ntripmonitor_spark.functions.timeutil import epoch_us

    w = Window.partitionBy(key_col).orderBy("us", "event_id")
    staged = events.select(
        key_col, "event_id", F.col(value_col).alias("v"), epoch_us(ts_col).alias("us")
    ).withColumn("nxt_us", F.lead("us").over(w))
    weighted = staged.filter(F.col("nxt_us").isNotNull()).select(
        key_col,
        (F.col("nxt_us") - F.col("us")).alias("dt_us"),
        (F.col("v") * (F.col("nxt_us") - F.col("us")).cast("double")).alias("vdt"),
    )
    agg = weighted.groupBy(key_col).agg(
        (F.count(F.lit(1)) + 1).alias("n_points"),
        F.sum("dt_us").alias("span_us"),
        F.sum(F.col("vdt").cast("decimal(38,6)")).cast("double").alias("sum_vdt"),
    )
    return agg.filter(F.col("span_us") > 0).select(
        key_col, "n_points",
        F.floor(F.col("span_us") / F.lit(1_000_000)).alias("span_s"),
        F.round(F.col("sum_vdt") / F.col("span_us").cast("double"), 6).alias("twap"),
    )


def cusum_changepoint(events: DataFrame, bucket_s: int = 3600,
                      slack_k: float = 0.25, key_col: str = "event_type",
                      ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """CUSUM change-point localization per key — the sequential
    recursion S_i = max(0, S_{i-1} + y_i) rewritten into its window
    closed form S_i = C_i − min(0, min_{j≤i} C_j) where C is the
    running sum of the slack-adjusted residuals y_i = x_i − μ − kσ.
    That identity is what makes CUSUM distributable: two ordered
    window passes on one keyed exchange, no recursion (upgrading
    `mean_shift_changepoints`' sliding-window approximation to the
    exact statistic).

    x_i is the per-(key, bucket) mean at ``bucket_s`` grain, rounded
    to 6 decimals so both engines feed the cumsum identical doubles;
    μ/σ come from exact DECIMAL sufficient statistics over the rounded
    bucket series, so no result depends on float summation order. The
    reported change point is the ONSET — the latest prefix-argmin of C
    at/before the S peak (S keeps growing while a shift persists, so
    the peak itself marks the end of the drift, not its start); both
    ranks break float ties on round(·, 9) then bucket.
    mean_before/mean_after re-aggregate the bucket series around the
    onset in DECIMAL.

    Scale: window state is bounded by the SERIES length (buckets per
    key), not corpus size — the bucket aggregate collapses the input
    first, exactly like the reference's time_bucket panels.
    """
    bkt_us = bucket_s * 1_000_000
    series = (
        events.select(
            key_col,
            F.floor(epoch_us(ts_col) / bkt_us).cast("long").alias("bkt"),
            F.col(value_col).alias("v"),
        )
        .groupBy(key_col, "bkt")
        .agg(F.round(
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1)), 6,
        ).alias("x"))
    )
    stats = series.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        (F.sum(F.col("x").cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1))).alias("mu"),
        F.sum(
            (F.col("x").cast("decimal(18,6)") * F.col("x").cast("decimal(18,6)"))
            .cast("decimal(38,12)")
        ).cast("double").alias("sx2"),
    ).filter(
        # a single-bucket series has no sample variance and no definable
        # change point — drop it BEFORE the divisions (ANSI mode errors
        # on /0 rather than yielding NaN)
        F.col("n_buckets") >= 2
    ).withColumn(
        "sigma",
        F.sqrt(
            (F.col("sx2") - F.col("n_buckets").cast("double") * F.col("mu") * F.col("mu"))
            / (F.col("n_buckets").cast("double") - F.lit(1.0))
        ),
    )
    staged = series.join(F.broadcast(stats), key_col).withColumn(
        "y", F.col("x") - F.col("mu") - F.lit(slack_k) * F.col("sigma")
    )
    w_run = (
        Window.partitionBy(key_col).orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = staged.withColumn("c", F.sum("y").over(w_run)).withColumn(
        "s", F.col("c") - F.least(F.lit(0.0), F.min("c").over(w_run))
    )
    w_rank = Window.partitionBy(key_col).orderBy(
        F.round("s", 9).desc(), F.col("bkt").asc()
    )
    peak = (
        cum.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(key_col, F.col("bkt").alias("peak_bkt"), F.col("s").alias("s_max"),
                "n_buckets")
    )
    # Change ONSET, not peak: S keeps accumulating while the shift
    # persists, so the peak sits at the series end; the standard CUSUM
    # localization is the latest prefix-argmin of C at/before the peak
    # (drift starts in the next bucket).
    w_onset = Window.partitionBy(key_col).orderBy(
        F.round("c", 9).asc(), F.col("bkt").desc()
    )
    cp = (
        cum.select(key_col, "bkt", "c")
        .join(F.broadcast(peak), key_col)
        .filter(F.col("bkt") <= F.col("peak_bkt"))
        .withColumn("rn", F.row_number().over(w_onset))
        .filter(F.col("rn") == 1)
        .select(key_col, F.col("bkt").alias("cp_bkt"), "s_max", "n_buckets")
    )
    around = series.join(F.broadcast(cp), key_col).groupBy(key_col).agg(
        F.round(
            F.sum(F.when(F.col("bkt") <= F.col("cp_bkt"),
                         F.col("x").cast("decimal(18,6)"))).cast("double")
            / F.sum(F.when(F.col("bkt") <= F.col("cp_bkt"), 1)), 6,
        ).alias("mean_before"),
        F.round(
            F.sum(F.when(F.col("bkt") > F.col("cp_bkt"),
                         F.col("x").cast("decimal(18,6)"))).cast("double")
            / F.sum(F.when(F.col("bkt") > F.col("cp_bkt"), 1)), 6,
        ).alias("mean_after"),
    )
    return cp.join(F.broadcast(around), key_col).select(
        key_col, "n_buckets", "cp_bkt",
        F.round("s_max", 6).alias("s_max"),
        "mean_before", "mean_after",
    )


import math as _math

# 7-point DFT weights for the weekly bin, computed ONCE in Python and
# embedded as literals on BOTH engines (Spark expression and oracle SQL)
# — cos/sin are not correctly-rounded in every libm, so calling the
# engines' trig functions could differ by 1 ulp; identical literals
# cannot (the an12 portability trick).
W7_COS: tuple[float, ...] = tuple(_math.cos(2 * _math.pi * k / 7) for k in range(7))
W7_SIN: tuple[float, ...] = tuple(_math.sin(2 * _math.pi * k / 7) for k in range(7))


def period_power(events: DataFrame, key_col: str = "event_type",
                 ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Weekly-periodicity amplitude per series: the period-7 Fourier
    bin over each key's daily-mean series — C = Σ x·cos(2πwd/7),
    S = Σ x·sin(2πwd/7), amplitude = 2·sqrt(C²+S²)/n — the direct
    spectral answer to "does this series have a weekly cycle", next to
    an08's ACF (correlation at fixed lags) and an11's variance-ratio
    strength (requires the full decomposition). A flat series scores
    ~0; a clean weekly cycle scores ~its peak-to-mean swing.

    Portability: the 7 trig weights are Python-computed literals
    embedded in BOTH the Spark plan and the oracle SQL, so no libm
    enters the comparison; per-day products are floor-quantized to
    integer millionths and BIGINT-summed (order-free); the amplitude
    is a fixed-order IEEE chain over those exact integers, emitted as
    quantized BIGINT millionths (*_ppm — integer output only). Shape:
    one corpus daily-mean aggregate (exact decimal), then a |keys|-row
    reduction — nothing else scales."""
    from ntripmonitor_spark.functions.portable import quantize

    day = F.to_date(F.col(ts_col).cast("timestamp_ltz"))
    daily = events.groupBy(F.col(key_col), day.alias("day")).agg(
        (F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1))).alias("x")
    )
    wd = F.weekday(F.col("day"))
    cos_w = F.element_at(F.array(*[F.lit(w) for w in W7_COS]), wd + 1)
    sin_w = F.element_at(F.array(*[F.lit(w) for w in W7_SIN]), wd + 1)
    g = daily.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(quantize(F.col("x") * cos_w, 6)).alias("c_ppm"),
        F.sum(quantize(F.col("x") * sin_w, 6)).alias("s_ppm"),
        F.sum(quantize(F.col("x"), 6)).alias("x_ppm"),
    )
    c_d = F.col("c_ppm").cast("double")
    s_d = F.col("s_ppm").cast("double")
    n_d = F.col("n_days").cast("double")
    amp = F.lit(2.0) * F.sqrt(c_d * c_d + s_d * s_d) / (n_d * F.lit(1000000.0))
    mean = F.col("x_ppm").cast("double") / (n_d * F.lit(1000000.0))
    return g.select(
        key_col, "n_days",
        quantize(amp, 6).alias("weekly_amplitude_ppm"),
        quantize(mean, 6).alias("daily_mean_ppm"),
        F.when(
            F.col("x_ppm") != 0,  # integer-exact zero test on both engines
            quantize(amp / F.abs(mean), 6),
        ).alias("relative_amplitude_ppm"),
    )


def autocorrelation(events: DataFrame, lags: tuple[int, ...] = (1, 2, 3),
                    bucket_s: int = 3600, key_col: str = "event_type",
                    ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Lag-k autocorrelation of the per-key bucket-mean series — the
    ACF diagnostic (is the series noise, trending, or periodic?) read
    before trusting an EWMA/seasonal model's residuals. r_k =
    Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)², with μ over the full series
    (the standard biased ACF estimator, comparable across lags).

    Shape mirrors `cusum_changepoint`: the bucket aggregate collapses
    the corpus first, μ comes from DECIMAL sufficient statistics, all
    ``lags`` read from ONE keyed window pass (one lead() per lag on
    the shared sort — no per-lag rescans), and per-pair products are
    9-dp rounded into DECIMAL sums so the quotient is order-free.
    Output: (key, lag, n_pairs, acf).
    """
    bkt_us = bucket_s * 1_000_000
    series = (
        events.select(
            key_col,
            F.floor(epoch_us(ts_col) / bkt_us).cast("long").alias("bkt"),
            F.col(value_col).alias("v"),
        )
        .groupBy(key_col, "bkt")
        .agg(F.round(
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1)), 6,
        ).alias("x"))
    )
    mu_rel = series.groupBy(key_col).agg(
        (F.sum(F.col("x").cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1))).alias("mu"),
    )
    w = Window.partitionBy(key_col).orderBy("bkt")
    staged = series.join(F.broadcast(mu_rel), key_col)
    for k in lags:
        staged = staged.withColumn(f"x_lead{k}", F.lead("x", k).over(w))
    dev = F.col("x") - F.col("mu")
    denom_term = F.round(dev * dev, 9).cast("decimal(38,9)")
    legs = []
    for k in lags:
        lead_dev = F.col(f"x_lead{k}") - F.col("mu")
        num_term = F.when(
            F.col(f"x_lead{k}").isNotNull(), F.round(dev * lead_dev, 9)
        ).cast("decimal(38,9)")
        legs.append(
            staged.groupBy(key_col).agg(
                F.sum(F.when(F.col(f"x_lead{k}").isNotNull(), 1).otherwise(0)).alias("n_pairs"),
                F.round(
                    F.when(
                        F.sum(denom_term).cast("double") > 0,
                        F.sum(num_term).cast("double")
                        / F.sum(denom_term).cast("double"),
                    ), 6,
                ).alias("acf"),
            ).select(key_col, F.lit(k).alias("lag"), "n_pairs", "acf")
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def rolling_active_users(events: DataFrame, window_days: int = 7,
                         ts_col: str = "ts",
                         user_col: str = "user_id") -> DataFrame:
    """Rolling N-day active users per day (WAU for N=7) plus same-day
    actives and the DAU/WAU stickiness ratio. Distinct-over-sliding-
    window does NOT decompose into daily distincts, so the standard
    rewrite applies: dedup to (day, user) first, then each pair
    CONTRIBUTES itself to the ``window_days`` window-end days via a
    bounded sequence-explode, and one (day)-keyed count-distinct
    finishes — linear work, shuffle-friendly, and crucially NO
    range-condition join (which would plan as a nested-loop against
    the day spine). Observed-day filtering is a broadcast semi-join
    against the |days|-row spine.
    """
    day = F.floor(epoch_us(ts_col) / F.lit(86_400_000_000)).cast("long")
    daily = events.select(day.alias("day"), F.col(user_col).alias("uid")).distinct()
    spine = daily.select("day").distinct()
    contrib = daily.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + (window_days - 1))).alias("obs_day"),
        "day", "uid",
    ).join(F.broadcast(spine.withColumnRenamed("day", "obs_day")), "obs_day", "left_semi")
    return (
        contrib.groupBy("obs_day")
        .agg(
            F.count_distinct("uid").alias("wau"),
            F.count_distinct(F.when(F.col("day") == F.col("obs_day"), F.col("uid"))).alias("dau"),
        )
        .select(
            F.col("obs_day").alias("day"), "dau", "wau",
            F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias("stickiness"),
        )
    )


def theil_sen_trend(events: DataFrame, bucket_s: int = 3600,
                    key_col: str = "event_type", ts_col: str = "ts",
                    value_col: str = "value") -> DataFrame:
    """Theil–Sen robust trend slope per key — the median of all
    pairwise slopes of the bucket-mean series, alongside the OLS
    slope for contrast (one outlier bucket drags OLS, moves the
    median slope almost nothing). The pairwise self-join is keyed on
    the series key and bounded by SERIES-length² (the bucket
    aggregate collapses the corpus first — ~750² pairs per key at a
    month of hourly buckets), never corpus². Slopes are 9-dp rounded
    before the exact median so both engines interpolate identical
    inputs; OLS comes from DECIMAL sufficient statistics with integer
    bucket sums.
    """
    bkt_us = bucket_s * 1_000_000
    series = (
        events.select(
            key_col,
            F.floor(epoch_us(ts_col) / bkt_us).cast("long").alias("bkt"),
            F.col(value_col).alias("v"),
        )
        .groupBy(key_col, "bkt")
        .agg(F.round(
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1)), 6,
        ).alias("x"))
    )
    a = series.select(key_col, F.col("bkt").alias("bi"), F.col("x").alias("xi"))
    b = series.select(key_col, F.col("bkt").alias("bj"), F.col("x").alias("xj"))
    pairs = a.join(b, key_col).filter(F.col("bi") < F.col("bj")).select(
        key_col,
        F.round(
            (F.col("xj") - F.col("xi")) / (F.col("bj") - F.col("bi")).cast("double"), 9,
        ).alias("slope"),
    )
    ts = pairs.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias("slope_theil"),
    )
    dx = F.col("x").cast("decimal(18,6)")
    ols = series.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("bkt").alias("sb"),
        F.sum(F.col("bkt") * F.col("bkt")).alias("sbb"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum((F.col("bkt").cast("decimal(18,0)") * dx).cast("decimal(38,6)"))
        .cast("double").alias("sbx"),
    ).filter(F.col("n_buckets") >= 2).select(
        key_col, "n_buckets",
        F.round(
            (F.col("n_buckets") * F.col("sbx") - F.col("sb") * F.col("sx"))
            / (F.col("n_buckets") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double"),
            6,
        ).alias("slope_ols"),
    )
    return ols.join(F.broadcast(ts), key_col).select(
        key_col, "n_buckets", "n_pairs", "slope_theil", "slope_ols",
    )


def runs_test(events: DataFrame, bucket_s: int = 3600,
              key_col: str = "event_type", ts_col: str = "ts",
              value_col: str = "value") -> DataFrame:
    """Wald–Wolfowitz runs test per key: is the bucket-mean series
    random noise around its median, or does it cluster (trend/regime)
    — too FEW runs — or oscillate — too MANY? The nonparametric
    companion to an08's ACF: no distributional assumption at all.

    Signs come from x vs the exact per-key median (6-dp rounded on
    both comparison sides; exact ties drop, the standard treatment);
    the run count is a lag-compare window sum over the ordered signs;
    E[R] and Var[R] are closed forms of the INTEGER counts (n_pos,
    n_neg), so z is deterministic. Keys whose variance term is zero
    (all one sign) report NULL z, never a division error.
    """
    bkt_us = bucket_s * 1_000_000
    series = (
        events.select(
            key_col,
            F.floor(epoch_us(ts_col) / bkt_us).cast("long").alias("bkt"),
            F.col(value_col).alias("v"),
        )
        .groupBy(key_col, "bkt")
        .agg(F.round(
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1)), 6,
        ).alias("x"))
    )
    med = series.groupBy(key_col).agg(
        F.round(F.expr("percentile(x, 0.5)"), 6).alias("med")
    )
    signed = (
        series.join(F.broadcast(med), key_col)
        .filter(F.col("x") != F.col("med"))
        .select(key_col, "bkt", (F.col("x") > F.col("med")).cast("int").alias("s"))
    )
    w = Window.partitionBy(key_col).orderBy("bkt")
    runs = signed.withColumn(
        "new_run",
        F.when(F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")), 1)
        .otherwise(0),
    )
    agg = runs.groupBy(key_col).agg(
        F.sum("new_run").alias("n_runs"),
        F.sum("s").alias("n_pos"),
        F.sum(F.lit(1) - F.col("s")).alias("n_neg"),
    )
    n1 = F.col("n_pos").cast("double")
    n2 = F.col("n_neg").cast("double")
    n = n1 + n2
    e_r = F.lit(2.0) * n1 * n2 / n + F.lit(1.0)
    var_r = (
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / (n * n * (n - F.lit(1.0)))
    )
    # guard on the INTEGER counts, not on var_r itself — evaluating
    # var_r's division is exactly what must not happen when n <= 1
    # (ANSI /0); 2·n1·n2 > n1+n2 ⟺ Var[R] > 0 given n1,n2 ≥ 1
    ok = (
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
        & (2 * F.col("n_pos") * F.col("n_neg") - F.col("n_pos") - F.col("n_neg") > 0)
    )
    return agg.select(
        key_col, "n_runs", "n_pos", "n_neg",
        F.round(F.when(F.col("n_pos") + F.col("n_neg") > 0, e_r), 6).alias("expected_runs"),
        F.round(
            F.when(ok, (F.col("n_runs").cast("double") - e_r) / F.sqrt(var_r)),
            6,
        ).alias("z"),
    )


def sequence_nll(events: DataFrame, key_col: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type",
                 min_steps: int = 5, k: int = 20) -> DataFrame:
    """Behavioral-sequence anomaly scoring: each key's event-type
    sequence scored under the corpus first-order Markov model
    (`event_transitions`' matrix) — mean −log2 P(next | prev) per key,
    top ``k`` most surprising keys with at least ``min_steps`` steps.
    The sequence analog of tx07's unigram surprisal: flags users whose
    TRANSITION pattern is unlike the population, not just their event
    mix.

    One lag window keyed by the sequence key (the only input-scaled
    exchange — same pass shape as `event_transitions`), the |types|²
    matrix broadcast back onto the steps, per-step surprisals 9-dp
    rounded into DECIMAL sums, and a TakeOrderedAndProject cut.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    steps = (
        events.select(
            key_col,
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = steps.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    w_prev = Window.partitionBy("prev_type")
    matrix = counts.select(
        "prev_type", "next_type",
        (F.col("n") / F.sum("n").over(w_prev)).alias("p"),
    )
    nll = F.round(-F.log2("p"), 9)
    scored = (
        steps.join(F.broadcast(matrix), ["prev_type", "next_type"])
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_steps"),
            F.round(
                F.sum(nll.cast("decimal(38,9)")).cast("double") / F.count(F.lit(1)), 6,
            ).alias("mean_nll"),
        )
        .filter(F.col("n_steps") >= min_steps)
    )
    topk = scored.orderBy(F.col("mean_nll").desc(), F.col(key_col).asc()).limit(k)
    # GLOBAL-WINDOW-OK: runs over `topk`, already LIMITed to k rows.
    w_rank = Window.orderBy(F.col("mean_nll").desc(), F.col(key_col).asc())
    return topk.withColumn("rank", F.row_number().over(w_rank)).select(
        "rank", key_col, "n_steps", "mean_nll"
    )


def downsample_extremes(events: DataFrame, bucket_s: int = 21600,
                        key_col: str = "event_type", ts_col: str = "ts",
                        value_col: str = "value") -> DataFrame:
    """Spike-preserving downsampling for dashboard serving (the
    parallel-friendly cousin of LTTB): per (key, bucket) emit the
    bucket mean AND the single most extreme point (max |v − mean|,
    ties → lowest event id) — a plain bucket average smooths away
    exactly the spikes an operator monitors for; carrying the extreme
    keeps them visible at any zoom level.

    LTTB itself chains each bucket's pick to the previous one
    (sequential, like CUSUM's recursion); fixing the reference to the
    bucket mean removes the chain, so every bucket picks independently
    — embarrassingly parallel, same visual intent. Two co-keyed
    passes: the bucket aggregate and one join-back + rank on the SAME
    (key, bucket) partitioning; deviations rank on their 9-dp rounding
    so the pick is cross-engine exact.
    """
    bkt_us = bucket_s * 1_000_000
    staged = events.select(
        key_col, "event_id",
        F.floor(epoch_us(ts_col) / bkt_us).cast("long").alias("bkt"),
        F.col(value_col).alias("v"),
    )
    buckets = staged.groupBy(key_col, "bkt").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1)), 6,
        ).alias("mean_v"),
    )
    joined = staged.join(buckets, [key_col, "bkt"])
    w = Window.partitionBy(key_col, "bkt").orderBy(
        F.round(F.abs(F.col("v") - F.col("mean_v")), 9).desc(),
        F.col("event_id").asc(),
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            key_col, "bkt", "n_events", "mean_v",
            F.col("event_id").alias("ext_event_id"),
            F.round(F.col("v"), 6).alias("ext_value"),
            F.round(F.abs(F.col("v") - F.col("mean_v")), 6).alias("ext_dev"),
        )
    )


def seasonal_strength(events: DataFrame,
                      key_col: str = "event_type") -> DataFrame:
    """Hyndman-style seasonal/trend STRENGTH per key from the additive
    decomposition (seasonal_decompose): F_seasonal = max(0, 1 -
    Var(resid)/Var(seasonal+resid)) and F_trend = max(0, 1 -
    Var(resid)/Var(trend+resid)) — the one-number-per-series answer to
    "is this series worth a seasonal model" that decides between an02's
    seasonal baseline and an01's plain rolling window.

    Determinism: the decomposition's RAW components are floor-quantized
    to exact integer millionths (quantize — never round(), whose
    half-up/half-even behavior varies across engine versions), every
    variance moment (Σx, Σx²) is an exact integer sum (order-free at
    any partition count), and the final ratios are fixed-order IEEE
    over those exact integers, emitted as quantized BIGINT millionths
    (*_ppm; functions/portable.py — integer output only). Shape: rides
    the decomposition's bounded (key, day) relation — one additional
    |keys|-row aggregate, nothing corpus-scaled."""
    from ntripmonitor_spark.functions.portable import quantize

    dec = seasonal_decompose(events, key_col=key_col, raw=True).filter(
        F.col("trend").isNotNull()
    )
    staged = dec.select(
        key_col,
        quantize(F.col("residual"), 6).alias("r"),
        quantize(F.col("seasonal"), 6).alias("s"),
        quantize(F.col("trend"), 6).alias("t"),
    ).select(
        key_col, "r",
        (F.col("r") + F.col("s")).alias("q"),
        (F.col("r") + F.col("t")).alias("u"),
    )
    g = staged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("sr"), F.sum(F.col("r") * F.col("r")).alias("sr2"),
        F.sum("q").alias("sq"), F.sum(F.col("q") * F.col("q")).alias("sq2"),
        F.sum("u").alias("su"), F.sum(F.col("u") * F.col("u")).alias("su2"),
    )
    n_d = F.col("n").cast("double")
    vr = n_d * F.col("sr2").cast("double") - F.col("sr").cast("double") * F.col("sr").cast("double")
    vq = n_d * F.col("sq2").cast("double") - F.col("sq").cast("double") * F.col("sq").cast("double")
    vu = n_d * F.col("su2").cast("double") - F.col("su").cast("double") * F.col("su").cast("double")
    v = g.select(
        key_col, F.col("n").alias("n_days"),
        vr.alias("vr"), vq.alias("vq"), vu.alias("vu"),
    )
    f_seas = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("vr") / F.col("vq"))
    f_trend = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("vr") / F.col("vu"))
    return v.select(
        key_col, "n_days",
        F.when(F.col("vq") > 0, quantize(f_seas, 6)).alias("f_seasonal_ppm"),
        F.when(F.col("vu") > 0, quantize(f_trend, 6)).alias("f_trend_ppm"),
    )


def gapfill_interpolate(events: DataFrame, bucket_s: int = 3600,
                        key_col: str = "event_type", ts_col: str = "ts",
                        value_col: str = "value") -> DataFrame:
    """Dense hourly spine per key with LINEAR interpolation across
    missing buckets — the ``time_bucket_gapfill`` + ``interpolate()``
    leg of the reference's dashboard gap analytics (ts03's TWAP covers
    the ``locf`` mode; the Grafana heatmap's empty buckets are exactly
    the rows this fills). The spine spans each key's OWN observed
    [first, last] bucket range, so every spine row has an observation
    on both sides by construction and interpolation is always defined
    — nothing outside a key's observed span is ever emitted (and hence
    never extrapolated).

    Shape: one exact-decimal bucket-mean aggregate, then the spine is
    a per-key sequence explode over the key's OWN [min, max] bucket
    range (|keys| + total-buckets rows — never a corpus-sized cross
    join), one left join back, and ignore-nulls window walls on a
    single keyed exchange. Interpolation is fixed-order IEEE over
    integer bucket indexes and exact-decimal means; output is the
    quantized BIGINT millionths column value_ppm
    (functions/portable.py — integer output only)."""
    from ntripmonitor_spark.functions.portable import quantize
    from ntripmonitor_spark.functions.timeutil import epoch_us

    unit = bucket_s * 1_000_000
    obs = events.groupBy(
        key_col,
        F.floor(epoch_us(ts_col) / F.lit(unit)).alias("b"),
    ).agg(
        (F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1))).alias("x")
    )
    span = obs.groupBy(key_col).agg(
        F.min("b").alias("b_lo"), F.max("b").alias("b_hi")
    )
    spine = span.select(
        key_col, F.explode(F.sequence(F.col("b_lo"), F.col("b_hi"))).alias("b")
    )
    j = spine.join(obs, [key_col, "b"], "left")
    w = Window.partitionBy(key_col).orderBy("b")
    wprev = w.rowsBetween(Window.unboundedPreceding, 0)
    wnext = w.rowsBetween(0, Window.unboundedFollowing)
    filled = j.select(
        key_col, "b", "x",
        F.last("x", ignorenulls=True).over(wprev).alias("pv"),
        F.last(F.when(F.col("x").isNotNull(), F.col("b")), ignorenulls=True)
        .over(wprev).alias("pb"),
        F.first("x", ignorenulls=True).over(wnext).alias("nv"),
        F.first(F.when(F.col("x").isNotNull(), F.col("b")), ignorenulls=True)
        .over(wnext).alias("nb"),
    )
    interp = F.when(F.col("x").isNotNull(), F.col("x")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * ((F.col("b") - F.col("pb")).cast("double")
           / (F.col("nb") - F.col("pb")).cast("double"))
    )
    # the pv/nv guard is an invariant check, not a reachable edge case:
    # the per-key spine's endpoints are observed buckets, so both walls
    # exist for every row — it only matters if the spine ever widens to
    # a global range (then out-of-span rows surface as NULL, not a
    # miscomputed extrapolation)
    return filled.select(
        key_col,
        F.col("b").alias("bucket_idx"),
        F.col("x").isNotNull().cast("int").alias("observed"),
        F.when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            quantize(interp, 6),
        ).alias("value_ppm"),
    )


def lttb_downsample(events: DataFrame, k: int = 20,
                    key_col: str = "event_type",
                    ts_col: str = "ts",
                    value_col: str = "value") -> DataFrame:
    """Largest-Triangle downsampling of each key's series to ~k+2
    points — the dashboard-rendering primitive (a 100 TB series can't
    ship every point to a panel; LTTB keeps the points that preserve
    visual shape). This is the ONE-BUCKET variant (LTOB): each point's
    triangle uses its immediate neighbors rather than the previously
    SELECTED point, which removes the sequential dependency and makes
    the operator a pure two-window-pass column plan — the classic LTTB
    recurrence cannot be parallelized, LTOB can, and the two are
    near-identical on real series (Steinarsson 2013, §4.2).

    Mechanics: rank each key's points by time; equal-count buckets
    bucket_i = (rn-1)*k div n (pure integer); per point the triangle
    area with its lag/lead neighbors, computed ENTIRELY in BIGINT —
    x is epoch microseconds (exact long), y is the raw value quantized
    once to integer milli-units (the only double op; no arithmetic
    chain ever runs in floating point):

        area = |(x_prev - x_next)*(y - y_prev) - (x_prev - x)*(y_next - y_prev)|

    Argmax per (key, bucket) on (area DESC, event_id ASC); the series
    endpoints are always kept (buckets -1 and k, the LTTB convention).

    Shape: one key-ordered window exchange (rank + lag/lead fuse into
    a single Window spec), then a bounded (keys x k) argmax — nothing
    after the first exchange scales with the series. Output is
    all-integer except the raw quantized value units.
    """
    from ntripmonitor_spark.functions.portable import quantize

    w = Window.partitionBy(key_col).orderBy(
        F.col("us").asc(), F.col("event_id").asc()
    )
    # NULL values are dropped up front (mirrored in the ts07 oracle):
    # a NULL y would NULL its own and both neighbors' areas, and
    # engines disagree on where ORDER BY ranks NULLs (the qa05 hq_cum
    # precedent) — filtering beats depending on either default.
    base = events.filter(F.col(value_col).isNotNull()).select(
        key_col, "event_id",
        epoch_us(ts_col).alias("us"),
        quantize(F.col(value_col), 3).alias("y_e3"),
    )
    staged = base.select(
        key_col, "event_id", "us", "y_e3",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(key_col)).alias("n"),
        F.lag("us").over(w).alias("xp"),
        F.lag("y_e3").over(w).alias("yp"),
        F.lead("us").over(w).alias("xn"),
        F.lead("y_e3").over(w).alias("yn"),
    )
    area = F.abs(
        (F.col("xp") - F.col("xn")) * (F.col("y_e3") - F.col("yp"))
        - (F.col("xp") - F.col("us")) * (F.col("yn") - F.col("yp"))
    )
    bucket = F.call_function(
        "div", (F.col("rn") - 1).cast("long") * k, F.col("n").cast("long")
    ).cast("int")
    # single pass: endpoints ride as sentinel buckets -1 / k (alone in
    # their bucket, NULL area) instead of union branches that would
    # re-scan the series three times at 100 TB
    tagged = staged.select(
        key_col, "event_id", "us", "y_e3",
        F.when(F.col("rn") == 1, F.lit(-1))
        .when(F.col("rn") == F.col("n"), F.lit(k))
        .otherwise(bucket).cast("int").alias("bucket"),
        F.when((F.col("rn") > 1) & (F.col("rn") < F.col("n")), area)
        .alias("area"),
    )
    # NULLS LAST pinned explicitly (Spark's desc default, but NOT every
    # DuckDB build's) so the sentinel endpoints' NULL areas can never
    # outrank a real area on either engine
    rw = Window.partitionBy(key_col, "bucket").orderBy(
        F.col("area").desc_nulls_last(), F.col("event_id").asc()
    )
    # the sentinel endpoints' NULL area is emitted as -1: a NULL would
    # make the column nullable-int, which a pandas/Arrow fetch widens to
    # float64 — and a 17-digit area exceeds 2^53, so the driver's
    # canonicalizer would render 1.02e+16 against Spark's exact integer
    # (the round-10 HUGEINT mechanism through a different door; caught
    # by the fetchdf parity leg in tests/oracle.py)
    return (
        tagged.withColumn("_rk", F.row_number().over(rw))
        .filter(F.col("_rk") == 1)
        .select(
            key_col, "bucket", "event_id", "us", "y_e3",
            F.coalesce(F.col("area"), F.lit(-1).cast("long")).alias("area"),
        )
    )
