"""Stream-stream joins: correlate two live streams inside a bounded
event-time horizon with watermark-clipped state.

The batch twins are operators/joins.py (aj* as-of, rj* range): same
semantics, but on unbounded inputs the join buffer itself must be
bounded — both sides carry a watermark, and the join predicate's time
band tells Spark exactly when a buffered row can never match again and
is evicted. Without the band the state grows forever; with it, state
is O(rate × horizon) per key regardless of stream age — the property
that lets the same query run for months.

Reference tie-in: the reference correlates a disconnect with the next
reconnect per mountpoint by UPDATE-ing the previous row at reconnect
time (src/databasehandling.py, connection bookkeeping). The streaming
join is the scale-out formulation: no in-place UPDATE, just two
streams meeting in a time band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ntripmonitor_spark.functions.timeutil import epoch_us


def stream_interval_join(anchors: DataFrame, probes: DataFrame,
                         key: str = "user_id",
                         horizon_s: int = 600,
                         watermark: str = "10 minutes",
                         how: str = "inner") -> DataFrame:
    """Join of two event-time streams: every probe row that
    falls within ``[anchor.ts, anchor.ts + horizon_s]`` of an anchor
    row with the same key — "activity within 10 minutes of an error".

    Both sides are watermarked, and the join condition carries the
    explicit time band — the two ingredients Structured Streaming
    needs to bound join state: an anchor older than
    (max event time − watermark − horizon) can never match a future
    probe and is evicted; a probe older than the watermark likewise.

    Timestamps are normalized to session-zoned TIMESTAMP first (the
    harness ships naive parquet micros — TIMESTAMP_NTZ under Spark 4 —
    and interval arithmetic/watermarks want one zone story; the engine
    pins UTC).

    ``how='left_outer'`` adds the no-match verdicts: an anchor with NO
    probe in its horizon emits once — with NULL probe fields — when the
    watermark passes (a_ts + horizon), i.e. when the negative is
    PROVEN, not merely unobserved yet. That is the streaming version of
    "error with no recovery inside 10 minutes", and it falls straight
    out of the state-eviction machinery: the null row is emitted at
    eviction time. Rows still buffered when the stream simply stops are
    not emitted — absence of evidence only becomes evidence at the
    watermark.
    """
    a = anchors.select(
        F.col(key).alias("a_key"),
        F.col("ts").cast("timestamp_ltz").alias("a_ts"),
        F.col("event_id").alias("anchor_id"),
    ).withWatermark("a_ts", watermark)
    p = probes.select(
        F.col(key).alias("p_key"),
        F.col("ts").cast("timestamp_ltz").alias("p_ts"),
        F.col("event_id").alias("probe_id"),
        "event_type",
    ).withWatermark("p_ts", watermark)
    cond = (
        (F.col("a_key") == F.col("p_key"))
        & (F.col("p_ts") >= F.col("a_ts"))
        & (F.col("p_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {horizon_s} SECONDS"))
        & (F.col("anchor_id") != F.col("probe_id"))
    )
    return a.join(p, cond, how).select(
        F.col("a_key").alias("user_id"),
        "anchor_id",
        "probe_id",
        "event_type",
        "a_ts",
        "p_ts",
        # epoch_us, not raw unix_micros: a_ts/p_ts are LTZ here, but an
        # NTZ-typed upstream (the exact r3 failure class) must degrade to
        # a no-op cast, not a hard AnalysisException.
        (epoch_us(F.col("p_ts")) - epoch_us(F.col("a_ts"))).alias("gap_us"),
    )


def batch_interval_join(anchors: DataFrame, probes: DataFrame,
                        key: str = "user_id", horizon_s: int = 600) -> DataFrame:
    """Batch mirror of :func:`stream_interval_join` on static frames —
    the expectation a streaming run must reproduce (used by the test
    harness; production batch work should prefer the bucketed
    operators/joins.py range_join_intervals, which avoids the
    inequality-join planning trap on large inputs)."""
    a = anchors.select(
        F.col(key).alias("a_key"),
        F.col("ts").cast("timestamp_ltz").alias("a_ts"),
        F.col("event_id").alias("anchor_id"),
    )
    p = probes.select(
        F.col(key).alias("p_key"),
        F.col("ts").cast("timestamp_ltz").alias("p_ts"),
        F.col("event_id").alias("probe_id"),
        "event_type",
    )
    cond = (
        (F.col("a_key") == F.col("p_key"))
        & (F.col("p_ts") >= F.col("a_ts"))
        & (F.col("p_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {horizon_s} SECONDS"))
        & (F.col("anchor_id") != F.col("probe_id"))
    )
    return a.join(p, cond).select(
        F.col("a_key").alias("user_id"),
        "anchor_id",
        "probe_id",
        "event_type",
        "a_ts",
        "p_ts",
        # epoch_us, not raw unix_micros: a_ts/p_ts are LTZ here, but an
        # NTZ-typed upstream (the exact r3 failure class) must degrade to
        # a no-op cast, not a hard AnalysisException.
        (epoch_us(F.col("p_ts")) - epoch_us(F.col("a_ts"))).alias("gap_us"),
    )
