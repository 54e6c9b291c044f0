"""Sessionization — the connection-logger semantics (K5, §2.6) as both
a batch window-function plan and a streaming stateful operator.

The reference keeps disconnect→reconnect intervals as mutable rows
(`src/databasehandling.py:220-261`, `initdb/30-connection_logger.sql`):
an open session is a disconnect row with NULL reconnect. Here the same
facts are derived declaratively: batch = lag/cumsum gap sessionization
(one shuffle on the key); streaming = ``applyInPandasWithState`` with
per-key open-session state, emitting a session row when its closing
gap arrives.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ntripmonitor_spark.functions.timeutil import epoch_us

DEFAULT_GAP_S = 1800  # 30 min inactivity closes a session

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("duration_s", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", IntegerType()),
    ]
)


def sessionize_batch(events: DataFrame, gap_s: int = DEFAULT_GAP_S,
                     key: str = "user_id", ts: str = "ts") -> DataFrame:
    """Gap-based sessions: lag → gap>threshold flag → cumulative sum =
    session id → per-session aggregate. Two window passes + one
    groupBy, all on the same ``key`` partitioning (a single shuffle
    feeds every step — at scale this is one exchange, not three)."""
    w = Window.partitionBy(key).orderBy(ts)
    ts_us = epoch_us(ts)
    new_flag = (
        F.when(ts_us - F.lag(ts_us).over(w) > gap_s * 1_000_000, 1).otherwise(0)
    )
    # No explicit pre-projection needed: Catalyst prunes the scan to
    # (key, ts) below the window (verified: events ReadSchema is
    # struct<ts,user_id> in the sn01 plan), so the payload columns
    # never ride the sessionization exchange.
    sess = events.withColumn("_new", new_flag).withColumn(
        "_sess", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy(F.col(key).alias("user_id"), "_sess")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
        )
        .withColumn(
            "duration_s",
            (epoch_us("session_end") - epoch_us("session_start")) / F.lit(1_000_000),
        )
        .withColumn("duration_s", F.floor("duration_s"))
        .drop("_sess")
    )


def closed_sessions_batch(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """Batch sessions minus each key's final (still-open) session —
    the batch mirror of what the streaming operator emits."""
    sess = sessionize_batch(events, gap_s)
    w = Window.partitionBy("user_id").orderBy(F.desc("session_start"))
    return (
        sess.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") > 1)
        .drop("_rk")
    )


def sessionize_stream(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState: state =
    the open session per key; a row starting a new session emits the
    previous one (open sessions stay in state — NULL-reconnect rows in
    the reference's model)."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        gap_us = gap_s * 1_000_000
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = None, None, 0
        out = []
        ts_all = sorted(
            int(t.value // 1000)
            for pdf in pdfs
            for t in pdf["ts"]
            if t is not None and not pd.isna(t)
        )
        for t_us in ts_all:
            if start_us is None:
                start_us, end_us, n = t_us, t_us, 1
            elif t_us - end_us > gap_us:
                out.append((key[0], start_us, end_us, n))
                start_us, end_us, n = t_us, t_us, 1
            else:
                end_us, n = t_us, n + 1
        state.update((start_us, end_us, n))
        yield pd.DataFrame(
            {
                "user_id": [k for k, *_ in out],
                "session_start": [pd.Timestamp(s * 1000) for _, s, *_ in out],
                "session_end": [pd.Timestamp(e * 1000) for _, _, e, _ in out],
                "n_events": [n for *_, n in out],
                "duration_s": [(e - s) // 1_000_000 for _, s, e, _ in out],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_SCHEMA, _STATE_SCHEMA, "append", "NoTimeout"
    )


def reconnect_pairs(events: DataFrame, down_type: str = "error") -> DataFrame:
    """K5's disconnect→reconnect pairing, declaratively: for each
    ``down_type`` event, the reconnect is the next event of the same
    key (NULL while still open)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("_next_ts", F.lead("ts").over(w))
        .filter(F.col("event_type") == down_type)
        .select(
            "user_id",
            F.col("ts").alias("disconnect_time"),
            F.col("_next_ts").alias("reconnect_time"),
            F.floor(
                (epoch_us("_next_ts") - epoch_us("ts")) / F.lit(1_000_000)
            ).alias("outage_s"),
        )
    )


def sessionize_native(events: DataFrame, gap_s: int = DEFAULT_GAP_S,
                      key: str = "user_id", ts: str = "ts") -> DataFrame:
    """Gap sessions via Spark's NATIVE ``session_window`` aggregate —
    the engine-builtin twin of :func:`sessionize_batch`'s window-sum
    formulation, and the one that runs UNCHANGED as a streaming
    aggregation (watermark + session_window + merge-on-trigger, with
    state eviction for free) where the window-sum plan needs the
    applyInPandasWithState operator.

    Semantics note pinned by the oracle: session_window closes at gap
    >= gap_s (an event exactly gap_s after the previous one starts a
    NEW session), whereas sessionize_batch's ``gap > gap_s`` flag
    keeps it — off-by-one-microsecond family differences that real
    migrations must pin down, which is why both are exposed.
    """
    # Cast NTZ input to the session-zoned type — but ONLY when needed:
    # wrapping an already-watermarked TIMESTAMP column in a (no-op)
    # cast strips the eventTime watermark metadata, and the streaming
    # aggregation then rejects append mode as "without watermark".
    ts_type = dict((f.name, f.dataType.simpleString()) for f in events.schema.fields)[ts]
    ts_col = F.col(ts) if ts_type == "timestamp" else F.col(ts).cast("timestamp_ltz")
    sw = F.session_window(ts_col, f"{gap_s} seconds")
    return (
        events.groupBy(F.col(key).alias("user_id"), sw)
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
        )
        .withColumn(
            "duration_s",
            F.floor((epoch_us("session_end") - epoch_us("session_start")) / F.lit(1_000_000)),
        )
        .drop("session_window")
    )
