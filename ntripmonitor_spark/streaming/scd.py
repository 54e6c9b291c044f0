"""Streaming SCD Type-2 maintenance — the incremental twin of the
batch ``operators/joins.py:scd2_history`` plan.

The batch plan derives the full validity-interval history from the
complete log with two window passes. Live, a warehouse maintains the
dimension incrementally: each micro-batch's change events CLOSE the
affected keys' current intervals and open new ones. That recursion is
per-key sequential state, so the streaming form is
``applyInPandasWithState``: state = the open run (attr, valid_from)
per key; an attribute change emits the closed interval immediately and
replaces the state. Open runs stay in state — the ``is_current`` rows
of the batch plan — exactly like the sessionization operator keeps its
open session.

State is O(1) per key (one open run), independent of history length —
the property that lets the operator run forever. Cross-batch
correctness requires per-key event-time monotonicity across triggers
(within a trigger the kernel sorts); in the archive-replay topology
batches are time-ordered by construction. Equivalence with the batch
plan's closed intervals is pinned in tests/test_streaming.py over a
multi-trigger replay.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCD_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("attr_value", StringType()),
        StructField("valid_from", TimestampType()),
        StructField("valid_to", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("attr", StringType()),
        StructField("start_us", LongType()),
    ]
)


def scd2_stream(events: DataFrame, attr_col: str = "event_type") -> DataFrame:
    """Incremental SCD2: emits each CLOSED validity interval the
    moment the closing change event arrives; the open run per key
    lives in state (the batch plan's ``is_current`` row)."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        if state.exists:
            attr, start_us = state.get
        else:
            attr, start_us = None, None
        parts = [p for p in pdfs if len(p)]
        if not parts:
            state.update((attr, start_us))
            yield pd.DataFrame({c: [] for c in ("user_id", "attr_value", "valid_from", "valid_to")})
            return
        batch = pd.concat(parts, ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        out = []
        for ts_val, a in zip(batch["ts"], batch[attr_col]):
            t_us = int(ts_val.value // 1000)
            if attr is None:
                attr, start_us = a, t_us
            elif a != attr:
                out.append((key[0], attr, start_us, t_us))
                attr, start_us = a, t_us
        state.update((attr, start_us))
        yield pd.DataFrame(
            {
                "user_id": [k for k, *_ in out],
                "attr_value": [a for _, a, *_ in out],
                "valid_from": [pd.Timestamp(s * 1000) for _, _, s, _ in out],
                "valid_to": [pd.Timestamp(e * 1000) for _, _, _, e in out],
            }
        )

    cols = ["user_id", "ts", "event_id", attr_col]
    return events.select(*cols).groupBy("user_id").applyInPandasWithState(
        fn, SCD_SCHEMA, _STATE_SCHEMA, "append", "NoTimeout"
    )
