"""Timestamp-type-tolerant time helpers.

The harness tables have shipped the ``events.ts`` column as parquet
TIMESTAMP(NANOS), naive TIMESTAMP(MICROS) (→ ``TIMESTAMP_NTZ`` under
Spark 4's default inference), and plain ``TIMESTAMP_LTZ`` across rounds.
``F.unix_micros`` hard-rejects NTZ input, so every operator that does
epoch arithmetic goes through :func:`epoch_us`, which first casts to the
session-zoned TIMESTAMP type (a no-op for LTZ; a session-tz reinterpret
for NTZ — the engine pins the session time zone to UTC, where NTZ wall
time and epoch coincide, matching DuckDB's naive-timestamp semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since the epoch, accepting TIMESTAMP or TIMESTAMP_NTZ.

    Cast target is the explicit ``timestamp_ltz``, NOT the ``timestamp``
    alias: under a session with ``spark.sql.timestampType=TIMESTAMP_NTZ``
    the alias resolves to NTZ, turning the guard cast into the very
    NTZ-izing no-op it exists to prevent (unix_micros then rejects it).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp_ltz"))
