"""Dataset profiling: the one-pass column-statistics report every
ingest of a new 100 TB corpus starts with (row counts, null rates,
distinct cardinalities, numeric ranges per column).

Shape: ONE aggregation job over the table — all per-column statistics
are computed in a single `agg(...)` (Catalyst plans the N exact
distinct counts as one Expand(×N) over the pruned projection, then a
value-keyed dedup aggregate — no per-column table scans), and the
wide 1-row result is unpivoted to the (column, stats...) long format
driver-side via a bounded stack expression.

100 TB dial: exact distinct counts pay the Expand(×N) row
multiplication; `profile_table(approx=True)` swaps in
`approx_count_distinct` (HyperLogLog++, mergeable O(1) state, no
Expand, one map-side-combined aggregate for the whole report) — same
output shape, ±2% cardinalities. The exact mode is the oracle-checked
default; approx is the scale default.

Reference scope note: the reference has no profiling surface; nearest
analogue is its ingest sanity logging (src/ingestion.py startup
checks). North-star extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx: bool = False) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, n_distinct,
    min_num, max_num) — min/max only for numeric columns (cross-engine
    string/timestamp rendering is not hash-stable, cardinality is).

    One aggregation, one output row per profiled column.
    """
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    # rsd 0.02: ~4x the HLL register space of the 0.05 default — still
    # O(kB) mergeable state per column, cardinalities good to ~±2%.
    nd = (lambda c: F.approx_count_distinct(c, 0.02)) if approx else (lambda c: F.count_distinct(c))

    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(F.col(c))).alias(f"_null_{c}"))
        aggs.append(nd(F.col(c)).alias(f"_nd_{c}"))
        if isinstance(schema[c], _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_max_{c}"))
    wide = df.agg(*aggs)

    parts = []
    for c in cols:
        has_minmax = isinstance(schema[c], _NUMERIC)
        mn = f"_min_{c}" if has_minmax else "CAST(NULL AS DOUBLE)"
        mx = f"_max_{c}" if has_minmax else "CAST(NULL AS DOUBLE)"
        parts.append(f"'{c}', _n, _null_{c}, _nd_{c}, {mn}, {mx}")
    stack = f"stack({len(cols)}, {', '.join(parts)}) AS (column, n_rows, n_null, n_distinct, min_num, max_num)"
    return wide.select(F.expr(stack))
