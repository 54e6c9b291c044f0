"""Z-order (Morton) clustering — multi-dimensional data layout.

A table sorted by one column prunes scans on that column only; range
queries that constrain TWO dimensions (e.g. user_id × value band, or
station × time) scan everything under a linear sort on either. Bit-
interleaving the dimensions into a Morton code and range-partitioning
by it gives every output file a tight bounding box in BOTH dimensions,
so parquet min/max stats (file- and row-group-level) prune on either
predicate — the standard lakehouse Z-ORDER layout, built here from
plain column bit arithmetic (JVM-side, whole-stage codegen).

At 100 TB this is a write-time choice: `write_zordered` costs one
range-repartition of the data being laid down and nothing at read
time; re-clustering is an offline rewrite of cold partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension; 2 dims → 32-bit morton code


def _clamp_scale(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Affine-map col from [lo, hi] onto integer [0, 2^bits − 1]."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo) / span
    frac = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.floor(frac * ((1 << bits) - 1)).cast("long")


def morton_interleave(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Bit-interleave two non-negative ints (< 2^bits) into one code:
    a's bit i lands at position 2i, b's at 2i+1. Pure integer
    expressions — compiles into whole-stage codegen."""
    terms = []
    for i in range(bits):
        terms.append(
            F.call_function(
                "shiftleft",
                F.call_function("shiftright", a, F.lit(i)).bitwiseAND(F.lit(1)),
                F.lit(2 * i),
            )
        )
        terms.append(
            F.call_function(
                "shiftleft",
                F.call_function("shiftright", b, F.lit(i)).bitwiseAND(F.lit(1)),
                F.lit(2 * i + 1),
            )
        )
    code = terms[0]
    for t in terms[1:]:
        code = code.bitwiseOR(t)
    return code


def zorder_code(df: DataFrame, col_a: str, col_b: str,
                bits: int = ZBITS) -> DataFrame:
    """Attach a ``z`` column: both dimensions min/max-scaled onto
    [0, 2^bits) (bounds from one tiny agg, folded as literals) and
    bit-interleaved."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(F.col(col_a).cast("double")), F.max(F.col(col_a).cast("double")),
        F.min(F.col(col_b).cast("double")), F.max(F.col(col_b).cast("double")),
    ).first()
    a = _clamp_scale(F.col(col_a), F.lit(float(lo_a)), F.lit(float(hi_a)), bits)
    b = _clamp_scale(F.col(col_b), F.lit(float(lo_b)), F.lit(float(hi_b)), bits)
    return df.withColumn("z", morton_interleave(a, b, bits))


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_files: int = 16, bits: int = ZBITS) -> None:
    """Lay df down range-partitioned by the Morton code: each output
    file covers a compact Z-curve segment, i.e. a tight bounding box
    in (col_a, col_b) — parquet stats then prune on EITHER column."""
    (
        zorder_code(df, col_a, col_b, bits)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )
