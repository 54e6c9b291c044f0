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
    if lo_a is None:  # empty input: any bounds work — there are no rows
        lo_a, hi_a, lo_b, hi_b = 0.0, 1.0, 0.0, 1.0
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


def pruning_stats(df: DataFrame, col_a: str, col_b: str,
                  a_lo: float, a_hi: float, b_lo: float, b_hi: float,
                  n_files: int = 64, bits: int = ZBITS,
                  id_col: str = "event_id") -> DataFrame:
    """Zone-map file-skipping estimate: how many of ``n_files`` files a
    box predicate (col_a ∈ [a_lo,a_hi] AND col_b ∈ [b_lo,b_hi]) must
    scan under (1) the Z-order layout vs (2) insertion order — the
    quantified case for `write_zordered`, computed without writing a
    byte. Each layout assigns rows to files by fixed-width buckets of
    its clustering key (z code / ``id_col``), mirrors parquet footer
    min/max per file, and scans a file iff its bounding box intersects
    the query box — exactly the planner's PushedFilters + stats prune.

    Fixed-width bucketing (not repartitionByRange, whose sampled
    boundaries are nondeterministic) keeps the file assignment
    engine-reproducible; skew across synthetic files only biases the
    estimate AGAINST z-order, so the reported gain is a floor. One
    scan + one |files|-keyed aggregate per layout; file counts and row
    counts are exact integers.
    """
    zc = zorder_code(df, col_a, col_b, bits)
    z_lo, z_hi, i_lo, i_hi = zc.agg(
        F.min("z"), F.max("z"),
        F.min(F.col(id_col).cast("long")), F.max(F.col(id_col).cast("long")),
    ).first()
    if z_lo is None:  # empty input: no files, no rows — not a TypeError
        return zc.sparkSession.createDataFrame(
            [],
            "layout string, n_files bigint, files_scanned bigint,"
            " rows_scanned bigint, rows_matched bigint",
        )

    def file_of(col: Column, lo: int, hi: int) -> Column:
        span = max(int(hi) - int(lo) + 1, 1)
        return F.least(
            F.floor((col.cast("long") - F.lit(int(lo))) * F.lit(n_files) / F.lit(span)),
            F.lit(n_files - 1),
        ).cast("int")

    hit = (
        (F.col(col_a).cast("double") >= a_lo) & (F.col(col_a).cast("double") <= a_hi)
        & (F.col(col_b).cast("double") >= b_lo) & (F.col(col_b).cast("double") <= b_hi)
    ).cast("int")

    legs = []
    for layout, fcol in (
        ("zorder", file_of(F.col("z"), z_lo, z_hi)),
        ("insertion", file_of(F.col(id_col), i_lo, i_hi)),
    ):
        per_file = (
            zc.select(
                fcol.alias("f"),
                F.col(col_a).cast("double").alias("_a"),
                F.col(col_b).cast("double").alias("_b"),
                hit.alias("_hit"),
            )
            .groupBy("f")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("_a").alias("a_min"), F.max("_a").alias("a_max"),
                F.min("_b").alias("b_min"), F.max("_b").alias("b_max"),
                F.sum("_hit").alias("n_match"),
            )
        )
        scanned = (
            (F.col("a_max") >= a_lo) & (F.col("a_min") <= a_hi)
            & (F.col("b_max") >= b_lo) & (F.col("b_min") <= b_hi)
        )
        legs.append(
            per_file.agg(
                F.count(F.lit(1)).alias("n_files"),
                F.sum(scanned.cast("int")).alias("files_scanned"),
                F.sum(F.when(scanned, F.col("n_rows")).otherwise(0)).alias("rows_scanned"),
                F.sum("n_match").alias("rows_matched"),
            ).select(
                F.lit(layout).alias("layout"), "n_files", "files_scanned",
                "rows_scanned", "rows_matched",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def layout_matrix(df: DataFrame, col_a: str, col_b: str,
                  preds: dict[str, tuple[float, float, float, float]],
                  n_files: int = 64, bits: int = ZBITS,
                  id_col: str = "event_id") -> DataFrame:
    """The full layout-choice study `pruning_stats` is one cell of:
    zone-map files-scanned for every (layout × predicate) pair, over
    three write layouts — Z-ORDER(a,b), 1-D SORT(a), and insertion
    order. This is the table that justifies the classic rule: a 1-D
    sort wins on its own column and loses badly on the other; Z-order
    is within ~2x of the 1-D sort on single-column predicates and far
    ahead on 2-D boxes. Same fixed-width-bucket file model as
    `pruning_stats` (deterministic, engine-reproducible; skew biases
    against the clustered layouts, so gains are floors).

    One scan per layout ending in an |files|-row zone-map aggregate;
    predicates are evaluated as flag columns in the same pass, so
    adding a predicate costs one column, not one scan.
    """
    zc = zorder_code(df, col_a, col_b, bits)
    z_lo, z_hi, i_lo, i_hi, a_lo_v, a_hi_v = zc.agg(
        F.min("z"), F.max("z"),
        F.min(F.col(id_col).cast("long")), F.max(F.col(id_col).cast("long")),
        F.min(F.col(col_a).cast("double")), F.max(F.col(col_a).cast("double")),
    ).first()
    if z_lo is None:  # empty input: no files, no rows — not a TypeError
        return zc.sparkSession.createDataFrame(
            [],
            "layout string, predicate string, n_files bigint,"
            " files_scanned bigint, rows_scanned bigint, rows_matched bigint",
        )

    def int_file(col: Column, lo: int, hi: int) -> Column:
        span = max(int(hi) - int(lo) + 1, 1)
        return F.least(
            F.floor((col.cast("long") - F.lit(int(lo))) * F.lit(n_files) / F.lit(span)),
            F.lit(n_files - 1),
        ).cast("int")

    a_span = (a_hi_v - a_lo_v) if a_hi_v > a_lo_v else 1.0
    sort_file = F.least(
        F.floor((F.col(col_a).cast("double") - F.lit(float(a_lo_v)))
                * F.lit(n_files) / F.lit(float(a_span))),
        F.lit(n_files - 1),
    ).cast("int")

    layouts = {
        "zorder": int_file(F.col("z"), z_lo, z_hi),
        "sort_a": sort_file,
        "insertion": int_file(F.col(id_col), i_lo, i_hi),
    }
    legs = []
    for layout, fcol in layouts.items():
        hits = [
            (F.col(col_a).cast("double") >= alo) & (F.col(col_a).cast("double") <= ahi)
            & (F.col(col_b).cast("double") >= blo) & (F.col(col_b).cast("double") <= bhi)
            for alo, ahi, blo, bhi in preds.values()
        ]
        per_file = (
            zc.select(
                fcol.alias("f"),
                F.col(col_a).cast("double").alias("_a"),
                F.col(col_b).cast("double").alias("_b"),
                *[h.cast("int").alias(f"_hit{i}") for i, h in enumerate(hits)],
            )
            .groupBy("f")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("_a").alias("a_min"), F.max("_a").alias("a_max"),
                F.min("_b").alias("b_min"), F.max("_b").alias("b_max"),
                *[F.sum(f"_hit{i}").alias(f"m{i}") for i in range(len(hits))],
            )
        )
        for i, (pname, (alo, ahi, blo, bhi)) in enumerate(preds.items()):
            scanned = (
                (F.col("a_max") >= alo) & (F.col("a_min") <= ahi)
                & (F.col("b_max") >= blo) & (F.col("b_min") <= bhi)
            )
            legs.append(
                per_file.agg(
                    F.count(F.lit(1)).alias("n_files"),
                    F.sum(scanned.cast("int")).alias("files_scanned"),
                    F.sum(F.when(scanned, F.col("n_rows")).otherwise(0)).alias("rows_scanned"),
                    F.sum(f"m{i}").alias("rows_matched"),
                ).select(
                    F.lit(layout).alias("layout"), F.lit(pname).alias("predicate"),
                    "n_files", "files_scanned", "rows_scanned", "rows_matched",
                )
            )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
