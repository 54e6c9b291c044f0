"""Z-order layout: Morton-code correctness vs a Python reference, and
the actual pruning property — z-ordered files carry tight parquet
min/max bounding boxes in BOTH dimensions, linear sort in only one."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ntripmonitor_spark.functions.zorder import morton_interleave, write_zordered
from ntripmonitor_spark.tables import table


def _morton_ref(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
                      min_size=1, max_size=30))
def test_morton_matches_reference(spark, pairs):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(pairs, "a long, b long")
    got = {(r["a"], r["b"]): r["z"]
           for r in df.withColumn("z", morton_interleave(F.col("a"), F.col("b"))).collect()}
    for (a, b), z in got.items():
        assert z == _morton_ref(a, b), (a, b, z)


def _file_bboxes(path: str, col_a: str, col_b: str) -> list[tuple[float, float, float, float]]:
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins = {c: min(md.row_group(g).column(idx[c]).statistics.min
                       for g in range(md.num_row_groups)) for c in (col_a, col_b)}
        maxs = {c: max(md.row_group(g).column(idx[c]).statistics.max
                       for g in range(md.num_row_groups)) for c in (col_a, col_b)}
        out.append((mins[col_a], maxs[col_a], mins[col_b], maxs[col_b]))
    return out


def _mean_bbox_area(boxes, span_a, span_b) -> float:
    return sum(
        ((xa1 - xa0) / span_a) * ((xb1 - xb0) / span_b) for xa0, xa1, xb0, xb1 in boxes
    ) / len(boxes)


def test_zorder_files_prune_on_both_dimensions(spark, sf_dir, tmp_path):
    """The point of the layout: under a linear sort on event_id, every
    file spans the FULL value range (a value-band predicate prunes
    nothing); z-ordered, each file covers a fraction of BOTH dimensions
    — per-file min/max widths stay bounded in each, so parquet stats
    prune range predicates on either column."""
    import pyspark.sql.functions as F

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    stats = ev.agg(
        F.min("event_id"), F.max("event_id"), F.min("value"), F.max("value")
    ).first()
    span_a = float(stats[1] - stats[0]) or 1.0
    span_b = float(stats[3] - stats[2]) or 1.0

    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(ev, zpath, "event_id", "value", n_files=16)
    (
        ev.repartitionByRange(16, "event_id")
        .sortWithinPartitions("event_id")
        .write.mode("overwrite").parquet(lpath)
    )

    def widths(path):
        boxes = _file_bboxes(path, "event_id", "value")
        wa = sum((a1 - a0) / span_a for a0, a1, _, _ in boxes) / len(boxes)
        wb = sum((b1 - b0) / span_b for _, _, b0, b1 in boxes) / len(boxes)
        return wa, wb

    z_wa, z_wb = widths(zpath)
    l_wa, l_wb = widths(lpath)
    # observed at sf0.001: z=(0.29, 0.24) vs linear=(0.06, 0.68) — the
    # heavy-tailed value column keeps linear slices under a width of 1,
    # but z-order still halves the un-sorted dimension's coverage
    # (≈3x fewer files survive a value-band predicate) while keeping
    # event_id spans bounded for pruning on that side too.
    assert l_wb > 0.5, f"fixture surprise: linear layout already tight in value ({l_wb:.3f})"
    assert z_wb < l_wb * 0.5, f"z-order value spans not tighter: z={z_wb:.3f} linear={l_wb:.3f}"
    assert z_wa < 0.5, f"z-order files span event_id too widely ({z_wa:.3f})"


def test_aqe_splits_skewed_join_partition(spark):
    """Skew handling (SCALE.md §6): the engine session enables AQE
    skew-join, and with test-scaled thresholds a hot join key is
    actually split at runtime — the final adaptive plan must report a
    skew-handled shuffle read instead of one straggler task."""
    import pyspark.sql.functions as F

    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join

        # one hot key carrying ~90% of rows + payload to exceed thresholds
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
        joined = left.join(right, "k")
        # execute THIS DataFrame's plan (count() would spawn a separate
        # query execution and leave joined's AQE plan unfinalized);
        # 90% of left rows collapse onto hot key 0 (in right), the rest
        # only match while id < 1000 → 180000 + 100 rows
        assert len(joined.collect()) == 180_100
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "skew=true" in plan, f"AQE did not split the hot partition\n{plan[:2500]}"
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
