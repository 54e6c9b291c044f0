"""Silver-layout proof: the partitioned parquet mirror prunes
partitions on time predicates — the Spark analog of TimescaleDB chunk
exclusion the reference relies on (initdb/01:11-13)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ntripmonitor_spark import sinks
from ntripmonitor_spark.plans.rtcm import decoded_events
from ntripmonitor_spark.operators import rtcm


def test_silver_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "silver_packages")
    pk = rtcm.packages(decoded_events(spark, sf_dir))
    sinks.write_silver(pk, path)

    silver = sinks.read_silver(spark, path)
    dates = sorted(r[0] for r in silver.select("p_date").distinct().collect())
    assert len(dates) >= 2, "fixture should span multiple days"

    one_day = silver.filter((F.col("p_date") == dates[0]) & (F.col("p_bucket") == 0))
    plan = one_day._sc._jvm.PythonSQLUtils.explainString(one_day._jdf.queryExecution(), "formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "p_date" in m.group(1) and "p_bucket" in m.group(1), (
        f"partition filters not applied:\n{plan[:1500]}"
    )

    # pruned read returns exactly the partition's rows (vs full scan)
    expected = sinks.with_layout_columns(pk).filter(
        (F.col("p_date") == dates[0]) & (F.col("p_bucket") == 0)
    )
    assert one_day.count() == expected.count() > 0

    # round-trip fidelity: silver holds every envelope row
    assert silver.count() == pk.count()


def test_retention_sweep_drops_expired_partitions(spark, sf_dir, tmp_path):
    """Retention parity (SURVEY §2.6): partitions older than the keep
    window are dropped as whole directories — no data rewrite — and
    the surviving partitions stay readable and prunable."""
    import datetime as dt

    path = str(tmp_path / "silver_ret")
    pk = rtcm.packages(decoded_events(spark, sf_dir))
    sinks.write_silver(pk, path)

    dates = sorted(
        r[0] for r in sinks.read_silver(spark, path).select("p_date").distinct().collect()
    )
    assert len(dates) >= 2
    # keep only the newest date: sweep with cutoff just after the oldest
    keep_from = dates[-1]
    today = keep_from + dt.timedelta(days=30)
    dropped = sinks.retention_sweep(path, keep_days=30, today=str(today))
    assert dropped == [f"p_date={d}" for d in dates[:-1]]

    survivors = sinks.read_silver(spark, path)
    left = sorted(r[0] for r in survivors.select("p_date").distinct().collect())
    assert left == [keep_from]
    # idempotent: second sweep drops nothing
    assert sinks.retention_sweep(path, keep_days=30, today=str(today)) == []
