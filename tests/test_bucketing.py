"""Bucketed co-located join proof (SCALE.md §2/§3): writing both fact
tables bucketed by the join key lets the join run with ZERO shuffle
exchanges — the storage-level answer to the biggest fact-fact shuffle
at 100 TB (lineitem ⋈ orders on orderkey)."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from ntripmonitor_spark.tables import table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_bucketed_fact_join_has_no_shuffle(spark, sf_dir):
    # tables land in the session warehouse dir (gitignored
    # spark-warehouse/); scrub catalog AND directories first so a
    # crashed prior run cannot leave a LOCATION_ALREADY_EXISTS corpse
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh.removeprefix("file:"), t), ignore_errors=True)
    n_buckets = 8
    table(spark, sf_dir, "orders").write.bucketBy(n_buckets, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("orders_b")
    table(spark, sf_dir, "lineitem").write.bucketBy(n_buckets, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("lineitem_b")

    o = spark.table("orders_b").select("o_orderkey", "o_totalprice")
    l = spark.table("lineitem_b").select("l_orderkey", "l_quantity")
    joined = o.join(l, o.o_orderkey == l.l_orderkey)

    # at test SF orders is broadcast-sized, which would trivially avoid
    # the shuffle; disable broadcast to expose what a 100 TB fact-fact
    # join would do — bucketing must make even THAT exchange-free
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        shuffles = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
        assert shuffles == 0, f"bucketed join still shuffles\n{plan[:2000]}"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and it is not just a plan artifact: the join answers correctly
    got = joined.agg(F.count(F.lit(1))).collect()[0][0]
    want = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert got == want > 0

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
