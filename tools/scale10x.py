#!/usr/bin/env python
"""10x scaling harness: replicate the sf0.1 tables 10-fold (shifted
ids; documents get a per-replica token so replicas are not exact
dups), run selected queries warm at 1x and 10x, and print the
t(10x)/t(1x) ratio table for SCALE.md §6.

Linear work spread over 32 cores should land well under 10; a ratio
NEAR or ABOVE 10 flags a quadratic term or a serialization point —
this harness is what caught sd01's per-character CDC cost and mm06's
8-bit-block quadratic candidate growth in earlier rounds.

Usage: PYTHONPATH=. python tools/scale10x.py q23_value_deciles sj01_salted_distinct ...
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPL = 10
ID_STRIDE = 100_000_000


def build_10x(spark, src: str, dst: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    ev = spark.read.parquet(f"{src}/events.parquet")
    docs = spark.read.parquet(f"{src}/documents.parquet")
    cust = spark.read.parquet(f"{src}/customer.parquet")
    reps = spark.range(REPL).select(F.col("id").alias("_r"))

    ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("_r") * ID_STRIDE).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_r") * ID_STRIDE).alias("user_id"),
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(f"{dst}/events.parquet")

    docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("_r") * ID_STRIDE).alias("doc_id"),
        F.concat_ws(" ", "text", F.concat(F.lit("rt"), F.col("_r"))).alias("text"),
        "lang", "source",
        (F.col("n_chars") + 4).alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    cust.crossJoin(reps).select(
        (F.col("c_custkey") + F.col("_r") * ID_STRIDE).alias("c_custkey"),
        F.concat_ws("-", "c_name", F.col("_r").cast("string")).alias("c_name"),
        *[c for c in cust.columns if c not in ("c_custkey", "c_name")],
    ).write.mode("overwrite").parquet(f"{dst}/customer.parquet")

    for name in ("region", "nation", "supplier", "part", "orders", "lineitem", "embeddings"):
        p = f"{src}/{name}.parquet"
        if os.path.exists(p) and not os.path.exists(f"{dst}/{name}.parquet"):
            os.symlink(os.path.abspath(p), f"{dst}/{name}.parquet")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: scale10x.py <query> [<query> ...]", file=sys.stderr)
        sys.exit(2)
    from ntripmonitor_spark.plans import REGISTRY
    from ntripmonitor_spark.session import get_spark

    spark = get_spark("scale10x")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = tempfile.mkdtemp(prefix="sf10x_")
    print(f"# building 10x tables in {dst}", file=sys.stderr)
    build_10x(spark, src, dst)

    print("| op | 1x | 10x | ratio |")
    print("|---|---|---|---|")
    for name in names:
        fn = REGISTRY[name].fn
        times = {}
        for label, d in (("1x", src), ("10x", dst)):
            # Clear the qa-family memo (operators/stats.py) before EVERY
            # invocation: (a) cross-sf sweeps must not accumulate
            # corpus-sized persisted blocks (round-11 ADVICE), and (b) a
            # timed run that reuses the warm run's persisted scan would
            # report the cached-aggregate cost, not the operator's
            # one-scan cost — the quantity this tool exists to scale.
            from ntripmonitor_spark.operators.stats import clear_hq_memo

            clear_hq_memo()
            fn(spark, d).count()  # warm

            def _timed_once() -> float:
                clear_hq_memo()
                t0 = time.perf_counter()
                fn(spark, d).count()
                return time.perf_counter() - t0

            times[label] = min(_timed_once() for _ in range(2))
        ratio = times["10x"] / times["1x"]
        print(f"| {name} | {times['1x']:.2f} s | {times['10x']:.2f} s | {ratio:.1f} |")
    shutil.rmtree(dst, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
