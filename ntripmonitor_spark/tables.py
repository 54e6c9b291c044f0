"""Loaders for the harness-provided synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.
Loading goes through ``spark.read.parquet`` so Catalyst gets predicate
pushdown / column pruning on every query that uses these.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark's
        # vectorized reader rejects) and as naive TIMESTAMP(MICROS) (which
        # Spark 4 infers as TIMESTAMP_NTZ — rejected by unix_micros and
        # friends). Normalize both to TIMESTAMP_LTZ whose epoch value is the
        # raw parquet integer, matching DuckDB's naive-timestamp semantics:
        # nanos → read as long, integer-truncate to µs (the ns value
        # overflows double precision); naive µs → disable NTZ inference so
        # the stored µs value is taken as the epoch directly (tz-independent).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Inference conf not honored (e.g. cached scan): fall back to a
            # session-tz cast — the harness pins UTC, where NTZ wall time
            # and epoch coincide exactly as in the DuckDB oracle. Explicit
            # LTZ target: under spark.sql.timestampType=TIMESTAMP_NTZ the
            # "timestamp" alias is NTZ and the cast would be a no-op.
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        return df
    return spark.read.parquet(path)


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Guard for compute-heavy stages fed by small parquet: a file with
    one row group arrives as ONE input split, serializing everything
    downstream onto one core. Repartition up to cluster parallelism
    only when the scan is under-split (at real scale inputs already
    have enough splits and this is a no-op — no gratuitous shuffle).

    Split count is ESTIMATED from the input file listing with Spark's
    own FilePartition packing formula (maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, bytesPerCore))) — no
    ``df.rdd`` detour, which would build the RDD lineage on every
    invocation. Non-file plans fall back to the RDD partition count."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        total, stat_ok = 0, True
        for f in files:
            # inputFiles() may report file:/p, file://p, or file:///p —
            # collapse any run of slashes after the scheme to a single "/".
            p = re.sub(r"^file:/+", "/", f) if f.startswith("file:") else f
            try:
                total += os.path.getsize(p)
            except OSError:
                stat_ok = False
                break
        if stat_ok and total:
            mpb = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 134217728)
            open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4194304)
            padded = total + len(files) * open_cost
            bytes_per_core = padded // max(target, 1)
            max_split = min(mpb, max(open_cost, bytes_per_core))
            est_splits = -(-padded // max(max_split, 1))
            if est_splits >= target:
                return df
            return df.repartition(target)
        # Un-stat-able inputs (s3://, hdfs://): fall through to the RDD
        # partition count rather than forcing a full shuffle of a
        # possibly huge scan on every call.
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _bytes_conf(spark: SparkSession, key: str, default: int) -> int:
    raw = str(spark.conf.get(key, str(default)))
    m = re.match(r"(\d+)\s*([kmgt]?)b?$", raw.strip().lower())
    mult = {"": 1, "k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    return int(m.group(1)) * mult[m.group(2)] if m else default


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (used by SQL-form queries)."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
