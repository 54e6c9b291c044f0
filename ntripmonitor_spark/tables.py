"""Loaders for the harness-provided synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.
Loading goes through ``spark.read.parquet`` so Catalyst gets predicate
pushdown / column pruning on every query that uses these.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

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


def silver_archive(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
    *,
    salt: str = "",
) -> str:
    """Materialize a deterministic derived table ONCE per (sf_dir, code
    version) as a parquet archive under /tmp and return its path.

    Probe-only serving queries (phrase search over a posting index,
    decode throughput over aligned frames) should pay the build cost
    once per corpus version, not per query — at scale the silver table
    is a managed warehouse table; locally this cache stands in for it.
    The cache key mixes the sf_dir parquet mtimes/sizes and a caller
    salt (typically source-module mtimes) so a code OR data change
    invalidates stale archives instead of silently serving old rows.
    The directory is per-uid so concurrent users cannot race on a
    shared predictable path, and writes land in a scratch dir that is
    atomically renamed into place so a concurrent run never observes a
    half-written archive.
    """
    import getpass
    import hashlib
    import tempfile

    data_salt = "|".join(
        f"{f}:{os.path.getmtime(os.path.join(sf_dir, f))}:{os.path.getsize(os.path.join(sf_dir, f))}"
        for f in sorted(os.listdir(sf_dir))
        if f.endswith(".parquet") and os.path.isfile(os.path.join(sf_dir, f))
    )
    key = hashlib.md5(
        (os.path.abspath(sf_dir) + "|" + name + "|" + salt + "|" + data_salt).encode()
    ).hexdigest()[:12]
    try:
        user = getpass.getuser()
    except Exception:
        user = str(os.getuid()) if hasattr(os, "getuid") else "u"
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_{user}")
    os.makedirs(base, exist_ok=True)
    path = os.path.join(base, f"{name}_{key}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        scratch = tempfile.mkdtemp(dir=base, prefix=f"{name}_{key}.tmp.")
        build().write.mode("overwrite").parquet(scratch)
        try:
            os.rename(scratch, path)
        except OSError:
            # Lost the race to another run — its archive is equivalent.
            import shutil

            shutil.rmtree(scratch, ignore_errors=True)
    return path


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
