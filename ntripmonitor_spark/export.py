"""Training-corpus export: the sink side of the curation pipeline.

The reference's sinks land decoded GNSS rows in PostgreSQL (sinks.py);
the training-data pipeline's equivalent terminal step is a sharded,
split-partitioned parquet layout a trainer can consume directly:

    out/split=train/shard=00017/part-*.parquet
    out/_manifest/…           (one row per (split, shard): counts + bytes)

Design points for 100 TB:

- **Deterministic placement.** split and shard are pure functions of
  doc_id (sp05's integer-cutoff hash split; Knuth-hash shard), so a
  re-run, a retry, or an incremental append places every document in
  the same file group — no RNG, no partition-layout dependence.
- **Bounded files.** ``n_shards`` controls file count per split;
  writers repartition by (split, shard) so each shard is written by
  one task as one file group — no tiny-file explosion, no single-task
  giant file (shards spread a dominant split across the cluster).
- **Self-describing.** The manifest is computed from the SAME
  DataFrame in the same job (one aggregate), so trainer-side
  validation (counts per shard) needs no directory listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ntripmonitor_spark.operators.sampling import KNUTH, split_col


def stage_training_shards(docs: DataFrame, n_shards: int = 16) -> DataFrame:
    """Attach deterministic (split, shard) placement columns — pure
    expressions over the scan (sp05's split plus an offset Knuth
    shard), no join anywhere."""
    shard = F.pmod(
        F.pmod(F.col("doc_id") * F.lit(KNUTH) + F.lit(7919), F.lit(1 << 32)),
        F.lit(n_shards),
    ).cast("int")
    return docs.withColumn("split", split_col(F.col("doc_id"))).withColumn("shard", shard)


def write_training_shards(docs: DataFrame, path: str, n_shards: int = 16) -> DataFrame:
    """Write the corpus as split/shard-partitioned parquet plus a
    manifest; returns the manifest DataFrame.

    One repartition keyed by (split, shard) feeds the writer, so each
    partition directory is produced by exactly one task. The manifest
    aggregate reuses the staged relation (same scan)."""
    staged = stage_training_shards(docs, n_shards=n_shards)
    (
        staged.repartition(F.col("split"), F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(path)
    )
    manifest = (
        staged.groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest_data")
    return manifest


def read_training_split(spark: SparkSession, path: str, split: str) -> DataFrame:
    """Trainer-side read of one split — partition pruning keeps the
    scan to that split's directories only."""
    return spark.read.parquet(path).filter(F.col("split") == split)
