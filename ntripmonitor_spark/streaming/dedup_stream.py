"""Streaming incremental dedup: `dedup.minhash_lsh_delta` in its
production topology.

Documents arrive as a stream; per micro-batch, the batch is signed and
delta-deduped against the accumulated corpus SIGNATURE table (a
parquet silver table — the only dedup state, K×32 B per document,
never the text). Both outputs land under an idempotent batch_id
partition (the rollup/sketch sink discipline: a replayed batch
overwrites its own partition, so restart cannot double-write), and the
signature table grows by exactly the batch's rows.

Equivalence with a single full-corpus LSH run is pinned in
tests/test_streaming.py over a multi-trigger replay — the streaming
path produces the same pair set with the same estimated Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ntripmonitor_spark.operators.dedup import MINHASH_PERMS, minhash_lsh_delta

SIG_SCHEMA = "doc_id long, " + ", ".join(f"mh{i} string" for i in range(MINHASH_PERMS))


def _existing_sigs(spark: SparkSession, sig_path: str) -> DataFrame:
    try:
        return spark.read.parquet(sig_path).drop("batch_id")
    except Exception:  # first batch: no silver table yet
        return spark.createDataFrame([], SIG_SCHEMA)


def start_incremental_dedup(doc_stream: DataFrame, sig_path: str,
                            pairs_path: str, checkpoint: str):
    """Wire the delta dedup into foreachBatch; returns the started
    streaming query. Pairs land at ``pairs_path`` (batch_id
    partitions), signatures accumulate at ``sig_path``."""

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        existing = _existing_sigs(spark, sig_path)
        pairs, new_sigs = minhash_lsh_delta(existing, batch_df)
        (
            pairs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite").partitionBy("batch_id").parquet(pairs_path)
        )
        (
            new_sigs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite").partitionBy("batch_id").parquet(sig_path)
        )

    return (
        doc_stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
