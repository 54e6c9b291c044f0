"""Streaming incremental FUZZY decontamination: `dc04`'s MinHash-LSH
corpus-vs-benchmark scoring in its production topology.

Documents arrive as a stream; the benchmark (eval-suite) signature
table is FIXED state computed from a static eval DataFrame — it is
eval-suite-sized, so its signatures and bands broadcast into every
micro-batch. Per batch: sign the batch (one scan), band it, join the
broadcast benchmark bands, score candidates by signature slot
agreement, and land per-doc contamination rows under an idempotent
batch_id partition (the dedup_stream sink discipline: a replayed
batch overwrites its own partition, so restart cannot double-write).

Equivalence with the batch operator is pinned in
tests/test_round9_ops.py over a multi-trigger replay — the streaming
path produces the same per-doc (n_pairs, max_slot_matches, flagged)
rows as one batch `bench_match_scores` over the full corpus, because
scoring is per-doc against fixed benchmark state (no cross-batch
interaction at all).

Reference framing: the reference has no decontamination surface; this
is the continuous-ingest shape a training-corpus pipeline needs so
eval leakage is flagged AT ARRIVAL, not in a nightly sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ntripmonitor_spark.operators.dedup import (
    bench_match_scores,
    minhash_signatures,
)


def start_fuzzy_decontam_stream(doc_stream: DataFrame, bench_docs: DataFrame,
                                scores_path: str, checkpoint: str,
                                n: int = 3, min_matches: int = 5):
    """Wire fuzzy decontamination into foreachBatch; returns the
    started streaming query. Per-doc contamination rows land at
    ``scores_path`` (batch_id partitions). ``bench_docs`` is the
    static eval set (doc_id + text)."""

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        # Benchmark signatures: tiny (eval-suite-sized) and
        # deterministic — recomputed per batch for simplicity; a
        # long-lived deployment would pin them as a silver table.
        bsig = minhash_signatures(bench_docs, n)
        csig = minhash_signatures(batch_df, n)
        scores = bench_match_scores(csig, bsig).select(
            F.col("corpus_id").alias("doc_id"),
            "n_pairs",
            F.col("max_m").alias("max_slot_matches"),
            (F.col("max_m") >= min_matches).alias("flagged"),
        )
        (
            scores.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            # per-write option, NOT spark.conf.set on the shared session:
            # a session-level partitionOverwriteMode=dynamic would leak
            # past the stream and silently change overwrite semantics for
            # unrelated writes (ADVICE r9)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(scores_path)
        )

    return (
        doc_stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
