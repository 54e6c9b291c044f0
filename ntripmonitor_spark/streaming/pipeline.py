"""Streaming decode pipeline + windowed analytics + idempotent sinks.

The SAME operators run in batch and streaming plans (SURVEY.md §7.3
100-TB rule #5): ``rtcm.decode_frames`` / ``rtcm.packages`` /
``rtcm.observations`` are plain DataFrame transforms, so applying them
to a streaming frames DataFrame yields the streaming ingest path of
SURVEY.md §3.1 — replay/NTRIP source → mapInPandas decode → derived
packages/observations → foreachBatch sinks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ntripmonitor_spark.operators import rtcm


def stream_packages(frames: DataFrame) -> DataFrame:
    return rtcm.packages(rtcm.decode_frames(frames))


def stream_observations(frames: DataFrame) -> DataFrame:
    return rtcm.observations(rtcm.decode_frames(frames))


def windowed_rates(packages: DataFrame, window: str = "1 minute",
                   watermark: str = "2 minutes") -> DataFrame:
    """Streaming Q1+Q2+Q5: tumbling event-time window per mountpoint
    with byte-rate normalization (the flagship dashboard panel, RTCM
    monitor.json:645), late data bounded by the watermark."""
    return (
        packages.withWatermark("receive_time", watermark)
        .groupBy(F.window("receive_time", window).alias("w"), "mountpoint")
        .agg(
            F.count(F.lit(1)).alias("n_msgs"),
            F.sum("msg_size").alias("total_bytes"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "mountpoint",
            "n_msgs",
            "total_bytes",
            (F.col("total_bytes") / 60.0 / 1024.0).alias("kb_per_s"),
        )
    )


def idempotent_parquet_sink(base_path: str):
    """foreachBatch writer: each micro-batch lands in its own
    ``batch_id=N`` partition with overwrite, so replayed batch ids
    (restart-from-checkpoint) cannot double-write — the
    exactly-once-discipline upgrade over the reference's
    at-least-once inserts (SURVEY.md §2.6)."""

    def write(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(base_path, f"batch_id={batch_id}"))

    return write


def run_archive_to_parquet(spark, archive_path: str, out_path: str,
                           checkpoint: str, batch_rows: int = 1000):
    """End-to-end streaming job: replay archive → decode → envelope →
    idempotent parquet sink. Returns the finished StreamingQuery."""
    from ntripmonitor_spark.streaming.replay import frames_stream

    frames = frames_stream(spark, archive_path, batch_rows)
    pk = stream_packages(frames)
    # Python DataSources don't support Trigger.AvailableNow (Spark
    # falls back to ONE batch); drive with processAllAvailable instead.
    q = (
        pk.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(idempotent_parquet_sink(out_path))
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
