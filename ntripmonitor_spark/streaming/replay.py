"""Replay streaming source — a custom PySpark ``DataSource``.

Replays an archived frame table (parquet written by
``write_frame_archive``) as a rate-limited micro-batch stream with
real offset tracking, exercising the same source contract the live
NTRIP source needs (SURVEY.md §2.1 S1; offsets are archive row
positions, the durable analog of the reference's
connection-relative byte positions — §7.3 "bronze first").

The live-caster variant would swap the archive iterator for
``sources.ntrip_client`` socket reads per mountpoint partition; the
frame-alignment state machine (``scan_frames(final=False)``) and the
offset/commit plumbing are identical, which is exactly what the replay
path tests.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ARCHIVE_SCHEMA = StructType(
    [
        StructField("mountpoint", StringType()),
        StructField("receive_time_us", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def write_frame_archive(frames_df, path: str) -> None:
    """Persist (mountpoint, receive_time, frame) rows as a replayable
    archive, ordered-stable via a row index."""
    from ntripmonitor_spark.functions.timeutil import epoch_us

    (
        frames_df.select(
            "mountpoint", epoch_us("receive_time").alias("receive_time_us"), "frame"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )


class _ReplayReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ntrip_replay requires option 'path'")
        self.batch_rows = int(options.get("batchrows", "1000"))
        self._rows = None

    def _load(self):
        if self._rows is None:
            import pyarrow.dataset as ds

            table = ds.dataset(self.path, format="parquet").to_table(
                columns=["mountpoint", "receive_time_us", "frame"]
            )
            self._rows = list(zip(*(table.column(c).to_pylist() for c in
                                    ("mountpoint", "receive_time_us", "frame"))))
        return self._rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        rows = self._load()
        lo = start["row"]
        hi = min(lo + self.batch_rows, len(rows))
        return iter(rows[lo:hi]), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = self._load()
        return iter(rows[start["row"]:end["row"]])

    def commit(self, end: dict) -> None:
        pass


class NtripReplayDataSource(DataSource):
    """``spark.readStream.format("ntrip_replay").option("path", …)``."""

    @classmethod
    def name(cls) -> str:
        return "ntrip_replay"

    def schema(self):
        return ARCHIVE_SCHEMA

    def simpleStreamReader(self, schema):
        return _ReplayReader(self.options)


def register_replay_source(spark) -> None:
    spark.dataSource.register(NtripReplayDataSource)


def frames_stream(spark, archive_path: str, batch_rows: int = 1000):
    """readStream over an archive → (mountpoint, receive_time, frame)."""
    from pyspark.sql import functions as F

    register_replay_source(spark)
    raw = (
        spark.readStream.format("ntrip_replay")
        .option("path", archive_path)
        .option("batchrows", str(batch_rows))
        .load()
    )
    return raw.select(
        "mountpoint",
        F.timestamp_micros(F.col("receive_time_us")).alias("receive_time"),
        "frame",
    )
