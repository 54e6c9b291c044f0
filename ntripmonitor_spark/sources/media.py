"""Media-file ingest: Spark's ``binaryFile`` source → typed manifest.

This is how image/audio/video actually enters a cluster: a directory
tree of media files becomes a DataFrame of (path, modificationTime,
length, content) rows — reads are partition-parallel, small files pack
into tasks under ``spark.sql.files.maxPartitionBytes``, and
``pathGlobFilter``/``recursiveFileLookup`` prune at listing time. The
manifest stage routes each payload by magic bytes and extracts REAL
per-modality metadata with the built-in zero-dependency codecs
(functions/png.py, functions/gif.py, stdlib ``wave``), yielding the
bronze table a multimodal curation pipeline starts from.

100 TB note: ``binaryFile`` caps single-file size at
``spark.sql.sources.binaryFile.maxLength`` (2 GB default) and the
driver pays the file listing — at billions of objects, land listings
incrementally (streaming ``cloudFiles``-style or manifest files) and
keep this stage purely per-row so it scales with executors, which it
is: one mapInPandas over the content column, no shuffle.

Reference scope note: the reference ingests NTRIP byte streams only
(src/ntripclient.py); media ingest is a north-star extension.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

MANIFEST_SCHEMA = (
    "path string, n_bytes bigint, modality string, width int, height int, "
    "n_frames int, n_samples int, sample_rate int, checksum string"
)


def read_media(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Directory (tree) of media files → binaryFile DataFrame."""
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _sniff_and_extract(payload: bytes) -> dict:
    """Magic-byte routing + real per-modality metadata extraction."""
    from ntripmonitor_spark.functions import gif, png

    meta = {"modality": "other", "width": None, "height": None,
            "n_frames": None, "n_samples": None, "sample_rate": None}
    try:
        if png.is_png(payload):
            w, h = png.png_size(payload)
            meta.update(modality="image", width=w, height=h, n_frames=1)
        elif gif.is_gif(payload):
            frames = gif.decode_gif(payload)
            n, h, w, _ = frames.shape
            meta.update(modality="video", width=w, height=h, n_frames=n)
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            import io
            import wave

            with wave.open(io.BytesIO(payload)) as wv:
                meta.update(
                    modality="audio",
                    n_samples=wv.getnframes(),
                    sample_rate=wv.getframerate(),
                )
    except Exception:  # corrupt media: quarantine as modality="corrupt"
        meta["modality"] = "corrupt"
    return meta


def manifest_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            payload = bytes(content)
            meta = _sniff_and_extract(payload)
            rows.append({
                "path": path,
                "n_bytes": len(payload),
                "checksum": hashlib.md5(payload).hexdigest(),
                **meta,
            })
        cols = ["path", "n_bytes", "modality", "width", "height",
                "n_frames", "n_samples", "sample_rate", "checksum"]
        # Column-wise build: pd.DataFrame([]) has no columns at all and
        # the selection below would KeyError on an empty Arrow batch.
        yield pd.DataFrame({c: [r[c] for r in rows] for c in cols})


def media_manifest(media: DataFrame) -> DataFrame:
    """binaryFile rows → typed manifest (one row per file): modality
    routed by magic bytes, dimensions/frame counts/sample rates from
    the REAL codecs, md5 for dedup joins. Pure per-row map — no
    shuffle; scales with executors."""
    return media.select("path", "content").mapInPandas(
        manifest_batch, schema=MANIFEST_SCHEMA
    )


def ingest_media(spark: SparkSession, path: str,
                 glob: str | None = None) -> DataFrame:
    """One-call bronze build: read + manifest."""
    return media_manifest(read_media(spark, path, glob))


BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_media(spark: SparkSession, path: str,
                 glob: str | None = None) -> DataFrame:
    """Continuous media ingest: the same binaryFile relation as a
    STREAM over a watched drop directory — each new file becomes a
    manifest row in the micro-batch after it lands (the cloud
    auto-loader pattern on OSS Spark; checkpointing makes it
    exactly-once per file). Compose with ``media_manifest``."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(BINARYFILE_SCHEMA)
        .option("recursiveFileLookup", "true")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
