"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
struct of metadata; decode / feature-extraction runs as an Arrow-batched
``mapInPandas`` stage (the only sanctioned Python hot path). The decode
kernel itself is STUBBED deterministically — the real codec libraries
are not in this container — but the Spark-side plumbing (schema, batch
iteration, partition behavior) is real and tested.

At 100 TB: payloads stay columnar in parquet (binary column chunks),
metadata predicates prune row groups before any byte of payload is
decoded, and the mapInPandas stage size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, checksum string"
)

REAL_CODECS_AVAILABLE = False  # no PIL/ffmpeg in this container


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake of an image-header decode: derive dimensions
    from the first two payload bytes. A real build replaces this with
    PIL/pyav behind the same signature."""
    if REAL_CODECS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire a real codec here")
    if not payload:
        return (0, 0)
    w = payload[0] % 64 + 1
    h = (payload[1] % 64 + 1) if len(payload) > 1 else 1
    return (w, h)


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one metadata frame out."""
    import hashlib

    for pdf in batches:
        dims = pdf["payload"].map(_decode_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "width": dims.map(lambda d: d[0]).astype("int32"),
                "height": dims.map(lambda d: d[1]).astype("int32"),
                "checksum": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


def binary_payloads(docs: DataFrame) -> DataFrame:
    """Synthesize the multimodal layout from the documents table: the
    UTF-8 text bytes stand in for an opaque media payload."""
    return docs.select("doc_id", F.col("text").cast("binary").alias("payload"))


def decode_metadata(docs: DataFrame) -> DataFrame:
    """binary payload → typed metadata via Arrow-batched mapInPandas."""
    return binary_payloads(docs).mapInPandas(decode_batch, schema=DECODE_SCHEMA)
