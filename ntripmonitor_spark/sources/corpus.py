"""Corpus file ingestion: JSONL (and CSV) document readers with
explicit corrupt-record accounting — the formats a training-data
pipeline actually receives (web dumps, vendor drops, export shards)
before anything becomes parquet.

Design rules:

* **Schema is declared, never inferred.** Inference is a full extra
  pass over 100 TB and locks in whatever the first files happened to
  contain; a declared schema makes missing fields NULL (visible)
  instead of silently re-typing columns.
* **Corrupt lines are data, not exceptions.** PERMISSIVE mode routes
  unparseable lines to a ``_corrupt_record`` column; :func:`split_corrupt`
  splits the stream into (clean, quarantine) so the pipeline can land
  the quarantine for inspection instead of dying mid-ingest (FAILFAST)
  or silently dropping rows (DROPMALFORMED).
* **The reader is line-splittable.** JSONL and CSV split on newlines,
  so Spark parallelizes a single huge file across tasks (multiline
  JSON does not — never ship multiline at scale).

Reference scope note: the reference ingests NTRIP byte streams only
(src/ntripclient.py); file-drop corpus ingestion is a north-star
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Documents from JSONL with the declared schema; unparseable lines
    survive as rows whose only non-null column is ``_corrupt_record``.

    Note: Spark's PERMISSIVE corrupt-column only materializes when the
    corrupt column is part of the declared schema — which is why
    DOCUMENT_SCHEMA carries it.
    """
    return (
        spark.read.schema(DOCUMENT_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_documents_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """Same contract for CSV drops (declared schema, PERMISSIVE)."""
    return (
        spark.read.schema(DOCUMENT_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .csv(path)
    )


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean drops the corrupt column entirely;
    quarantine keeps the raw offending line for inspection.

    The parsed frame is cached first: Spark refuses to answer queries
    whose scan references ONLY the corrupt column (the parser would
    have nothing to fail on — QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    the cache also guarantees both branches see one parse. At 100 TB
    the same contract is met by landing the parsed frame to a bronze
    table and splitting from there — parse once, split from storage."""
    raw = raw.cache()
    clean = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return clean, quarantine


def ingest_report(raw: DataFrame) -> DataFrame:
    """One-row ingest summary: clean/corrupt counts and null rates of
    required fields among clean rows — the gate a pipeline checks
    before promoting a drop to bronze."""
    is_bad = F.col("_corrupt_record").isNotNull()
    return raw.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(is_bad, 1).otherwise(0)).alias("n_corrupt"),
        F.sum(F.when(~is_bad & F.col("doc_id").isNull(), 1).otherwise(0)).alias("n_missing_id"),
        F.sum(F.when(~is_bad & F.col("text").isNull(), 1).otherwise(0)).alias("n_missing_text"),
    )
