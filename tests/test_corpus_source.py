"""JSONL/CSV corpus ingestion: declared-schema reads, corrupt-line
quarantine, and round-trip fidelity against the parquet documents
table."""

from __future__ import annotations

import json

from ntripmonitor_spark.sources import corpus
from ntripmonitor_spark.tables import table


def _write_jsonl(tmp_path, rows, corrupt_lines=()):
    p = tmp_path / "docs.jsonl"
    lines = [json.dumps(r) for r in rows]
    lines.extend(corrupt_lines)
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    """documents.parquet -> JSONL -> reader must reproduce the table
    exactly (same rows, no corrupt records)."""
    docs = table(spark, sf_dir, "documents").limit(200)
    rows = [r.asDict() for r in docs.collect()]
    path = _write_jsonl(tmp_path, rows)
    back = corpus.read_documents_jsonl(spark, path)
    clean, quarantine = corpus.split_corrupt(back)
    assert quarantine.count() == 0
    got = {(r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"]) for r in clean.collect()}
    want = {(r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"]) for r in rows_as_tuples(rows)}
    assert got == want


def rows_as_tuples(rows):
    class R(dict):
        def __getitem__(self, k):
            return dict.get(self, k)

    return [R(r) for r in rows]


def test_corrupt_lines_quarantined_not_dropped(spark, sf_dir, tmp_path):
    """Broken JSON lines must surface in the quarantine with the raw
    line intact, while clean rows parse; missing fields read as NULL
    and show up in the ingest report."""
    rows = [
        {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web", "n_chars": 10},
        {"doc_id": 2, "lang": "de", "source": "web", "n_chars": 0},  # missing text
    ]
    bad = ['{"doc_id": 3, "text": "unterminated', "not json at all"]
    path = _write_jsonl(tmp_path, rows, bad)
    raw = corpus.read_documents_jsonl(spark, path)
    clean, quarantine = corpus.split_corrupt(raw)
    assert clean.count() == 2
    q = sorted(r["raw_line"] for r in quarantine.collect())
    assert q == sorted(bad)
    rep = corpus.ingest_report(raw).collect()[0]
    assert rep["n_lines"] == 4
    assert rep["n_corrupt"] == 2
    assert rep["n_missing_id"] == 0
    assert rep["n_missing_text"] == 1
    # schema is declared, not inferred: clean carries every column
    assert set(clean.columns) == {"doc_id", "text", "lang", "source", "n_chars"}


def test_csv_reader_same_contract(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello world,en,web,11\n"
        "2,guten tag,de,books,9\n"
        "oops,this row is broken,,,not_a_number\n"
    )
    raw = corpus.read_documents_csv(spark, str(p))
    clean, quarantine = corpus.split_corrupt(raw)
    assert clean.count() == 2
    assert quarantine.count() == 1
    assert "oops" in quarantine.collect()[0]["raw_line"]


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """The corpus layer is format-agnostic where Spark is: ORC
    round-trips the documents table losslessly (same rows), giving
    drops in ORC a first-class path without new code."""
    from ntripmonitor_spark.tables import table

    docs = table(spark, sf_dir, "documents").limit(100)
    p = str(tmp_path / "docs_orc")
    docs.write.orc(p)
    back = spark.read.orc(p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """A v2 drop adds a column: mergeSchema reads must surface the new
    column with NULLs for v1 files — the forward-compatible contract
    an append-only silver table needs (and why the readers declare
    schemas instead of inferring: evolution is explicit, not
    accidental)."""
    from pyspark.sql import functions as F2

    from ntripmonitor_spark.tables import table

    docs = table(spark, sf_dir, "documents").limit(50)
    p = str(tmp_path / "silver")
    docs.write.parquet(p)
    docs.withColumn("quality_score", F2.lit(0.5)).write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert "quality_score" in merged.columns
    assert merged.count() == 100
    assert merged.filter(F2.col("quality_score").isNull()).count() == 50
