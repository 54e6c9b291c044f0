"""End-to-end corpus build: JSONL drop in → shards + manifest out,
with the audit, funnel, and export stages agreeing with each other."""

from __future__ import annotations

import json

import pytest

from ntripmonitor_spark.build import build_corpus
from ntripmonitor_spark.tables import table


@pytest.fixture(scope="module")
def jsonl_drop(spark, sf_dir, tmp_path_factory):
    docs = table(spark, sf_dir, "documents")
    rows = [json.dumps(r.asDict()) for r in docs.collect()]
    rows.insert(3, "{broken json line")
    p = tmp_path_factory.mktemp("drop") / "docs.jsonl"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_build_end_to_end(spark, sf_dir, jsonl_drop, tmp_path):
    out = str(tmp_path / "shards")
    quar = str(tmp_path / "quarantine")
    rep = build_corpus(spark, jsonl_drop, out, quarantine_path=quar)

    n_docs = table(spark, sf_dir, "documents").count()
    assert rep.n_ingested == n_docs + 1
    assert rep.n_corrupt == 1
    assert spark.read.parquet(quar).count() == 1
    # the audit partitions the corpus
    assert sum(rep.drop_stages.values()) == n_docs
    assert rep.n_kept > 0

    # exported shards hold exactly the kept docs, and the manifest
    # counts agree with the files
    shards = spark.read.parquet(out)
    assert shards.count() == rep.n_kept
    man = spark.read.parquet(f"{out}/_manifest_data")
    assert man.count() == rep.manifest_rows
    assert man.agg({"n_docs": "sum"}).collect()[0][0] == rep.n_kept
    # every kept doc carries its pack assignment into the shards
    assert "pack_id" in shards.columns
    assert shards.select("pack_id").distinct().count() == rep.n_packs


def test_build_refuses_rotten_drop(spark, tmp_path):
    bad = tmp_path / "bad.jsonl"
    bad.write_text("\n".join(
        ['{"doc_id": 1, "text": "ok doc", "lang": "en", "source": "w", "n_chars": 6}']
        + ["not json"] * 5
    ) + "\n")
    with pytest.raises(ValueError, match="corrupt-line rate"):
        build_corpus(spark, str(bad), str(tmp_path / "out"))
