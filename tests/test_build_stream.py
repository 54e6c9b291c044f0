"""Continuous corpus build: JSONL drops curated micro-batch by
micro-batch must equal the batch build's gate+dedup verdicts, with
corrupt lines quarantined and placement deterministic."""

from __future__ import annotations

import json
import time

import pyspark.sql.functions as F
import pytest

from ntripmonitor_spark.streaming import build_stream as bs
from ntripmonitor_spark.tables import table


def test_streaming_build_matches_batch_gate_dedup(spark, sf_dir, tmp_path):
    docs = [r.asDict() for r in table(spark, sf_dir, "documents").orderBy("doc_id").limit(300).collect()]
    drop = tmp_path / "drop"
    drop.mkdir()

    # three sequential drops; drop 2 re-emits ten of drop 1's texts
    # under new ids (cross-batch dups the watermark dedup must kill)
    files = [docs[:100], docs[100:200], docs[200:300]]
    dups = [dict(d, doc_id=d["doc_id"] + 1_000_000) for d in docs[:10]]
    files[1] = files[1] + dups
    corrupt_line = '{"doc_id": 77, "text": "unterminated'
    for i, rows in enumerate(files):
        lines = [json.dumps(r) for r in rows]
        if i == 0:
            lines.append(corrupt_line)
        (drop / f"part-{i}.jsonl").write_text("\n".join(lines) + "\n")
        time.sleep(1.1)

    out = str(tmp_path / "shards")
    quar = str(tmp_path / "quarantine")
    q = bs.start_corpus_build_stream(
        spark, str(drop), out, quar, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    got = spark.read.option("basePath", out).parquet(out)
    got_ids = {r["doc_id"] for r in got.select("doc_id").collect()}

    # batch expectation: quality gate + first-arrival exact dedup
    # (arrival order == doc_id order here by construction)
    from ntripmonitor_spark.operators.text import quality_score_col

    all_rows = files[0] + files[1] + files[2]
    static = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["lang"], d["source"], d["n_chars"]) for d in all_rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("q", quality_score_col(F.col("text")))
    gated = static.filter(F.col("q") >= 0.5)
    want_ids = {
        r["keep"] for r in gated.groupBy(F.md5("text")).agg(F.min("doc_id").alias("keep")).collect()
    }
    assert got_ids == want_ids
    # none of the re-emitted duplicate ids survived
    assert not any(i >= 1_000_000 for i in got_ids)

    # quarantine holds exactly the corrupt line
    quarantined = spark.read.option("basePath", quar).parquet(quar)
    assert [r["raw_line"] for r in quarantined.collect()] == [corrupt_line]

    # placement is deterministic: every surviving doc sits in the same
    # (split, shard) the batch exporter assigns
    from ntripmonitor_spark.export import stage_training_shards

    want_place = {
        r["doc_id"]: (r["split"], r["shard"])
        for r in stage_training_shards(static.drop("q")).collect()
    }
    for r in got.select("doc_id", "split", "shard").collect():
        assert want_place[r["doc_id"]] == (r["split"], r["shard"])
