"""One-command corpus build: the end-to-end composition a user of this
engine actually runs — raw JSONL drop in, trainer-ready shards out,
with a per-stage accounting report.

    ingest (declared schema, corrupt quarantine)
      → ingest gate (corrupt-rate threshold)
      → profile snapshot (dq01's one-pass report)
      → curation funnel (quality gate → exact dedup → temperature mix
        → packing; cu01's plan) with cu04's drop audit alongside
      → split/shard export + manifest (export.py)

Everything between ingest and export is ONE Spark lineage — no
intermediate materialization except the quarantine and the final
shards; the profile/audit/report aggregates are side outputs of the
same scans. Every stage is individually oracle- or test-verified
elsewhere; this module only composes and accounts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ntripmonitor_spark.export import write_training_shards
from ntripmonitor_spark.operators import curation, profile
from ntripmonitor_spark.sources import corpus


@dataclass(frozen=True)
class BuildReport:
    """Per-stage accounting: the numbers a pipeline run is judged by."""

    n_ingested: int
    n_corrupt: int
    n_kept: int
    drop_stages: dict[str, int]    # stage -> docs dropped there
    n_packs: int
    manifest_rows: int


def build_corpus(spark: SparkSession, jsonl_path: str, out_path: str,
                 quarantine_path: str | None = None,
                 quality_min: float = 0.5,
                 max_corrupt_frac: float = 0.05,
                 n_shards: int = 16) -> BuildReport:
    """Run the full build; raises if the drop's corrupt-line rate
    exceeds ``max_corrupt_frac`` (a bad vendor drop should fail loudly
    BEFORE burning a corpus-scale pass on it)."""
    raw = corpus.read_documents_jsonl(spark, jsonl_path)
    clean, quarantine = corpus.split_corrupt(raw)
    rep = corpus.ingest_report(raw).collect()[0]
    if quarantine_path is not None:
        quarantine.write.mode("overwrite").parquet(quarantine_path)
    if rep["n_lines"] and rep["n_corrupt"] / rep["n_lines"] > max_corrupt_frac:
        raise ValueError(
            f"corrupt-line rate {rep['n_corrupt']}/{rep['n_lines']} exceeds "
            f"{max_corrupt_frac:.0%} — refusing to build from this drop"
        )

    # profile snapshot (side output; approx mode — this is telemetry,
    # not an oracle check)
    profile.profile_table(
        clean, ["doc_id", "text", "lang", "source", "n_chars"], approx=True
    ).collect()

    audit = curation.drop_reasons(clean, quality_min=quality_min)
    drop_stages = {
        r["stage"]: r["n"]
        for r in audit.groupBy("stage").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    packed = curation.curation_funnel(clean, quality_min=quality_min)
    kept_docs = clean.join(packed.select("doc_id", "pack_id"), "doc_id")
    manifest = write_training_shards(kept_docs, out_path, n_shards=n_shards)
    m_rows = manifest.collect()
    n_packs = packed.select("pack_id").distinct().count()

    return BuildReport(
        n_ingested=rep["n_lines"],
        n_corrupt=rep["n_corrupt"],
        n_kept=drop_stages.get("kept", 0),
        drop_stages=drop_stages,
        n_packs=n_packs,
        manifest_rows=len(m_rows),
    )
