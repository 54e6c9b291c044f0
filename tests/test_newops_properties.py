"""Invariant checks for the round-4 operators — properties the oracle
comparison can't express (guarantees quantified over constructed
inputs, conservation laws over outputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntripmonitor_spark.operators import dedup, sampling, stats, timeseries
from ntripmonitor_spark.tables import table


def _cdc_boundaries(t: str, gram: int = 16, mod: int = 32) -> list[int]:
    """Pure-Python mirror of the operator's boundary rule (0-based)."""
    import hashlib

    return [
        p
        for p in range(len(t) - gram + 1)
        if int(hashlib.md5(t[p : p + gram].encode()).hexdigest()[:7], 16) % mod == 0
    ]


def test_sd01_detects_repeats_at_any_alignment(spark):
    """Content-defined chunking's whole point: boundaries depend on
    local content only, so a verbatim repeat yields the same interior
    chunks in every carrier REGARDLESS of its byte offset — the
    property fixed-stride sampling lacks. Place one repeat at 41
    different offsets across 82 docs and require every doc flagged."""
    repeat = ("the quick brown fox jumps over the lazy dog " * 6).lower()  # 264 chars
    # sanity: the repeat must carry ≥2 interior boundaries ≥8 apart
    # whose grams sit fully inside (relative pos ≤ len−16)
    bs = [p for p in _cdc_boundaries(repeat) if p <= len(repeat) - 16]
    assert len(bs) >= 2 and max(b2 - b1 for b1, b2 in zip(bs, bs[1:])) >= 8, bs
    rows = []
    for off in range(41):
        filler_a = (f"a{off:02d}" * 20)[: off]
        rows.append((2 * off, filler_a + repeat + f"tail-a-{off}-" + "p" * 40))
        filler_b = (f"b{off:02d}" * 20)[: (off * 7) % 29]
        rows.append((2 * off + 1, filler_b + repeat + f"tail-b-{off}-" + "q" * 40))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dup_hashes = {r.span_h for r in dedup.duplicate_spans(docs).collect()}
    assert dup_hashes, "no duplicated chunks found at all"
    # recompute each doc's chunk hashes in pure Python and require
    # every doc to own at least one flagged chunk
    import hashlib

    missed = []
    for doc_id, text in rows:
        t = text.lower()
        bounds = sorted({0, len(t)} | {p for p in _cdc_boundaries(t)})
        hashes = {
            hashlib.md5(t[s:e].encode()).hexdigest()
            for s, e in zip(bounds, bounds[1:])
            if e - s >= 8
        }
        if not (hashes & dup_hashes):
            missed.append(doc_id)
    assert not missed, f"missed docs: {missed}"


def test_mk01_probabilities_sum_to_one(spark, sf_dir):
    rows = timeseries.event_transitions(table(spark, sf_dir, "events")).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-6, (prev, total)


def test_hs01_fractions_and_counts_conserve(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    rows = stats.length_histogram(docs).collect()
    total = sum(r.n for r in rows)
    assert total == docs.count()
    by_lang: dict[str, float] = {}
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0.0) + r.frac
    assert all(abs(v - 1.0) < 1e-6 for v in by_lang.values()), by_lang


def test_sp04_sample_size_is_min_k_stratum(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    sizes = {r.source: r.c for r in docs.groupBy("source").agg(F.count("*").alias("c")).collect()}
    got = sampling.stratified_ksample(docs, k=10).groupBy("source").agg(
        F.count("*").alias("c"), F.max("rk").alias("max_rk")
    ).collect()
    assert {r.source for r in got} == set(sizes)
    for r in got:
        expect = min(10, sizes[r.source])
        assert r.c == expect and r.max_rk == expect, (r.source, r.c, expect)


def test_ig01_target_docs_score_higher_on_average(spark, sf_dir):
    """The importance weight must actually discriminate: English docs
    (the target slice) must average a higher logw than non-English."""
    docs = table(spark, sf_dir, "documents")
    w = sampling.dsir_logweights(docs, F.col("lang") == "en")
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.is_t: r.m
        for r in joined.groupBy((F.col("lang") == "en").alias("is_t"))
        .agg(F.avg("logw").alias("m"))
        .collect()
    }
    assert means[True] > means[False], means
