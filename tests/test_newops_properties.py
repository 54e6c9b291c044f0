"""Invariant checks for the round-4 operators — properties the oracle
comparison can't express (guarantees quantified over constructed
inputs, conservation laws over outputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntripmonitor_spark.operators import dedup, sampling, stats, timeseries
from ntripmonitor_spark.tables import table


def _cdc_chunks(text: str, avg_words: int = 8, min_words: int = 3) -> set[str]:
    """Pure-Python mirror of the operator: word-boundary CDC chunk
    hashes of one document."""
    import hashlib

    ws = [w for w in text.lower().split(" ") if w]
    bounds = sorted(
        {0, len(ws)}
        | {
            i
            for i in range(len(ws))
            if int(hashlib.md5(ws[i].encode()).hexdigest()[:7], 16) % avg_words == 0
        }
    )
    return {
        hashlib.md5(" ".join(ws[s:e]).encode()).hexdigest()
        for s, e in zip(bounds, bounds[1:])
        if e - s >= min_words
    }


def test_sd01_detects_repeats_at_any_alignment(spark):
    """Content-defined chunking's whole point: boundaries depend on
    local content only, so a verbatim repeat yields the same interior
    chunks in every carrier REGARDLESS of its word offset — the
    property fixed-stride sampling lacks (the first-cut stride design
    failed exactly this test). Place one repeat at 41 different word
    offsets across 82 docs and require every doc flagged."""
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
             "kilo lima mike november oscar papa quebec romeo sierra tango "
             "uniform victor whiskey xray yankee zulu one two three four").split()
    repeat = " ".join(words * 2)  # 60 words
    # sanity: the repeat's interior must carry ≥2 boundary words ≥3 apart
    import hashlib

    rws = repeat.split(" ")
    bs = [
        i for i in range(len(rws))
        if int(hashlib.md5(rws[i].encode()).hexdigest()[:7], 16) % 8 == 0
    ]
    assert len(bs) >= 2 and max(b - a for a, b in zip(bs, bs[1:])) >= 3, bs
    rows = []
    for off in range(41):
        fa = " ".join(f"fa{off}w{j}" for j in range(off))
        fb = " ".join(f"fb{off}w{j}" for j in range((off * 7) % 29))
        rows.append((2 * off, (fa + " " + repeat + f" taila{off} " + "pp " * 10).strip()))
        rows.append((2 * off + 1, (fb + " " + repeat + f" tailb{off} " + "qq " * 10).strip()))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dup_hashes = {r.span_h for r in dedup.duplicate_spans(docs).collect()}
    assert dup_hashes, "no duplicated chunks found at all"
    missed = [
        doc_id for doc_id, text in rows if not (_cdc_chunks(text) & dup_hashes)
    ]
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
