"""Degenerate-input robustness: every operator family must survive an
EMPTY corpus and a single-row corpus without raising (no div-by-zero,
no element_at on empty arrays, no collect()[0] on nothing) — the
failure mode of a 100 TB pipeline is one empty partition or one
filtered-to-nothing source, and that must not kill the job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ntripmonitor_spark.operators import (
    dedup,
    retrieval,
    sampling,
    simsearch,
    sketch,
    stats,
    text,
    timeseries,
)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def one_doc(spark):
    return spark.createDataFrame(
        [(1, "just one tiny document here", "en", "src0", 27)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


DOC_OPS = [
    ("exact_dedup", lambda d: dedup.exact_duplicates(d)),
    ("ngram_jaccard", lambda d: dedup.ngram_jaccard_pairs(d)),
    ("minhash_lsh", lambda d: dedup.minhash_lsh_pairs(d)),
    ("simhash", lambda d: dedup.simhash_pairs(d)),
    ("duplicate_spans", lambda d: dedup.duplicate_spans(d)),
    ("quality", lambda d: text.quality_features(d)),
    ("repetition", lambda d: text.repetition_metrics(d)),
    ("bigram_nll", lambda d: text.bigram_nll(d)),
    ("stratified_ksample", lambda d: sampling.stratified_ksample(d)),
    ("dsir", lambda d: sampling.dsir_logweights(d, F.col("lang") == "en")),
    ("quantiles", lambda d: stats.quantile_thresholds(d)),
    ("histogram", lambda d: stats.length_histogram(d)),
    ("sequence_pack", lambda d: sampling.sequence_pack(d)),
    ("bm25", lambda d: retrieval.bm25_topk(d, [(1, ["one", "tiny"])], k=5)),
    ("inverted_index", lambda d: retrieval.inverted_index(d)),
]


@pytest.mark.parametrize("name,op", DOC_OPS, ids=[n for n, _ in DOC_OPS])
def test_doc_ops_survive_empty_corpus(empty_docs, name, op):
    assert op(empty_docs).count() == 0


@pytest.mark.parametrize("name,op", DOC_OPS, ids=[n for n, _ in DOC_OPS])
def test_doc_ops_survive_single_doc(one_doc, name, op):
    op(one_doc).collect()  # must not raise; row counts vary by op


def test_zipf_on_empty_corpus_is_one_null_summary_row(empty_docs, one_doc):
    """Global aggregates answer with ONE row even over nothing — the
    correct SQL semantics; the fit columns are null, n_top = 0."""
    row = text.zipf_fit(empty_docs).collect()[0]
    assert row["n_top"] == 0 and row["slope"] is None
    text.zipf_fit(one_doc).collect()  # single doc: must not raise


def test_event_ops_survive_empty_stream(empty_events):
    assert timeseries.event_transitions(empty_events).count() == 0
    assert timeseries.zscore_anomalies(empty_events).count() == 0
    assert timeseries.seasonal_anomalies(empty_events).count() == 0
    assert timeseries.gap_fill(empty_events).count() == 0
    assert sketch.countmin_counters(empty_events, "user_id").count() == 0
    assert sketch.kmv_distinct(empty_events).count() == 0


def test_bpe_trainer_survives_tiny_and_empty(spark, empty_docs):
    assert text.bpe_train(empty_docs, n_merges=3).count() == 0
    one = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    rows = text.bpe_train(one, n_merges=5).collect()
    # only one merge is possible ("a"+"b"), then pairs run dry
    assert [(r["left"], r["right"]) for r in rows] == [("a", "b")]


def test_logreg_survives_single_class(spark):
    """All-one-label input: gradient descent must not NaN (sigmoid
    saturates but stays finite at 20 epochs, lr=1)."""
    import math

    feats = spark.createDataFrame(
        [(1, 0.5, 0.8), (1, 0.4, 0.7), (1, 0.6, 0.9)],
        "is_en int, stop_ratio double, alpha_ratio double",
    )
    w, n = stats.logistic_fit(feats, "is_en", ["stop_ratio", "alpha_ratio"])
    assert n == 3 and all(math.isfinite(x) for x in w)


def test_round4_doc_ops_survive_empty_and_single(empty_docs, one_doc):
    from ntripmonitor_spark.operators import multimodal

    for op in (
        text.gopher_rules,
        text.pmi_collocations,
        sampling.hash_split,
        lambda d: text.bpe_encode(d, n_merges=3),
        multimodal.audio_energy,
    ):
        assert op(empty_docs).count() == 0
        op(one_doc).collect()  # must not raise


def test_round4_event_ops_survive_empty_stream(empty_events):
    from ntripmonitor_spark.operators import joins

    assert joins.scd2_history(empty_events).count() == 0
    assert timeseries.mean_shift_changepoints(empty_events).count() == 0


def test_sq8_survives_single_vector(spark):
    # one vector: every dim has span 0 → all codes 0, mse 0 (no NaN/Inf)
    emb = spark.createDataFrame(
        [(1, [float(i) for i in range(64)], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    row = simsearch.sq8_quantize(emb).collect()[0]
    assert row["code_sum"] == 0 and row["micro_mse"] == 0.0


def test_scd2_single_user_single_event(spark):
    ev = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2026, 1, 1), 7, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    from ntripmonitor_spark.operators import joins

    rows = joins.scd2_history(ev).collect()
    assert len(rows) == 1 and rows[0]["is_current"] and rows[0]["valid_to"] is None


def test_round4c_doc_ops_survive_empty_and_single(empty_docs, one_doc):
    for op in (
        stats.ks_drift,
        stats.percentile_normalize,
        dedup.containment_pairs,
        lambda d: text.source_divergence(d, vocab_size=4),
    ):
        assert op(empty_docs).count() == 0
        op(one_doc).collect()  # must not raise


def test_ks_single_group_is_null_not_divide_by_zero(spark):
    """One lone source has no comparison sample: KS must come back
    NULL (undefined), not raise ANSI DIVIDE_BY_ZERO — the failure mode
    of a monitor pointed at a single-source corpus."""
    docs = spark.createDataFrame(
        [(1, "s", 10), (2, "s", 20)], "doc_id long, source string, n_chars long"
    )
    rows = stats.ks_drift(docs).collect()
    assert len(rows) == 1 and rows[0]["ks_stat"] is None and rows[0]["n_rows"] == 2


def test_round4c_event_ops_survive_empty_stream(empty_events):
    from ntripmonitor_spark.operators import joins

    assert joins.asof_join_nearest(
        empty_events, F.col("event_type") == "error"
    ).count() == 0
    assert joins.interval_overlap_join(
        empty_events, F.col("event_type") == "error", F.col("event_type") == "view"
    ).count() == 0


def test_er02_survives_no_matches(spark):
    """Records with wildly different names: zero edges → every record
    its own entity, all canonical."""
    c = spark.createDataFrame(
        [(1, "alpha"), (2, "zebra-corp"), (3, "qq")], "c_custkey long, c_name string"
    )
    out = dedup.entity_clusters(c, "c_custkey", "c_name").collect()
    assert sorted((r["entity_id"], r["n_records"]) for r in out) == [(1, 1), (2, 1), (3, 1)]


def test_round5_doc_ops_survive_empty_and_single(empty_docs, one_doc):
    from ntripmonitor_spark.operators import curation, multimodal
    from pyspark.sql import functions as F2

    ops = [
        lambda d: sampling.weighted_sample_topk(d, k=5),
        lambda d: sampling.pack_utilization(d),
        lambda d: text.stupid_backoff_nll(d),
        lambda d: dedup.bbit_minhash_pairs(d),
        lambda d: dedup.blocking_profile(d, F2.substring("text", 1, 3), id_col="doc_id"),
        lambda d: curation.drop_reasons(d),
        lambda d: stats.robust_outlier_screen(d),
        lambda d: multimodal.patchify(d),
        lambda d: retrieval.phrase_search(d, "just one tiny"),
    ]
    for op in ops:
        op(empty_docs).collect()   # must not raise
        op(one_doc).collect()      # must not raise


def test_round5_event_ops_survive_empty_and_single(spark, empty_events):
    from ntripmonitor_spark.operators import profile, skew
    from ntripmonitor_spark.streaming import sessions as ssn

    one = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1), 7, "click", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    for ev in (empty_events, one):
        skew.salted_distinct_count(ev, "event_type", "user_id").collect()
        skew.salted_join(
            ev, ev.groupBy("event_type").agg(F.avg("value").alias("m")),
            "event_type", "event_id",
        ).collect()
        profile.profile_table(ev, ["event_id", "user_id", "value"]).collect()
        profile.profile_table(ev, ["event_id", "value"], approx=True).collect()
        timeseries.ewma_daily(ev).collect()
        timeseries.ohlc_downsample(ev).collect()
        sketch.kmv_set_algebra(ev).collect()
        ssn.sessionize_native(ev).collect()


def test_dq02_nd_sane_all_null_column(spark):
    """dq02's nd_sane contract on the branch the corpus never hits: an
    all-NULL column must report nd_sane = TRUE via the estimate == 0
    leg (HLL of zero non-null values), never NULL or FALSE."""
    from pyspark.sql import functions as F2

    from ntripmonitor_spark.operators import profile

    ev = spark.createDataFrame(
        [(i, None) for i in range(50)], "event_id long, dead string"
    )
    p = profile.profile_table(ev, ["event_id", "dead"], approx=True)
    n_nonnull = F2.col("n_rows") - F2.col("n_null")
    nd_sane = F2.when(n_nonnull == 0, F2.col("n_distinct") == 0).otherwise(
        (F2.col("n_distinct") >= 1)
        & (F2.col("n_distinct") <= F2.ceil(n_nonnull * F2.lit(1.1)))
    )
    rows = {r["column"]: r for r in p.select("column", "n_rows", "n_null",
                                             nd_sane.alias("nd_sane")).collect()}
    assert rows["dead"]["n_null"] == 50 and rows["dead"]["nd_sane"] is True
    assert rows["event_id"]["nd_sane"] is True


def test_round7_doc_ops_survive_empty_and_single(empty_docs, one_doc):
    """sp08/dd12/mx01/tx17 on an empty and a one-doc corpus: no
    div-by-zero, no collect on nothing; singleton doc is its own
    cluster, keeps itself, has no source pair."""
    for docs, n in ((empty_docs, 0), (one_doc, 1)):
        assert sampling.cluster_split(docs).count() == n
        out = dedup.survivor_by_quality(docs).collect()
        assert len(out) == n
        if n == 1:
            assert out[0].keep and out[0].n_members == 1
        assert dedup.source_overlap(docs).count() == 0  # no pair exists
        cov = text.vocab_coverage(docs).collect()
        assert len(cov) == n
        if n == 1:
            assert cov[0].n_oov == 0  # tiny vocab covers everything


def test_mm14_single_frame_gif_yields_no_transitions(spark):
    """A one-frame GIF has no consecutive pair: zero delta rows, not a
    crash or a null row."""
    import numpy as np

    from ntripmonitor_spark.functions import gif
    from ntripmonitor_spark.operators.multimodal import gif_scene_deltas

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    payload = gif.encode_gif(np.zeros((1, 3, 4), dtype=np.uint8), pal)
    docs = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    assert gif_scene_deltas(docs).count() == 0


def test_in04_unmatched_terms_yield_empty_not_error(spark):
    """Boolean probe with a never-occurring must-term returns an empty
    relation (the join legs are empty posting scans, not errors)."""
    from ntripmonitor_spark.operators.retrieval import (
        boolean_search_postings,
        build_posting_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    postings = build_posting_index(docs)
    assert boolean_search_postings(postings, must=["nosuchterm"]).count() == 0
    assert boolean_search_postings(
        postings, must=["alpha"], must_not=["beta"]
    ).count() == 0
    got = boolean_search_postings(postings, must=["alpha"], must_not=["zeta"]).collect()
    assert len(got) == 1 and got[0].tf_0 == 1


def test_round7_wave6plus_doc_ops_survive_empty_and_single(empty_docs, one_doc):
    """Wave 6-11 document operators on an empty and a one-doc corpus:
    no div-by-zero, no element_at on nothing, no collect()[0] crash."""
    for docs, n in ((empty_docs, 0), (one_doc, 1)):
        div = text.lexical_diversity(docs).collect()
        assert len(div) == (1 if n else 0)
        if n:
            assert div[0].avg_ttr == 1.0  # all-unique tiny doc
        assert retrieval.proximity_rank(docs, "one", "tiny").count() == (1 if n else 0)
        assert dedup.cdc_chunk_stats(docs).count() == (1 if n else 0)
        fim = sampling.fim_split(docs).collect()
        assert len(fim) == n  # 5-token doc passes the >=3 gate
        fert = text.tokenizer_fertility(docs).collect()
        assert len(fert) == n
        infl = dedup.dup_token_inflation(docs).collect()
        assert len(infl) == n
        if n:
            assert infl[0].inflation == 0.0  # nothing to dedup


def test_round7_wave6plus_event_ops_survive_empty_and_single(spark, empty_events):
    """Wave 6-11 event operators on an empty stream and a single
    event: CUSUM/ACF/Theil-Sen need >=2 buckets for a variance — they
    must return empty or null stats, never raise."""
    import datetime

    one = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1, "a", 5.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    for ev, n in ((empty_events, 0), (one, 1)):
        assert timeseries.cusum_changepoint(ev).count() <= n
        acf = timeseries.autocorrelation(ev).collect()
        for r in acf:
            assert r.n_pairs == 0 and r.acf is None
        ts_rows = timeseries.theil_sen_trend(ev).collect()
        assert len(ts_rows) == 0  # no pair, no slope row
        wm = stats.winsorized_mean(ev).collect()
        assert len(wm) == n
        if n:
            assert wm[0].mean_raw == wm[0].mean_winsor == 5.0
        assert stats.benford_deviation(ev).count() == n
        assert stats.mean_excess(ev).count() == 0  # nothing above p95
        dau = timeseries.rolling_active_users(ev).collect()
        assert len(dau) == n
        if n:
            assert dau[0].dau == dau[0].wau == 1


def test_gr06_kcore_empty_graph_survives(spark):
    """An edgeless graph peels to nothing — empty result, no error."""
    edges = spark.createDataFrame([], "u long, v long")
    assert dedup.kcore_peel(edges, k=3, rounds=3).count() == 0


def test_round7_wave12plus_ops_survive_empty_and_single(spark, empty_events, empty_docs, one_doc):
    """Waves 12-14: runs test, sequence scoring, downsampler, gate
    ablation on empty/singleton inputs — no /0, no rank on nothing."""
    import datetime

    one_ev = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1, "a", 5.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    for ev, n in ((empty_events, 0), (one_ev, 1)):
        if n == 0:
            # single bucket: sign filter drops the (x == med) row → no runs row
            assert timeseries.runs_test(ev).count() == 0
        rt = timeseries.runs_test(ev).collect()
        for r in rt:
            assert r.z is None
        assert timeseries.sequence_nll(ev, min_steps=1).count() == 0  # no step exists
        ds = timeseries.downsample_extremes(ev).collect()
        assert len(ds) == n
        if n:
            assert ds[0].ext_dev == 0.0 and ds[0].n_events == 1
    for docs, n in ((empty_docs, 0), (one_doc, 1)):
        from ntripmonitor_spark.plans.pipeline import cu07_gate_ablation  # noqa: F401
        # gate flags are pure column math; evaluate via the operator pieces
        from ntripmonitor_spark.operators.text import quality_score_col
        flags = docs.select(quality_score_col(F.col("text")).alias("q"))
        assert flags.count() == n
