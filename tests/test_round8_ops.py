"""Round-8 wave operators: soft dedup weights (dd16), systematic
sampling (sp12), readability (tx19), sourcetable upsert snapshot
(st02), LSH candidate confusion (dd17), package ledger (rt11).
Planted-input semantics here; DuckDB value parity runs in
tests/test_parity.py like every registered query."""

from __future__ import annotations

import math
from decimal import Decimal

import pytest
from pyspark.sql import functions as F  # noqa: F401

from ntripmonitor_spark.operators import sampling, text
from ntripmonitor_spark.operators.dedup import soft_dedup_weights
from ntripmonitor_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from ntripmonitor_spark.session import get_spark

    return get_spark()


# ---------------------------------------------------------------------------
# dd16 — soft dedup weights
# ---------------------------------------------------------------------------


def test_dd16_triplicate_weights_to_one_doc(spark):
    """3 copies of one text weigh 1/3 each: eff_docs sums the exact
    quantized millionths (3 * 333333 ppm = 0.999999), excess ~ 2/3."""
    docs = spark.createDataFrame(
        [(1, "same text", "a"), (2, "same text", "a"), (3, "same text", "a"),
         (4, "unique", "b")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in soft_dedup_weights(docs).collect()}
    assert out["a"]["n_docs"] == 3
    assert out["a"]["eff_docs_ppm"] == 999999
    assert abs(out["a"]["excess_share_ppm"] / 1e6 - 2 / 3) < 1e-5
    assert out["b"]["eff_docs_ppm"] == 1000000
    assert out["b"]["excess_share_ppm"] == 0


def test_dd16_all_unique_is_identity(spark):
    docs = table(spark, SF, "documents")
    rows = soft_dedup_weights(docs).collect()
    for r in rows:
        # eff_docs <= n_docs always; equals when no dup cluster spans
        assert r["eff_docs_ppm"] <= r["n_docs"] * 10**6
        assert 0 <= r["excess_share_ppm"] <= 10**6


# ---------------------------------------------------------------------------
# sp12 — systematic sampling
# ---------------------------------------------------------------------------


def test_sp12_exact_ceil_counts_and_mean_sanity(spark):
    docs = table(spark, SF, "documents")
    rows = sampling.systematic_sample(docs, k=20).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] == math.ceil(r["n_frame"] / 20)
        if r["n_frame"] >= 100:
            # self-weighting: kept mean tracks frame mean loosely
            assert r["mean_chars_kept_e3"] > 0
            assert r["mean_chars_frame_e3"] > 0


def test_sp12_deterministic_across_partitionings(spark):
    docs = table(spark, SF, "documents")
    a = sorted(map(tuple, sampling.systematic_sample(docs).collect()))
    b = sorted(map(tuple, sampling.systematic_sample(docs.repartition(7)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# tx19 — readability
# ---------------------------------------------------------------------------


def test_tx19_hand_computed_flesch(spark):
    """'the cat sat.' → 3 words, 1 sentence, 3 vowel groups:
    flesch = 206.835 - 1.015*3 - 84.6*1 = 119.190."""
    docs = spark.createDataFrame(
        [(1, "the cat sat.", "a")], "doc_id long, text string, source string"
    )
    r = text.readability(docs).collect()[0]
    assert r["n_docs"] == 1 and r["n_scored"] == 1
    assert r["mean_flesch_e3"] == 119190
    assert r["n_easy"] == 1


def test_tx19_empty_doc_unscored(spark):
    docs = spark.createDataFrame(
        [(1, "", "a"), (2, "the cat sat.", "a")],
        "doc_id long, text string, source string",
    )
    r = text.readability(docs).collect()[0]
    assert r["n_docs"] == 2 and r["n_scored"] == 1
    assert r["mean_flesch_e3"] == 119190


# ---------------------------------------------------------------------------
# st02 — upsert snapshot
# ---------------------------------------------------------------------------


def test_st02_update_wins_and_flags(spark):
    from ntripmonitor_spark.plans.sourcetable_plans import (
        st01_sourcetable,
        st02_upsert_snapshot,
    )

    snap = {r["mountpoint"]: r for r in st02_upsert_snapshot(spark, SF).collect()}
    base = {r["mountpoint"] for r in st01_sourcetable(spark, SF).collect()}
    # upsert never invents keys the directory doesn't have
    assert set(snap) == base
    for mp, r in snap.items():
        if r["was_updated"]:
            assert r["last_epoch"] == 1
            assert r["identifier"].startswith("UPD-")
        else:
            assert r["last_epoch"] == 0
            assert not r["identifier"].startswith("UPD-")
    # the synthesized epoch-1 batch is non-empty at this SF
    assert any(r["was_updated"] for r in snap.values())
    assert any(not r["was_updated"] for r in snap.values())


# ---------------------------------------------------------------------------
# in07 — tf-idf cosine
# ---------------------------------------------------------------------------


def test_in07_identical_vector_scores_one(spark):
    """A doc whose tf-idf vector IS the query vector scores cosine
    exactly 1.000000; a doc sharing only one term scores below it."""
    from ntripmonitor_spark.operators.retrieval import tfidf_cosine_topk

    docs = spark.createDataFrame(
        [(1, "hash join"), (2, "hash hash scan")], "doc_id long, text string"
    )
    rows = tfidf_cosine_topk(docs, [(1, ["hash", "join"])], k=10).collect()
    by_rank = {r["rank"]: r for r in rows}
    assert by_rank[1]["doc_id"] == 1
    assert by_rank[1]["score_ppm"] == 1000000
    assert by_rank[2]["doc_id"] == 2
    assert by_rank[2]["score_ppm"] < 1000000


def test_in07_rank_contract(spark):
    from ntripmonitor_spark.plans.retrieval_plans import in07_tfidf_cosine

    rows = in07_tfidf_cosine(spark, SF).collect()
    seen = {}
    for r in rows:
        seen.setdefault(r["query_id"], []).append((r["rank"], r["score_ppm"], r["doc_id"]))
    for qid, rs in seen.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        # scores non-increasing down the ranking
        assert all(rs[i][1] >= rs[i + 1][1] for i in range(len(rs) - 1))
        assert all(0 <= x[1] <= 1000000 for x in rs)


# ---------------------------------------------------------------------------
# sk02 — KMV pairwise Jaccard
# ---------------------------------------------------------------------------


def test_sk02_disjoint_and_identical_sets(spark):
    """Two identical member sets → Jaccard 1.0 exact AND by sketch;
    disjoint sets → 0.0 on both estimators."""
    from ntripmonitor_spark.operators.sketch import kmv_jaccard
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(1, 41):
        for t in ("a", "b"):  # identical membership
            rows.append((eid, base, u, t, 1.0, "{}")); eid += 1
    for u in range(100, 140):
        rows.append((eid, base, u, "c", 1.0, "{}")); eid += 1  # disjoint
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {(r["group_a"], r["group_b"]): r for r in kmv_jaccard(ev).collect()}
    ab = out[("a", "b")]
    assert ab["exact_jaccard_ppm"] == 1000000
    assert ab["kmv_jaccard_ppm"] == 1000000
    assert ab["n_union"] == 40 and ab["n_inter"] == 40
    for pair in (("a", "c"), ("b", "c")):
        assert out[pair]["exact_jaccard_ppm"] == 0
        assert out[pair]["kmv_jaccard_ppm"] == 0
        assert out[pair]["n_union"] == 80


def test_sk02_small_union_estimate_exact(spark):
    """Below k=64 members, the union estimate falls back to the exact
    merged count (the standard KMV rule)."""
    from ntripmonitor_spark.operators.sketch import kmv_jaccard
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base, u, t, 1.0, "{}")
            for i, (u, t) in enumerate([(u, "a") for u in range(10)]
                                       + [(u, "b") for u in range(5, 15)])]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = kmv_jaccard(ev).collect()[0]
    assert r["n_inter"] == 5 and r["n_union"] == 15
    assert r["kmv_union_e1"] == 150
    assert r["exact_jaccard_ppm"] == r["kmv_jaccard_ppm"] == 333333


# ---------------------------------------------------------------------------
# mm15 — silence runs
# ---------------------------------------------------------------------------


def test_mm15_planted_runs(spark):
    """Payload ' ab  c' (space=32 silent, letters loud): runs at
    [0,1) and [3,5) → 2 runs, 3 silent, longest len 2 starting at 3."""
    from ntripmonitor_spark.operators.multimodal import silence_runs

    docs = spark.createDataFrame(
        [(1, " ab  c"), (2, "zzz")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in silence_runs(docs).collect()}
    r1 = out[1]
    assert (r1["n_samples"], r1["n_silent"], r1["n_runs"]) == (6, 3, 2)
    assert (r1["max_run_len"], r1["max_run_start"]) == (2, 3)
    assert r1["silence_ratio_ppm"] == 500000
    r2 = out[2]
    assert (r2["n_silent"], r2["n_runs"], r2["max_run_len"]) == (0, 0, 0)
    assert r2["max_run_start"] is None
    assert r2["silence_ratio_ppm"] == 0


# ---------------------------------------------------------------------------
# dp03 — pairwise JS divergence
# ---------------------------------------------------------------------------


def test_dp03_js_properties(spark):
    """Identical token distributions → JS 0; disjoint vocabularies →
    clearly positive (add-half smoothing over V+1 symbols flattens
    tiny 3-token distributions, so the ceiling is far below 1 bit)."""
    from ntripmonitor_spark.operators.text import pairwise_js

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "a"), (2, "alpha beta gamma", "b"),
         (3, "delta epsilon zeta", "c")],
        "doc_id long, text string, source string",
    )
    out = {(r["source_a"], r["source_b"]): r["js_bits_e9"] / 1e9
           for r in pairwise_js(docs, vocab_size=24).collect()}
    assert out[("a", "b")] == 0.0
    assert out[("a", "c")] > 0.1
    assert out[("a", "c")] == out[("b", "c")]
    assert all(0.0 <= v <= 1.0 for v in out.values())


# ---------------------------------------------------------------------------
# in08 — fuzzy vocab probe
# ---------------------------------------------------------------------------


def test_in08_typos_resolve_and_hopeless_probe_empty(spark):
    from ntripmonitor_spark.operators.retrieval import fuzzy_probe

    docs = spark.createDataFrame(
        [(1, "hash join hash"), (2, "hash merge")], "doc_id long, text string"
    )
    rows = fuzzy_probe(docs, probes=["hsah", "jion", "zzzz"]).collect()
    out = {(r["probe"], r["rank"]): r for r in rows}
    assert out[("hsah", 1)]["suggestion"] == "hash"
    assert out[("hsah", 1)]["distance"] == 2
    assert out[("hsah", 1)]["df"] == 2  # docs containing 'hash'
    assert out[("jion", 1)]["suggestion"] == "join"
    assert not [r for r in rows if r["probe"] == "zzzz"]


def test_in08_exact_match_ranks_first(spark):
    from ntripmonitor_spark.operators.retrieval import fuzzy_probe

    docs = spark.createDataFrame(
        [(1, "scan scans scant")], "doc_id long, text string"
    )
    rows = sorted(
        fuzzy_probe(docs, probes=["scan"]).collect(), key=lambda r: r["rank"]
    )
    assert rows[0]["suggestion"] == "scan" and rows[0]["distance"] == 0
    assert {r["suggestion"] for r in rows} == {"scan", "scans", "scant"}


# ---------------------------------------------------------------------------
# scd03 — SCD2 integrity audit
# ---------------------------------------------------------------------------


def test_scd03_audit_flags_planted_violations(spark):
    """Hand-built history: key 1 clean; key 2 has an overlap; key 3 a
    gap; key 4 two open rows; key 5 no open row."""
    import datetime

    from ntripmonitor_spark.operators.joins import scd2_audit

    d = lambda day: datetime.datetime(2024, 1, day)
    rows = [
        (1, "a", d(1), d(5)), (1, "b", d(5), None),          # clean chain
        (2, "a", d(1), d(6)), (2, "b", d(4), None),          # overlap
        (3, "a", d(1), d(3)), (3, "b", d(5), None),          # gap
        (4, "a", d(1), None), (4, "b", d(2), None),          # two open
        (5, "a", d(1), d(4)),                                # no open row
    ]
    hist = spark.createDataFrame(
        rows,
        "user_id long, attr_value string, valid_from timestamp,"
        " valid_to timestamp",
    )
    r = scd2_audit(hist).collect()[0]
    assert r["n_keys"] == 5 and r["n_rows"] == 9
    assert r["keys_with_overlap"] == 1
    assert r["keys_with_gap"] == 1 and r["total_gaps"] == 1
    assert r["keys_no_open_row"] == 1
    assert r["keys_multi_open"] == 1
    assert r["open_rows_not_last"] == 1  # key 4's first open row


# ---------------------------------------------------------------------------
# an11 — seasonal strength
# ---------------------------------------------------------------------------


def test_an11_pure_weekly_cycle_scores_high(spark):
    """A clean 7-day cycle with flat level: seasonal strength near 1,
    trend strength near 0; white-noise-free so residuals vanish."""
    import datetime

    from ntripmonitor_spark.operators.timeseries import seasonal_strength

    rows = []
    eid = 0
    for day in range(28):
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day)
        val = 100.0 + [0, 10, 20, 30, 20, 10, 0][day % 7]
        for _ in range(3):  # several events per day, same value
            rows.append((eid, ts, 1, "cyc", val, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = seasonal_strength(ev).collect()[0]
    assert r["f_seasonal_ppm"] > 950000
    # flat level: trend+resid is constant -> zero variance -> undefined
    assert r["f_trend_ppm"] is None
    assert r["n_days"] == 28 - 6  # edge days lack the centered window


def test_sk02_sketch_is_mergeable(spark):
    """The KMV property the pairwise algebra relies on: the k smallest
    hashes of A ∪ B equal the k smallest of (sketch(A) ∪ sketch(B)) —
    so per-batch partial sketches merge into exactly the batch sketch,
    and sk02's pair estimates are valid over streamed/rolled-up state."""
    from pyspark.sql import Window
    from ntripmonitor_spark.operators.sampling import KNUTH
    from ntripmonitor_spark.tables import table as _table

    ev = _table(spark, SF, "events")
    d = (
        ev.select("event_type", "user_id").distinct()
        .withColumn("h", F.pmod(F.col("user_id").cast("long") * F.lit(KNUTH),
                                F.lit(1 << 32)))
    )
    k = 64
    w = Window.partitionBy("event_type").orderBy(F.col("h").asc())

    def sketch(df):
        return (
            df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("event_type", "h")
        )

    batch = {tuple(r) for r in sketch(d).collect()}
    # split into 3 deterministic sub-batches, sketch each, merge, re-cut
    parts = [d.filter(F.pmod(F.col("user_id"), F.lit(3)) == i) for i in range(3)]
    merged_members = sketch(parts[0]).unionByName(sketch(parts[1])).unionByName(
        sketch(parts[2])
    )
    merged = {tuple(r) for r in sketch(merged_members).collect()}
    assert merged == batch


# ---------------------------------------------------------------------------
# ts06 — gap-fill interpolate
# ---------------------------------------------------------------------------


def test_ts06_linear_fill_midpoint_and_edges(spark):
    """Observations at hours 0 (v=10) and 2 (v=30): hour 1 is filled
    at exactly 20; the spine covers only the observed span."""
    import datetime

    from ntripmonitor_spark.operators.timeseries import gapfill_interpolate

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a", 10.0, "{}"),
        (2, t0 + datetime.timedelta(hours=2), 1, "a", 30.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = sorted(gapfill_interpolate(ev).collect(), key=lambda r: r["bucket_idx"])
    assert len(out) == 3
    assert [r["observed"] for r in out] == [1, 0, 1]
    assert [r["value_ppm"] for r in out] == [10000000, 20000000, 30000000]


# ---------------------------------------------------------------------------
# rc03 — MRR eval
# ---------------------------------------------------------------------------


def test_rc03_rr_legs(spark):
    """Planted corpus: query hitting a fully-relevant doc at rank 1
    (rr 1.0), and a query whose conjunction no doc satisfies (rr 0)."""
    from ntripmonitor_spark.operators.retrieval import mrr_eval

    docs = spark.createDataFrame(
        [(1, "hash join"), (2, "hash scan"), (3, "scan scan")],
        "doc_id long, text string",
    )
    out = {r["query_id"]: r for r in mrr_eval(
        docs, [(1, ["hash", "join"]), (2, ["join", "scan"])], k=10
    ).collect()}
    assert out[1]["first_rank"] == 1 and out[1]["rr_ppm"] == 1000000
    assert out[2]["first_rank"] is None and out[2]["rr_ppm"] == 0


# ---------------------------------------------------------------------------
# dq07 — FD audit
# ---------------------------------------------------------------------------


def test_dq07_true_key_holds_and_violations_counted(spark):
    from ntripmonitor_spark.plans.pipeline import dq07_fd_audit

    out = {r["fd"]: r for r in dq07_fd_audit(spark, SF).collect()}
    key = out["orders.o_orderkey->o_custkey"]
    assert key["holds"] == 1 and key["n_violating"] == 0 and key["max_rhs"] == 1
    # the deliberately false FDs report violations
    assert any(r["holds"] == 0 and r["n_violating"] > 0 for r in out.values())
    assert len(out) == 5


# ---------------------------------------------------------------------------
# tx20 — Zipf slope
# ---------------------------------------------------------------------------


def test_tx20_planted_zipf_slope_near_minus_one(spark):
    """A corpus built with freq(rank r) = round(1000/r) over 30 tokens
    fits slope ~= -1; a uniform corpus fits ~= 0."""
    words_z, words_u = [], []
    for r in range(1, 31):
        words_z += [f"w{r}"] * round(1000 / r)
        words_u += [f"w{r}"] * 40
    docs = spark.createDataFrame(
        [(1, " ".join(words_z), "zipf"), (2, " ".join(words_u), "flat")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in text.zipf_slope(docs, top_k=30).collect()}
    assert abs(out["zipf"]["zipf_slope_ppm"] / 1e6 + 1.0) < 0.05
    assert abs(out["flat"]["zipf_slope_ppm"] / 1e6) < 0.01
    assert out["zipf"]["n_top"] == out["flat"]["n_top"] == 30


# ---------------------------------------------------------------------------
# dd17 — LSH candidate recall/precision vs the exact join
# ---------------------------------------------------------------------------


def test_dd17_confusion_invariants(spark):
    """Hits can never exceed either leg, and the ratios are the exact
    decimal quotients of the reported counts."""
    from ntripmonitor_spark.operators.dedup import lsh_recall

    docs = table(spark, SF, "documents")
    r = lsh_recall(docs).collect()[0]
    assert r["n_hits"] <= r["n_exact_pairs"]
    assert r["n_hits"] <= r["n_lsh_candidates"]
    if r["n_exact_pairs"]:
        assert r["recall_ppm"] == math.floor(r["n_hits"] / r["n_exact_pairs"] * 10**6 + 0.5)
    if r["n_lsh_candidates"]:
        assert r["precision_ppm"] == math.floor(r["n_hits"] / r["n_lsh_candidates"] * 10**6 + 0.5)


def test_dd17_planted_perfect_recall(spark):
    """Exact copies collide in every band, so a corpus whose only true
    pairs are verbatim copies reports recall 1 and counts the copies."""
    from ntripmonitor_spark.operators.dedup import lsh_recall

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "one two three four five six seven eight"),
         (4, "nine ten eleven twelve thirteen fourteen fifteen sixteen")],
        "doc_id long, text string",
    )
    r = lsh_recall(docs).collect()[0]
    assert r["n_exact_pairs"] == 1 and r["n_hits"] == 1
    assert r["recall_ppm"] == 1000000


def test_dd17_empty_universe_reports_zeros(spark):
    """Docs too short to shingle -> zero pairs on both legs, zero row
    counts instead of NULLs (degenerate-input hardening)."""
    from ntripmonitor_spark.operators.dedup import lsh_recall

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    r = lsh_recall(docs).collect()[0]
    assert (r["n_exact_pairs"], r["n_lsh_candidates"], r["n_hits"]) == (0, 0, 0)
    assert r["recall_ppm"] is None and r["precision_ppm"] is None


# ---------------------------------------------------------------------------
# rt11 — package ledger (K1 exactly-once accounting)
# ---------------------------------------------------------------------------


def test_rt11_replay_is_idempotent(spark):
    """Every package is delivered twice and inserted once; the uid hash
    is collision-free on the fixture corpus (n_inserted == distinct
    natural keys == half of delivered)."""
    from ntripmonitor_spark.plans.rtcm import rt11_package_ledger

    rows = rt11_package_ledger(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_delivered"] == 2 * r["n_inserted"]
        assert r["n_replays_dropped"] == r["n_inserted"]


def test_rt11_uid_is_replay_stable(spark):
    """with_package_uid is a pure function of the natural key: two
    independent runs over the same frames assign identical ids."""
    from ntripmonitor_spark.plans.rtcm import _frame_archive_path
    from ntripmonitor_spark.operators import rtcm as rtcm_ops
    from ntripmonitor_spark.sinks import with_package_uid

    frames = spark.read.parquet(_frame_archive_path(spark, SF))
    a = with_package_uid(rtcm_ops.packages(rtcm_ops.decode_frames(frames)))
    b = with_package_uid(rtcm_ops.packages(rtcm_ops.decode_frames(frames)))
    ids_a = sorted(r["package_uid"] for r in a.select("package_uid").collect())
    ids_b = sorted(r["package_uid"] for r in b.select("package_uid").collect())
    assert ids_a == ids_b


# ---------------------------------------------------------------------------
# qa05 — histogram quantiles (mergeable fixed-grid state)
# ---------------------------------------------------------------------------


def test_qa05_estimate_within_one_bin_of_target_rank(spark):
    """The estimate lands inside the bin holding the target-rank order
    statistic: |est - v_(ceil(q*n))| <= (vmax - vmin)/128 for every
    group and quantile. (The exact INTERPOLATED quantile can stray
    further in a sparse tail — it walks toward the next order
    statistic, which may sit bins away — so the bound is stated
    against the order statistic, not the interpolation.)"""
    import math as _math

    from ntripmonitor_spark.operators.stats import histogram_quantiles
    from ntripmonitor_spark.tables import table

    ev = table(spark, SF, "events")
    lo, hi = ev.selectExpr("min(value)", "max(value)").first()
    w = (hi - lo) / 128.0
    vals = {}
    for row in ev.select("event_type", "value").collect():
        vals.setdefault(row["event_type"], []).append(row["value"])
    for r in histogram_quantiles(ev).collect():
        xs = sorted(vals[r["event_type"]])
        for p in (50, 90, 99):
            target = _math.ceil(p / 100 * len(xs))
            stat = xs[target - 1]
            err = abs(r[f"est_p{p}_ppm"] / 1e6 - stat)
            assert err <= w + 1e-9, (r["event_type"], p, err, w)


def test_qa05_constant_column_degenerates_cleanly(spark):
    """All-equal values -> vmax == vmin: one bin, est == exact == the
    constant, no div-by-zero."""
    from ntripmonitor_spark.operators.stats import histogram_quantiles

    ev = spark.createDataFrame(
        [(i, "a", 7.0) for i in range(10)] + [(i, "b", 7.0) for i in range(5)],
        "event_id long, event_type string, value double",
    )
    for r in histogram_quantiles(ev).collect():
        for p in (50, 90, 99):
            assert r[f"est_p{p}_ppm"] == 7000000
            assert r[f"exact_p{p}_ppm"] == 7000000


def test_qa05_exact_leg_interpolates(spark):
    """Four known values pin the rank-interpolation arithmetic:
    p50 of [0, 10, 20, 30] = 15, p90 = 27."""
    from decimal import Decimal

    from ntripmonitor_spark.operators.stats import histogram_quantiles

    ev = spark.createDataFrame(
        [(i, "a", float(v)) for i, v in enumerate([0, 10, 20, 30])],
        "event_id long, event_type string, value double",
    )
    r = histogram_quantiles(ev).collect()[0]
    assert r["exact_p50_ppm"] == 15000000
    assert r["exact_p90_ppm"] == 27000000


def test_qa05_null_values_excluded(spark):
    """NULL metric rows must not bin (F.least(NULL, 127) would have
    silently counted them in the TOP bin) and must not shift ranks."""
    rows = [(i, "a", float(i)) for i in range(1, 101)]
    with_nulls = rows + [(200 + i, "a", None) for i in range(50)]
    schema = "event_id long, event_type string, value double"
    from ntripmonitor_spark.operators.stats import histogram_quantiles

    clean = histogram_quantiles(spark.createDataFrame(rows, schema)).collect()[0]
    dirty = histogram_quantiles(spark.createDataFrame(with_nulls, schema)).collect()[0]
    assert clean["n"] == dirty["n"] == 100
    for p in (50, 90, 99):
        assert clean[f"est_p{p}_ppm"] == dirty[f"est_p{p}_ppm"]
        assert clean[f"exact_p{p}_ppm"] == dirty[f"exact_p{p}_ppm"]


# ---------------------------------------------------------------------------
# an12 — weekly-periodicity power
# ---------------------------------------------------------------------------


def test_an12_planted_weekly_cycle_scores_high_flat_scores_zero(spark):
    """A series that IS cos(2*pi*wd/7) reports amplitude ~1 (the DFT
    recovers its own basis function); a constant series reports
    amplitude ~0 and NULL-free mean."""
    import datetime
    import math as m

    from ntripmonitor_spark.operators.timeseries import period_power

    base = datetime.datetime(2024, 1, 1)  # a Monday (weekday 0)
    rows = []
    eid = 0
    for d in range(28):  # 4 full weeks
        ts = base + datetime.timedelta(days=d)
        wd = ts.weekday()
        rows.append((eid, ts, 1, "cyclic", 100.0 + m.cos(2 * m.pi * wd / 7), "{}")); eid += 1
        rows.append((eid, ts, 1, "flat", 42.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r["event_type"]: r for r in period_power(ev).collect()}
    assert abs(out["cyclic"]["weekly_amplitude_ppm"] / 1e6 - 1.0) < 1e-3
    assert abs(out["cyclic"]["daily_mean_ppm"] / 1e6 - 100.0) < 1e-3
    assert out["flat"]["weekly_amplitude_ppm"] < 1000
    assert out["flat"]["daily_mean_ppm"] == 42000000


def test_an12_zero_mean_guard(spark):
    """An all-zero series reports NULL relative amplitude, not a /0."""
    import datetime

    from ntripmonitor_spark.operators.timeseries import period_power

    base = datetime.datetime(2024, 1, 1)
    rows = [(d, base + datetime.timedelta(days=d), 1, "z", 0.0, "{}")
            for d in range(14)]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = period_power(ev).collect()[0]
    assert r["weekly_amplitude_ppm"] == 0
    assert r["relative_amplitude_ppm"] is None
