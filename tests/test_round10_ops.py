"""Round-10 additions: the probe matrix (plans/probes.py), the exact
integer-rational emission, and the two new operators (sp13 weighted
reservoir, mx03 epoch schedule). Every registered query is also
oracle-parity-checked by tests/test_parity.py."""

from __future__ import annotations

from fractions import Fraction
import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# mx03 — largest-remainder apportionment invariants
# ---------------------------------------------------------------------------


def test_mx03_batches_sum_exactly(spark):
    """Hamilton apportionment: Sum(batches) == 1000 exactly, base <=
    batches <= base + 1, and exactly `leftover` sources get the +1."""
    from ntripmonitor_spark.plans import REGISTRY

    rows = REGISTRY["mx03_epoch_schedule"].fn(spark, SF).collect()
    assert sum(r["batches"] for r in rows) == 1000
    for r in rows:
        assert r["batches"] in (r["base_batches"], r["base_batches"] + 1)
        assert r["extra"] in (0, 1)
    total = sum(r["n_chars_total"] for r in rows)
    base_sum = sum(r["n_chars_total"] * 1000 // total for r in rows)
    assert sum(r["extra"] for r in rows) == 1000 - base_sum


def test_mx03_proportionality(spark):
    """Each source's batch count is within 1 of its exact entitlement
    (the Hamilton quota property)."""
    from ntripmonitor_spark.plans import REGISTRY

    rows = REGISTRY["mx03_epoch_schedule"].fn(spark, SF).collect()
    total = sum(r["n_chars_total"] for r in rows)
    for r in rows:
        quota = Fraction(r["n_chars_total"] * 1000, total)
        assert math.floor(quota) <= r["batches"] <= math.floor(quota) + 1


# ---------------------------------------------------------------------------
# sp13 — weighted reservoir invariants
# ---------------------------------------------------------------------------


def test_sp13_exact_k_and_weight_skew(spark):
    """Per source: n_kept == min(10, n_frame), and the length-weighted
    draw skews long (kept mean > frame mean) in the aggregate."""
    from ntripmonitor_spark.plans import REGISTRY

    rows = REGISTRY["sp13_weighted_reservoir"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] == min(10, r["n_frame"])
    skewed = sum(
        r["mean_chars_kept_e3"] > r["mean_chars_frame_e3"] for r in rows
    )
    # weighted selection must skew long in the vast majority of groups
    assert skewed >= len(rows) * 0.8


def test_sp13_partitioning_invariance(spark):
    """The draw is a pure function of ids/weights — repartitioning the
    input cannot change a single output cell."""
    from ntripmonitor_spark.operators.sampling import weighted_reservoir
    from ntripmonitor_spark.tables import table

    docs = table(spark, SF, "documents")
    a = sorted(map(tuple, weighted_reservoir(docs).collect()))
    b = sorted(map(tuple, weighted_reservoir(docs.repartition(7)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# cu09 — selection-bias audit invariants
# ---------------------------------------------------------------------------


def test_cu09_partitions_the_corpus(spark):
    """kept + dropped == total docs per source (NULL gate verdicts
    count as dropped), and chars partition likewise."""
    from ntripmonitor_spark.plans import REGISTRY
    from ntripmonitor_spark.tables import table

    docs = table(spark, SF, "documents")
    totals = {r["source"]: (r["n"], r["c"]) for r in
              docs.groupBy("source").agg(
                  F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c")
              ).collect()}
    rows = REGISTRY["cu09_selection_bias"].fn(spark, SF).collect()
    assert {r["source"] for r in rows} == set(totals)
    for r in rows:
        n, c = totals[r["source"]]
        assert r["n_kept"] + r["n_dropped"] == n
        assert r["chars_kept"] + r["chars_dropped"] == c


def test_cu09_bias_is_cross_multiplied_mean_ratio(spark):
    """len_bias_ppm equals round-half-up of the exact rational
    (chars_kept/n_kept) / (chars_dropped/n_dropped) in millionths."""
    from ntripmonitor_spark.plans import REGISTRY

    for r in REGISTRY["cu09_selection_bias"].fn(spark, SF).collect():
        if r["n_kept"] > 0 and r["chars_dropped"] > 0:
            want = math.floor(
                Fraction(r["chars_kept"] * r["n_dropped"] * 10 ** 6,
                         r["chars_dropped"] * r["n_kept"]) + Fraction(1, 2)
            )
            assert r["len_bias_ppm"] == want
        else:
            assert r["len_bias_ppm"] is None


def test_cu09_planted_length_bias(spark):
    """A source whose gate-passing docs are systematically longer must
    show bias > 1e6; the gate verdicts come from the real gopher gate
    (long gibberish docs fail the stopword rule, keepers pass)."""
    from ntripmonitor_spark.operators.text import selection_bias

    def keeper(i, n_words):
        # gate-passing: 20-80 words, mean word len in [3.9, 5] (57x
        # 4-char fillers + the/of/and = 3.93), stopword hits >= 2
        words = ["the", "of", "and"] + ["abcd"] * (n_words - 3)
        return (i, " ".join(words), "s", len(" ".join(words)))

    def reject(i, n_words):
        # no stopwords -> stop_ok fails regardless of length
        words = [f"zzzz{j}" for j in range(n_words)]
        return (i, " ".join(words), "s", len(" ".join(words)))

    rows = [keeper(i, 60) for i in range(5)] + [reject(100 + i, 10) for i in range(5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    out = selection_bias(docs).collect()[0]
    assert out["n_kept"] == 5 and out["n_dropped"] == 5
    assert out["len_bias_ppm"] > 10 ** 6  # keepers are longer


# ---------------------------------------------------------------------------
# in09 — MaxScore/WAND bound invariants
# ---------------------------------------------------------------------------


def test_in09_bound_dominates_scores(spark):
    """theta >= top1 (the ceiling property), and the top-1 doc itself
    is never prunable, so n_prunable < n_candidates."""
    from ntripmonitor_spark.plans import REGISTRY

    rows = REGISTRY["in09_maxscore_bound"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["theta_ppm"] >= r["top1_ppm"]
        assert 0 <= r["n_prunable"] < r["n_candidates"]


def test_in09_prunable_matches_exhaustive(spark):
    """The prunable count equals the brute-force recount: docs whose
    matched-term upper-bound sum is strictly below the true top-1."""
    from ntripmonitor_spark.operators.retrieval import doc_terms, maxscore_bound
    from ntripmonitor_spark.plans.retrieval_plans import BM25_QUERIES
    from ntripmonitor_spark.tables import table

    docs = table(spark, SF, "documents")
    got = {r["query_id"]: r for r in maxscore_bound(docs, BM25_QUERIES).collect()}

    # brute-force in python over the same quantized contributions
    terms = doc_terms(docs).collect()
    n_docs = docs.count()
    df: dict[str, int] = {}
    for t in terms:
        df[t["term"]] = df.get(t["term"], 0) + 1
    allq = {t for _, ts in BM25_QUERIES for t in ts}
    c = {}
    for t in terms:
        if t["term"] in allq:
            idf = math.log(1.0 + n_docs / df[t["term"]])
            w = (1.0 + math.log(t["tf"])) * idf
            c[(t["doc_id"], t["term"])] = math.floor(w * idf * 1e6 + 0.5)
    ub: dict[str, int] = {}
    for (_, term), v in c.items():
        ub[term] = max(ub.get(term, -1), v)
    for qid, qts in BM25_QUERIES:
        present = [t for t in qts if t in ub]
        scores: dict[int, int] = {}
        bounds: dict[int, int] = {}
        for (doc, term), v in c.items():
            if term in present:
                scores[doc] = scores.get(doc, 0) + v
                bounds[doc] = bounds.get(doc, 0) + ub[term]
        top1 = max(scores.values())
        r = got[qid]
        assert r["n_terms"] == len(present)
        assert r["theta_ppm"] == sum(ub[t] for t in present)
        assert r["top1_ppm"] == top1
        assert r["n_candidates"] == len(scores)
        assert r["n_prunable"] == sum(1 for d, b in bounds.items() if b < top1)


# ---------------------------------------------------------------------------
# ts07 — LTOB downsample invariants
# ---------------------------------------------------------------------------


def test_ts07_output_shape_and_endpoints(spark):
    """Per key: at most k+2 points, endpoints present with the -1
    sentinel area (round 11: NULL would make the BIGINT column widen
    to float64 in a pandas fetch, truncating 17-digit areas past 2^53
    — the fetchdf-leg corollary of the HUGEINT class), one pick per
    populated interior bucket."""
    from ntripmonitor_spark.plans import REGISTRY

    rows = REGISTRY["ts07_lttb_downsample"].fn(spark, SF).collect()
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r["event_type"], []).append(r)
    assert by_key
    for key, rs in by_key.items():
        buckets = [r["bucket"] for r in rs]
        assert len(buckets) == len(set(buckets)), f"{key}: duplicate bucket pick"
        assert -1 in buckets and 20 in buckets, f"{key}: endpoints missing"
        assert len(rs) <= 22
        for r in rs:
            if r["bucket"] in (-1, 20):
                assert r["area"] == -1
            else:
                assert r["area"] is not None and r["area"] >= 0


def test_ts07_picks_max_area_point(spark):
    """Hand-built series: a spike mid-bucket must be the selected
    point of its bucket (largest triangle), endpoints always kept."""
    import datetime as dt

    from ntripmonitor_spark.operators.timeseries import lttb_downsample

    t0 = dt.datetime(2025, 1, 1)
    rows = []
    for i in range(40):
        v = 100.0 if i == 17 else 1.0 + (i % 3) * 0.1
        rows.append((i, t0 + dt.timedelta(seconds=i), "k", v))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = lttb_downsample(events, k=4)
    picked = {r["bucket"]: r["event_id"] for r in out.collect()}
    # i=17 -> rn=18 -> bucket (18-1)*4 div 40 = 1
    assert picked[1] == 17
    assert picked[-1] == 0 and picked[4] == 39


def test_ts07_partitioning_invariance(spark):
    from ntripmonitor_spark.operators.timeseries import lttb_downsample
    from ntripmonitor_spark.tables import table

    ev = table(spark, SF, "events")
    a = sorted(map(tuple, lttb_downsample(ev).collect()))
    b = sorted(map(tuple, lttb_downsample(ev.repartition(13)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# probe matrix — structural guarantees
# ---------------------------------------------------------------------------


def test_twin_probes_are_byte_identical():
    """pb15/pb16 must forward to the SAME callable and carry the SAME
    oracle string as their canonicals — anything less and a red/green
    split stops meaning 'name-keyed driver state'."""
    from ntripmonitor_spark.plans import REGISTRY

    for canon, twin in [
        ("dq03_key_skew_profile", "pb15_dq03_twin"),
        ("sp12_systematic", "pb16_sp12_twin"),
    ]:
        assert REGISTRY[twin].oracle == REGISTRY[canon].oracle


def test_twin_probe_results_match_canonical(spark):
    """The twin's result set is cell-identical to the canonical's."""
    from ntripmonitor_spark.plans import REGISTRY

    for canon, twin in [
        ("dq03_key_skew_profile", "pb15_dq03_twin"),
        ("sp12_systematic", "pb16_sp12_twin"),
    ]:
        a = sorted(map(tuple, REGISTRY[canon].fn(spark, SF).collect()))
        b = sorted(map(tuple, REGISTRY[twin].fn(spark, SF).collect()))
        assert a == b, f"{twin} diverged from {canon}"


def test_pb08_constant_probe_ground_truth(spark):
    """The no-table probe's values against hand-computed ground truth —
    if this ever moves, the quantize/rational_rh constructs moved."""
    from ntripmonitor_spark.plans import REGISTRY
    from ntripmonitor_spark.plans.probes import _PB08_ROWS

    rows = {r["k"]: r for r in REGISTRY["pb08_const_values"].fn(spark, SF).collect()}
    assert len(rows) == len(_PB08_ROWS)
    for k, x in _PB08_ROWS:
        r = rows[k]
        assert r["x"] == x
        assert r["q0"] == math.floor(x * 1.0 + 0.5)
        assert r["q6"] == math.floor(x * 1e6 + 0.5)
        assert r["r7_ppm"] == math.floor(Fraction(k * 1000000, 7) + Fraction(1, 2))
        assert r["rneg_ppm"] == math.floor(Fraction(-k * 1000000, 7) + Fraction(1, 2))
    # the deliberate ties decide the documented way
    assert rows[2]["q0"] == 3      # floor(2.5 + 0.5)
    assert rows[3]["q0"] == -2     # floor(-2.5 + 0.5) = floor(-2.0)


def test_probe_decompositions_are_consistent_with_canonicals(spark):
    """The probes must agree with the canonical queries they decompose
    — e.g. pb01's counts are dq03's count columns, pb12's estimates are
    qa05's est_* columns — otherwise a probe row says nothing about the
    canonical's red."""
    from ntripmonitor_spark.plans import REGISTRY

    dq03 = {r["partition_id"]: r for r in
            REGISTRY["dq03_key_skew_profile"].fn(spark, SF).collect()}
    pb01 = {r["partition_id"]: r for r in
            REGISTRY["pb01_dq03_counts"].fn(spark, SF).collect()}
    assert set(dq03) == set(pb01)
    for pid, r in pb01.items():
        c = dq03[pid]
        assert (r["n_keys"], r["n_rows"], r["max_key_rows"]) == (
            c["n_keys"], c["n_rows"], c["max_key_rows"])

    pb03 = {r["partition_id"]: r for r in
            REGISTRY["pb03_dq03_share_join"].fn(spark, SF).collect()}
    for pid, r in pb03.items():
        assert r["row_share_ppm"] == dq03[pid]["row_share_ppm"]

    qa05 = {r["event_type"]: r for r in
            REGISTRY["qa05_histogram_quantiles"].fn(spark, SF).collect()}
    pb12 = {r["event_type"]: r for r in
            REGISTRY["pb12_qa05_est"].fn(spark, SF).collect()}
    pb11 = {r["event_type"]: r for r in
            REGISTRY["pb11_qa05_exact"].fn(spark, SF).collect()}
    assert set(qa05) == set(pb12) == set(pb11)
    for g, r in qa05.items():
        for p in (50, 90, 99):
            assert pb12[g][f"est_p{p}_ppm"] == r[f"est_p{p}_ppm"]
            assert pb11[g][f"exact_p{p}_ppm"] == r[f"exact_p{p}_ppm"]


def test_pb14_kept_set_matches_sp10_counts(spark):
    """The per-doc keep flags aggregate to sp10's per-source kept
    counts — the localizer and the canonical can't drift."""
    from ntripmonitor_spark.plans import REGISTRY

    per_doc = REGISTRY["pb14_sp10_docs"].fn(spark, SF).collect()
    kept = {}
    for r in per_doc:
        kept[r["source"]] = kept.get(r["source"], 0) + r["kept"]
    sp10 = {r["source"]: r["n_kept"] for r in
            REGISTRY["sp10_pps_resample"].fn(spark, SF).collect()}
    assert kept == {s: n for s, n in sp10.items()}


def test_pb13_f_milli_matches_tx19_rollup(spark):
    """Per-doc f_milli sums/counts reproduce tx19's per-source rollup."""
    from ntripmonitor_spark.plans import REGISTRY

    per_doc = REGISTRY["pb13_tx19_docs"].fn(spark, SF).collect()
    agg: dict[str, list[int]] = {}
    for r in per_doc:
        a = agg.setdefault(r["source"], [0, 0, 0, 0])  # docs, scored, fsum, easy
        a[0] += 1
        scored = 1 if r["n_words"] > 0 else 0
        a[1] += scored
        a[2] += r["f_milli"]
        a[3] += 1 if (r["f_milli"] >= 60000 and scored) else 0
    tx19 = {r["source"]: r for r in
            REGISTRY["tx19_readability"].fn(spark, SF).collect()}
    assert set(agg) == set(tx19)
    for s, (n_docs, n_scored, f_sum, n_easy) in agg.items():
        r = tx19[s]
        assert (n_docs, n_scored, n_easy) == (r["n_docs"], r["n_scored"], r["n_easy"])
        want_mean = math.floor(Fraction(f_sum, n_scored) + Fraction(1, 2))
        assert r["mean_flesch_e3"] == want_mean


def test_pb10_histogram_state_is_mergeable(spark):
    """The headline claim of the qa05 estimator: its integer bin-count
    state merges across shards by ADDITION. Split events into three
    disjoint batches, bin each on the (fixed) global grid, add the
    count vectors — the sum must equal pb10's full-corpus state
    exactly."""
    from ntripmonitor_spark.plans import REGISTRY
    from ntripmonitor_spark.tables import table

    full = {(r["event_type"], r["b"]): r["n"]
            for r in REGISTRY["pb10_qa05_bins"].fn(spark, SF).collect()}

    ev = table(spark, SF, "events").filter(F.col("value").isNotNull())
    ext = ev.agg(
        F.min(F.col("value").cast("double")).alias("vmin"),
        F.max(F.col("value").cast("double")).alias("vmax"),
    ).collect()[0]
    vmin, vmax = ext["vmin"], ext["vmax"]
    w = (vmax - vmin) / 128.0
    merged: dict[tuple, int] = {}
    for i in range(3):
        batch = ev.filter(F.col("event_id") % 3 == i)
        b = F.least(
            F.floor((F.col("value").cast("double") - F.lit(vmin)) / F.lit(w)).cast("int"),
            F.lit(127),
        )
        for r in batch.groupBy("event_type", b.alias("b")).count().collect():
            k = (r["event_type"], r["b"])
            merged[k] = merged.get(k, 0) + r["count"]
    assert merged == full


# ---------------------------------------------------------------------------
# exact-rational emission — the tie class that broke tx19/sp10
# ---------------------------------------------------------------------------


def test_readability_exact_ties_are_deterministic(spark):
    """A document engineered so flesch*1000 + 0.5 is an EXACT integer
    in rational arithmetic (the VERDICT r9 failure class): 1 sentence,
    16 words, syllables chosen so the rational has an exact .5 — the
    integer-rational emission must round half UP, invariantly."""
    from ntripmonitor_spark.operators.text import doc_readability

    # f_milli_true = (206835*s*w - 1015*w^2 - 84600*syll*s) / (s*w)
    # with s=1, w=16: (206835*16 - 1015*256 - 84600*syll) / 16
    # numerator mod 16 == 8 gives an exact half: 206835*16 ≡ 0,
    # 1015*256 ≡ 0 (mod 16), so need 84600*syll ≡ 8 (mod 16);
    # 84600 ≡ 8 (mod 16) -> syll odd.
    words = ["ba"] * 15 + ["xz."]  # 16 whitespace tokens, one '.' run
    text = " ".join(words)  # syllables = count of [aeiouy]+ runs = 15 (odd)
    docs = spark.createDataFrame([(1, text, "s")], "doc_id long, text string, source string")
    row = doc_readability(docs).collect()[0]
    s, w, syll = row["n_sents"], row["n_words"], row["n_syll"]
    assert (s, w) == (1, 16) and syll % 2 == 1
    num = 206835 * s * w - 1015 * w * w - 84600 * syll * s
    want = math.floor(Fraction(num, s * w) + Fraction(1, 2))
    frac = Fraction(num, s * w)
    assert frac + Fraction(1, 2) == math.floor(frac) + 1  # genuinely a tie
    assert row["f_milli"] == want


def test_pps_cutoff_exact_at_max_doc(spark):
    """The max-length doc's cutoff is EXACTLY buckets (the r9 boundary
    case) via pure integer division — no double floor in the path."""
    from ntripmonitor_spark.operators.sampling import pps_stage

    docs = spark.createDataFrame(
        [(i, "s", 100 + i) for i in range(1, 8)],
        "doc_id long, source string, n_chars long",
    )
    rows = {r["doc_id"]: r for r in pps_stage(docs).collect()}
    assert rows[7]["cutoff"] == 1000  # (107*1000) div 107 exactly
    for i in range(1, 7):
        assert rows[i]["cutoff"] == (100 + i) * 1000 // 107
