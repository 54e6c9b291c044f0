"""Invariant checks for the round-7 sixth-wave operators (an06 qa04
dq04 tx18 in05 dd14 gr05 q29 lo02) — recursion identities, clipping
conservation laws, and layout-pruning facts the DuckDB oracle can't
express (the oracles pin cross-engine values; these pin semantics)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from ntripmonitor_spark.functions.zorder import pruning_stats
from ntripmonitor_spark.operators import dedup, retrieval, stats, text, timeseries

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    """rows = (doc_id, text)."""
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _events(spark, rows):
    """rows = (event_id, ts, user_id, event_type, value)."""
    return spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for i, ts, u, et, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


# ---------------------------------------------------------------------------
# an06 — CUSUM window closed form == sequential recursion
# ---------------------------------------------------------------------------


def test_an06_matches_sequential_recursion(spark):
    """The window identity S = C - min(0, running_min(C)) must equal
    the textbook recursion S_i = max(0, S_{i-1} + y_i) — verified by
    replaying the recursion in Python on a step series with a planted
    level shift, and the argmax must localize the shift."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for h in range(48):
        level = 10.0 if h < 30 else 25.0  # shift at bucket 30
        rows.append((h, base + datetime.timedelta(hours=h), 1, "a", level))
    out = timeseries.cusum_changepoint(
        _events(spark, rows), bucket_s=3600, slack_k=0.25
    ).collect()
    assert len(out) == 1
    r = out[0]
    # replay the recursion on the same hourly series
    xs = [10.0] * 30 + [25.0] * 18
    mu = sum(xs) / len(xs)
    var = sum((x - mu) ** 2 for x in xs) / (len(xs) - 1)
    sigma = var ** 0.5
    s, smax = 0.0, float("-inf")
    bkt0 = int(base.timestamp() // 3600)
    last_zero = None
    for i, x in enumerate(xs):
        prev = s
        s = max(0.0, s + (x - mu - 0.25 * sigma))
        if prev == 0.0 and s > 0.0:
            last_zero = bkt0 + i - 1
        smax = max(smax, s)
    assert abs(r["s_max"] - smax) < 1e-6
    # onset = latest prefix-argmin of C before the peak = bucket 29
    # (the last pre-shift bucket); the shift itself starts at 30
    assert r["cp_bkt"] == bkt0 + 29 == last_zero
    assert r["n_buckets"] == 48
    assert r["mean_before"] == 10.0
    assert r["mean_after"] == 25.0


def test_an06_no_shift_small_smax(spark):
    """A flat series never accumulates: s_max stays ~0 and
    mean_before ≈ mean_after."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(h, base + datetime.timedelta(hours=h), 1, "a", 5.0) for h in range(24)]
    r = timeseries.cusum_changepoint(_events(spark, rows), bucket_s=3600).collect()[0]
    assert r["s_max"] == 0.0


# ---------------------------------------------------------------------------
# qa04 — winsorized mean conservation
# ---------------------------------------------------------------------------


def test_qa04_clip_neutralizes_outlier(spark):
    """One absurd outlier: the raw mean moves with it, the winsorized
    mean stays near the bulk; clip counts match the tail definition."""
    base = datetime.datetime(2024, 1, 1)
    vals = [10.0] * 99 + [10000.0]
    rows = [(i, base + datetime.timedelta(minutes=i), 1, "a", v)
            for i, v in enumerate(vals)]
    r = stats.winsorized_mean(_events(spark, rows), lo_q=0.05, hi_q=0.95).collect()[0]
    assert r["mean_raw"] > 100.0
    assert r["mean_winsor"] < 30.0
    assert r["n_clip_hi"] == 1 and r["n_clip_lo"] == 0
    assert r["n_rows"] == 100


def test_qa04_constant_series_identity(spark):
    """With no tails to clip, winsorized == raw."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(minutes=i), 1, "a", 7.5) for i in range(20)]
    r = stats.winsorized_mean(_events(spark, rows)).collect()[0]
    assert r["mean_raw"] == r["mean_winsor"] == 7.5
    assert r["n_clip_lo"] == r["n_clip_hi"] == 0


# ---------------------------------------------------------------------------
# dq04 — Benford screen
# ---------------------------------------------------------------------------


def test_dq04_benford_sample_scores_low_uniform_high(spark):
    """Values drawn FROM the Benford distribution score a far lower
    chi-square than a constant-first-digit feed; digits stay in 1..9."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    i = 0
    # benford-ish: first digits with frequency ∝ log10(1+1/d)
    import math
    for d in range(1, 10):
        n = round(1000 * math.log10(1 + 1 / d))
        for _ in range(n):
            rows.append((i, base, 1, "benford", float(d)))
            i += 1
    for _ in range(500):
        rows.append((i, base, 1, "constant", 42.0))
        i += 1
    out = {r["event_type"]: r for r in
           stats.benford_deviation(_events(spark, rows)).collect()}
    assert out["benford"]["chi2_e9"] < 10.0 * 10**9
    assert out["constant"]["chi2_e9"] > 1000.0 * 10**9
    assert out["constant"]["n_digits"] == 1
    # digit-1 spine row always exists; no observations → share 0
    assert out["constant"]["p_digit1_ppm"] == 0


def test_dq04_digit_extraction_spans_magnitudes(spark):
    """0.07, 7.0 and 700 all land on digit 7 (scale-free extraction);
    zero/negative rows are excluded."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(0, base, 1, "a", 0.07), (1, base, 1, "a", 7.0),
            (2, base, 1, "a", 700.0), (3, base, 1, "a", 0.0)]
    r = stats.benford_deviation(_events(spark, rows)).collect()[0]
    assert r["n_rows"] == 3 and r["n_digits"] == 1


# ---------------------------------------------------------------------------
# tx18 — lexical diversity
# ---------------------------------------------------------------------------


def test_tx18_ttr_and_hapax_exact(spark):
    """Hand-computed TTR/hapax on known docs: 'a a b c' → 3 types /
    4 tokens, hapaxes {b, c} → 2/3 of types."""
    out = text.lexical_diversity(_docs(spark, [(1, "a a b c"), (2, "x x x x")])).collect()
    r = out[0]
    assert r["n_docs"] == 2 and r["n_tokens"] == 8
    # doc1: ttr 0.75, hapax 2/3; doc2: ttr 0.25, hapax 0
    assert abs(r["avg_ttr"] - (0.75 + 0.25) / 2) < 1e-9
    assert abs(r["avg_hapax_share"] - (2 / 3 + 0.0) / 2) < 1e-6


def test_tx18_distinct_all_unique(spark):
    """All-unique doc: ttr == hapax share == 1."""
    r = text.lexical_diversity(_docs(spark, [(1, "q w e r t y")])).collect()[0]
    assert r["avg_ttr"] == 1.0 and r["avg_hapax_share"] == 1.0


# ---------------------------------------------------------------------------
# in05 — proximity rank
# ---------------------------------------------------------------------------


def test_in05_min_distance_and_rank(spark):
    """Adjacent pair beats a far pair; docs missing either term drop."""
    out = retrieval.proximity_rank(
        _docs(spark, [
            (1, "hash join now"),            # dist 1
            (2, "hash x x x x join"),        # dist 5
            (3, "hash only here"),           # no 'join' → absent
            (4, "join hash"),                # dist 1, higher doc_id
        ]), "hash", "join", k=10,
    ).collect()
    ranks = {r["doc_id"]: r for r in out}
    assert set(ranks) == {1, 2, 4}
    assert ranks[1]["rank"] == 1 and ranks[4]["rank"] == 2  # tie → doc_id asc
    assert ranks[1]["min_dist"] == 1 and ranks[2]["min_dist"] == 5


def test_in05_multi_occurrence_takes_closest(spark):
    """min over ALL occurrence pairs, tf counts distinct positions."""
    r = retrieval.proximity_rank(
        _docs(spark, [(1, "hash far far far join hash")]), "hash", "join", k=5,
    ).collect()[0]
    assert r["min_dist"] == 1 and r["tf_a"] == 2 and r["tf_b"] == 1


# ---------------------------------------------------------------------------
# dd14 — CDC chunking
# ---------------------------------------------------------------------------


def test_dd14_token_conservation_and_shared_chunk(spark):
    """Chunk token counts conserve the corpus token count; two docs
    sharing their full text produce fully duplicated chunks while a
    unique doc contributes no dups beyond collisions."""
    t = "alpha beta gamma delta epsilon zeta eta theta"
    out = dedup.cdc_chunk_stats(_docs(spark, [(1, t), (2, t), (3, "unique words only")]))
    r = {x["source"]: x for x in out.collect()}["s"]
    assert r["n_tokens"] == len(t.split()) * 2 + 3
    # the two identical docs chunk identically → every one of their
    # chunks appears ≥2 times
    assert r["n_dup_chunks"] >= 2 * 1  # at least the duplicated doc's chunks
    assert 0 < r["dup_token_share"] < 1


def test_dd14_insertion_locality(spark):
    """CDC's point: inserting one word near the head changes only the
    chunk containing it — the tail chunks still dedup against the
    original (fixed-width spans would shift every later chunk)."""
    words = [f"w{i}" for i in range(120)]
    orig = " ".join(words)
    edited = " ".join(["INSERTED"] + words)
    out = dedup.cdc_chunk_stats(_docs(spark, [(1, orig), (2, edited)]))
    r = out.collect()[0]
    # most chunks dedup despite the insertion
    assert r["dup_token_share"] > 0.5


# ---------------------------------------------------------------------------
# gr05 — triangle counting
# ---------------------------------------------------------------------------


def test_gr05_counts_known_graph(spark):
    """Hand-built co-order graph: orders {1:(a,b,c)×2 views} forming a
    triangle among parts 1-2-3 plus a pendant 4 — the pendant joins no
    triangle; clustering of a triangle vertex with degree 2 is 1.0."""
    rows = []
    # each pair must co-occur in >= 2 distinct orders to form an edge
    orders = [
        (100, [1, 2, 3]), (101, [1, 2, 3]),       # triangle twice
        (102, [1, 4]), (103, [1, 4]),              # pendant edge 1-4
    ]
    ln = 0
    for ok, parts in orders:
        for p in parts:
            rows.append((ok, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         datetime.datetime(2024, 1, 1)))
            ln += 1
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    out = {r["node"]: r for r in dedup.triangle_stats(li, min_weight=2, k=10).collect()}
    assert set(out) == {1, 2, 3}  # node 4 is in no triangle
    assert all(r["n_tri"] == 1 for r in out.values())
    assert out[2]["degree"] == 2 and out[2]["clustering"] == 1.0
    assert out[1]["degree"] == 3  # edges to 2, 3, 4
    assert abs(out[1]["clustering"] - 2 * 1 / (3 * 2)) < 1e-6


# ---------------------------------------------------------------------------
# lo02 — zone-map pruning
# ---------------------------------------------------------------------------


def test_lo02_zorder_prunes_no_worse_and_counts_conserve(spark):
    """On the real sf0.001 events table: both layouts see the same 64
    files and the same matched rows; the z-order layout scans no more
    files than insertion order (the entire point of the layout)."""
    from ntripmonitor_spark.tables import table

    ev = table(spark, SF, "events")
    out = {r["layout"]: r for r in
           pruning_stats(ev, "user_id", "value", 30.0, 70.0, 50.0, 200.0,
                         n_files=64).collect()}
    assert set(out) == {"zorder", "insertion"}
    assert out["zorder"]["rows_matched"] == out["insertion"]["rows_matched"]
    assert out["zorder"]["files_scanned"] <= out["insertion"]["files_scanned"]
    for r in out.values():
        assert r["rows_scanned"] >= r["rows_matched"]
        assert r["files_scanned"] <= r["n_files"] <= 64


# ---------------------------------------------------------------------------
# wave 7: an07 ss17 gr06 in06 q30
# ---------------------------------------------------------------------------


def test_an07_mean_excess_known_tail(spark):
    """20 values: p95 interpolates into the two top values; only the
    max exceeds it; mean excess = max - threshold."""
    base = datetime.datetime(2024, 1, 1)
    vals = [float(i) for i in range(1, 21)]  # p95 = 19.05
    rows = [(i, base + datetime.timedelta(minutes=i), 1, "a", v)
            for i, v in enumerate(vals)]
    r = stats.mean_excess(_events(spark, rows), q=0.95).collect()[0]
    assert r["n_exceed"] == 1
    assert abs(r["threshold"] - 19.05) < 1e-9
    assert abs(r["mean_excess"] - (20.0 - 19.05)) < 1e-6
    assert r["max_value"] == 20.0


def test_ss17_radius_is_predicate_cut_of_probe_candidates(spark):
    """Radius results == ivf_probe candidates (unbounded k) filtered at
    the same tau, and every returned pair clears the threshold."""
    from ntripmonitor_spark.operators import simsearch
    from ntripmonitor_spark.tables import table

    emb = table(spark, SF, "embeddings")
    rad = simsearch.ivf_radius(emb, tau=0.3, k_centroids=8, n_queries=5, nprobe=2)
    got = {(r["query_id"], r["neighbor_id"]) for r in rad.collect()}
    probe = simsearch.ivf_probe(emb, k_centroids=8, n_queries=5, nprobe=2,
                                k=10**9).collect()
    want = {(r["query_id"], r["neighbor_id"]) for r in probe if r["cos_sim"] >= 0.3}
    assert got == want and got
    assert all(r["cos_sim"] >= 0.3 for r in rad.collect())


def test_gr06_kcore_peels_pendant_keeps_clique(spark):
    """A 4-clique survives 3-core peeling; a pendant chain hanging off
    it peels away entirely."""
    rows, ln = [], 0
    # 4-clique over parts 1-4: every pair needs >= 2 shared orders
    cl = [1, 2, 3, 4]
    for ok in (100, 101):
        for p in cl:
            rows.append((ok, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         datetime.datetime(2024, 1, 1)))
            ln += 1
    # pendant chain 4-5-6 (each consecutive pair in 2 orders)
    for ok, pair in ((102, (4, 5)), (103, (4, 5)), (104, (5, 6)), (105, (5, 6))):
        for p in pair:
            rows.append((ok, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         datetime.datetime(2024, 1, 1)))
            ln += 1
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    edges = dedup.co_order_edges(li, min_weight=2)
    out = {r["node"]: r["core_deg"] for r in dedup.kcore_peel(edges, k=3, rounds=3).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert all(d == 3 for d in out.values())


def test_in06_prefix_probe_counts(spark):
    """Prefix 's' sums tf across every s-term and counts distinct
    matched terms; docs without s-terms are absent."""
    from ntripmonitor_spark.operators import retrieval as r

    postings = spark.createDataFrame(
        [(1, "stream", 0), (1, "sort", 1), (1, "stream", 2), (1, "hash", 3),
         (2, "small", 0), (3, "hash", 0)],
        "doc_id long, term string, pos int",
    )
    out = {x["doc_id"]: x for x in r.prefix_probe(postings, "s", k=10).collect()}
    assert set(out) == {1, 2}
    assert out[1]["tf_prefix"] == 3 and out[1]["n_terms"] == 2
    assert out[2]["tf_prefix"] == 1 and out[2]["n_terms"] == 1
    assert out[1]["rank"] == 1


def test_q30_range_frame_is_time_bounded(spark):
    """Events 30 min apart: the trailing-1h frame holds at most 3 of
    them (t-60m..t inclusive), and an isolated event counts only
    itself — a ROWS frame could not express this."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(minutes=30 * i), 1, "a", 10.0)
            for i in range(4)]
    rows.append((9, base + datetime.timedelta(days=2), 1, "a", 99.0))
    df = _events(spark, rows)
    from ntripmonitor_spark.functions.timeutil import epoch_us
    from pyspark.sql import Window as W

    staged = df.select(
        "event_id", epoch_us("ts").alias("us"),
        F.round(F.col("value"), 6).cast("decimal(38,6)").alias("dv"))
    w = W.partitionBy().orderBy("us").rangeBetween(-3_600_000_000, 0)
    got = {r["event_id"]: r["n"] for r in
           staged.select("event_id", F.count(F.lit(1)).over(w).alias("n")).collect()}
    assert got == {0: 1, 1: 2, 2: 3, 3: 3, 9: 1}


# ---------------------------------------------------------------------------
# wave 8: tp06 an08 tk02 er05
# ---------------------------------------------------------------------------


def test_tp06_fim_reassembly_conservation(spark):
    """Segment lengths tile the doc exactly; cut points are stable
    under corpus growth (adding docs never moves existing cuts); the
    middle fingerprint matches a locally recomputed split."""
    import hashlib

    from ntripmonitor_spark.operators import sampling

    texts = {1: "a b c d e f g h", 2: "x y z", 7: " ".join(f"t{i}" for i in range(50))}
    out1 = {r["doc_id"]: r for r in
            sampling.fim_split(_docs(spark, list(texts.items()))).collect()}
    for doc_id, r in out1.items():
        n = len(texts[doc_id].split())
        assert r["len_prefix"] + r["len_middle"] + r["len_suffix"] == n
        assert 0 <= r["cut_lo"] <= r["cut_hi"] <= n
        mid = " ".join(texts[doc_id].split()[r["cut_lo"]:r["cut_hi"]])
        assert r["middle_fp"] == hashlib.md5(mid.encode()).hexdigest()
    # growth stability: add a doc, existing cuts unchanged
    texts2 = dict(texts); texts2[99] = "p q r s"
    out2 = {r["doc_id"]: r for r in
            sampling.fim_split(_docs(spark, list(texts2.items()))).collect()}
    for doc_id in texts:
        assert (out1[doc_id]["cut_lo"], out1[doc_id]["cut_hi"]) == \
               (out2[doc_id]["cut_lo"], out2[doc_id]["cut_hi"])


def test_an08_acf_signs(spark):
    """A strict alternating series has lag-1 ACF ≈ −1 and lag-2 ≈ +1;
    pair counts shrink by one per lag."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(h, base + datetime.timedelta(hours=h), 1, "a",
             10.0 if h % 2 == 0 else -10.0) for h in range(40)]
    out = {r["lag"]: r for r in
           timeseries.autocorrelation(_events(spark, rows), lags=(1, 2, 3)).collect()}
    assert out[1]["acf"] < -0.9 and out[2]["acf"] > 0.9 and out[3]["acf"] < -0.9
    assert out[1]["n_pairs"] == 39 and out[2]["n_pairs"] == 38 and out[3]["n_pairs"] == 37


def test_tk02_fertility_known_ratio(spark):
    """'ab2cd ef' → ws tokens 2, BPE-ish tokens 4 (ab|2|cd, ef) —
    fertility 2.0."""
    r = text.tokenizer_fertility(_docs(spark, [(1, "ab2cd ef")])).collect()[0]
    assert r["ws_tokens"] == 2 and r["bpe_tokens"] == 4
    assert abs(r["fertility"] - 2.0) < 1e-9


def test_er05_survivorship_rules(spark):
    """Hand-built cluster: names within edit distance 1 in one block;
    the golden record takes min-id name, max balance, majority
    segment (tie → lexicographic), and counts nation conflicts."""
    cust = spark.createDataFrame(
        [
            (1, "acme corp#A", 0, 100.0, "AUTO"),
            (2, "acme corp#B", 1, 500.0, "BUILD"),
            (3, "acme corp#Z", 0, 300.0, "AUTO"),
            (9, "zzz unrelated", 2, 50.0, "FARM"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    out = {r["entity_id"]: r for r in dedup.golden_record(cust).collect()}
    # block key = name minus last 2 chars = 'acme corp' for all three;
    # each name pair is within edit distance 1 → one cluster; 9 is alone
    assert out[1]["n_records"] == 3
    assert out[1]["canonical_name"] == "acme corp#A"
    assert out[1]["max_acctbal"] == 500.0
    assert out[1]["segment"] == "AUTO"     # 2 AUTO vs 1 BUILD
    assert out[1]["n_nations"] == 2
    assert out[9]["n_records"] == 1 and out[9]["segment"] == "FARM"


# ---------------------------------------------------------------------------
# wave 9: fn08 an09
# ---------------------------------------------------------------------------


def test_fn08_wau_is_union_not_sum(spark):
    """Two users alternating days: every window day's WAU is 2 while
    each DAU is 1 — the rolling distinct a sum of dailies would
    double-count; days outside the observed spine never appear."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(10):
        uid = 1 if d % 2 == 0 else 2
        rows.append((d, base + datetime.timedelta(days=d), uid, "view", 1.0))
    out = {r["day"]: r for r in
           timeseries.rolling_active_users(_events(spark, rows), window_days=7).collect()}
    day0 = min(out)
    assert len(out) == 10
    assert out[day0]["dau"] == 1 and out[day0]["wau"] == 1
    for d in sorted(out)[1:]:
        assert out[d]["dau"] == 1 and out[d]["wau"] == 2
        assert abs(out[d]["stickiness"] - 0.5) < 1e-9


def test_an09_outlier_moves_ols_not_theil(spark):
    """A clean unit-slope series with one wrecked bucket: OLS slope
    shifts visibly, the Theil-Sen median barely moves."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for h in range(48):
        v = float(h)            # slope exactly 1 per bucket
        if h == 40:
            v = 500.0           # outlier bucket
        rows.append((h, base + datetime.timedelta(hours=h), 1, "a", v))
    r = timeseries.theil_sen_trend(_events(spark, rows)).collect()[0]
    assert abs(r["slope_theil"] - 1.0) < 0.05
    assert r["slope_ols"] > 1.5
    assert r["n_buckets"] == 48 and r["n_pairs"] == 48 * 47 // 2


def test_an09_exact_linear(spark):
    """Pure linear series: both estimators agree at exactly 2.0."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(h, base + datetime.timedelta(hours=h), 1, "a", 2.0 * h)
            for h in range(24)]
    r = timeseries.theil_sen_trend(_events(spark, rows)).collect()[0]
    assert r["slope_theil"] == 2.0 and r["slope_ols"] == 2.0


# ---------------------------------------------------------------------------
# wave 10: lo03 tp07
# ---------------------------------------------------------------------------


def test_lo03_layout_rules_hold(spark):
    """On the real sf0.001 events: (1) the 1-D sort is unbeaten on its
    own column; (2) insertion order prunes nothing on either
    predicate; (3) z-order beats insertion everywhere and beats the
    1-D sort on the 2-D box; (4) matched-row counts agree across
    layouts (layout changes IO, never answers)."""
    from ntripmonitor_spark.functions.zorder import layout_matrix
    from ntripmonitor_spark.tables import table

    # sf0.001 spans user_id 0..14 / value 0..~330 — a box sized to the
    # fixture (the registered query's 30..70 band is sf0.01-scaled)
    preds = {"user_band": (3.0, 7.0, 0.0, 1e9),
             "value_band": (0.0, 1e9, 50.0, 60.0),
             "box": (3.0, 7.0, 50.0, 200.0)}
    ev = table(spark, SF, "events")
    out = {(r["layout"], r["predicate"]): r
           for r in layout_matrix(ev, "user_id", "value", preds, n_files=64).collect()}
    # the 1-D sort prunes nothing off its own column; z-order does
    assert out[("sort_a", "value_band")]["files_scanned"] == \
        out[("sort_a", "value_band")]["n_files"]
    assert out[("zorder", "value_band")]["files_scanned"] < \
        out[("zorder", "value_band")]["n_files"]
    for pred in ("user_band", "value_band", "box"):
        matched = {out[(l, pred)]["rows_matched"] for l in ("zorder", "sort_a", "insertion")}
        assert len(matched) == 1
        assert out[("sort_a", pred)]["files_scanned"] <= out[("insertion", pred)]["files_scanned"]
        assert out[("zorder", pred)]["files_scanned"] <= out[("insertion", pred)]["files_scanned"]
    assert out[("sort_a", "user_band")]["files_scanned"] <= \
        out[("zorder", "user_band")]["files_scanned"]
    assert out[("zorder", "box")]["files_scanned"] < \
        out[("insertion", "box")]["files_scanned"]


def test_tp07_phases_ordered_and_stable(spark):
    """Phases follow the quality terciles (every phase-0 quality <
    every phase-2 quality); position embeds (phase, hash) so sorting
    by position never interleaves phases; adding a doc leaves existing
    order keys unchanged."""
    from ntripmonitor_spark.plans.registry import REGISTRY

    out = REGISTRY["tp07_curriculum_order"].fn(spark, SF).collect()
    by_phase = {}
    for r in out:
        by_phase.setdefault(r["phase"], []).append(r)
    assert set(by_phase) == {0, 1, 2}
    assert max(r["quality"] for r in by_phase[0]) <= \
        min(r["quality"] for r in by_phase[2])
    for r in out:
        assert r["position"] == r["phase"] * (1 << 32) + r["order_key"]
    # positions sorted → phases monotone
    seq = [r["phase"] for r in sorted(out, key=lambda r: r["position"])]
    assert seq == sorted(seq)


# ---------------------------------------------------------------------------
# wave 11: cu06 dd15
# ---------------------------------------------------------------------------


def test_cu06_yield_curve_monotone(spark):
    """Raising the gate never keeps more: docs_kept and tokens_kept
    are non-increasing in the threshold; shares are consistent with
    the absolute counts."""
    from ntripmonitor_spark.plans.registry import REGISTRY

    rows = sorted(REGISTRY["cu06_threshold_sweep"].fn(spark, SF).collect(),
                  key=lambda r: r["threshold"])
    assert len(rows) == 9
    for prev, cur in zip(rows, rows[1:]):
        assert cur["docs_kept"] <= prev["docs_kept"]
        assert cur["tokens_kept"] <= prev["tokens_kept"]
    assert rows[0]["doc_share"] <= 1.0 and rows[-1]["doc_share"] >= 0.0


def test_dd15_inflation_counts_copies_not_survivors(spark):
    """Three copies of one doc: 2 dup docs, inflation = 2/3 of that
    text's tokens over the corpus total; a unique doc adds none."""
    t = "one two three four"
    docs = _docs(spark, [(1, t), (2, t), (3, t), (4, "uniq doc")])
    r = {x["source"]: x for x in dedup.dup_token_inflation(docs).collect()}["s"]
    assert r["n_docs"] == 4 and r["n_dup_docs"] == 2
    assert r["total_tokens"] == 3 * 4 + 2
    assert r["dup_tokens"] == 2 * 4
    assert abs(r["inflation"] - (8 / 14)) < 1e-6


# ---------------------------------------------------------------------------
# wave 12: an10 dq06
# ---------------------------------------------------------------------------


def test_an10_runs_extremes(spark):
    """A strictly alternating series has the maximum run count (every
    bucket starts a run → z strongly positive); a step series has
    exactly 2 runs (z strongly negative); counts are exact."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for h in range(40):  # alternating around its median
        rows.append((h, base + datetime.timedelta(hours=h), 1, "alt",
                     10.0 if h % 2 == 0 else -10.0))
    for h in range(40):  # step: 20 low then 20 high
        rows.append((100 + h, base + datetime.timedelta(hours=h), 1, "step",
                     -10.0 if h < 20 else 10.0))
    out = {r["event_type"]: r for r in
           timeseries.runs_test(_events(spark, rows)).collect()}
    assert out["alt"]["n_runs"] == 40 and out["alt"]["z"] > 5
    assert out["step"]["n_runs"] == 2 and out["step"]["z"] < -5
    for r in out.values():
        assert r["n_pos"] == r["n_neg"] == 20


def test_an10_one_sided_series_null_z(spark):
    """All buckets above the median is impossible, but a two-bucket
    series with one tie leaves one sign only → NULL z, no /0."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(0, base, 1, "a", 1.0), (1, base + datetime.timedelta(hours=1), 1, "a", 1.0),
            (2, base + datetime.timedelta(hours=2), 1, "a", 5.0)]
    out = timeseries.runs_test(_events(spark, rows)).collect()
    assert len(out) == 1 and out[0]["z"] is None


def test_dq06_detects_planted_orphan(spark, sf_dir):
    """The registered audit is clean on the synthetic star schema; a
    planted orphan child row is counted and lowers coverage."""
    from ntripmonitor_spark.plans.registry import REGISTRY
    from ntripmonitor_spark.tables import table as t

    clean = {r["fk_edge"]: r for r in
             REGISTRY["dq06_referential_integrity"].fn(spark, SF).collect()}
    assert len(clean) == 6
    assert all(r["n_orphans"] == 0 and r["fk_coverage"] == 1.0 for r in clean.values())

    orders = t(spark, SF, "orders").select(F.col("o_custkey").alias("_ck")).limit(5)
    cust = t(spark, SF, "customer").select(F.col("c_custkey").alias("_pk")).distinct()
    planted = orders.unionByName(
        spark.createDataFrame([(10**12,)], "_ck long"))
    joined = planted.join(cust, planted["_ck"] == cust["_pk"], "left")
    row = joined.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0)).alias("n_orphans"),
    ).collect()[0]
    assert row["n_child"] == 6 and row["n_orphans"] == 1


# ---------------------------------------------------------------------------
# wave 13: mk02 cu07
# ---------------------------------------------------------------------------


def test_mk02_flags_rare_transition_walker(spark):
    """Two users walking a common a→b→a... loop and one user making
    rare b→c jumps: the rare-transition user scores the highest mean
    surprisal."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    i = 0
    for uid in (1, 2, 3, 4, 5):
        for t in range(10):
            rows.append((i, base + datetime.timedelta(minutes=t), uid, "a" if t % 2 == 0 else "b", 1.0))
            i += 1
    for t in range(10):  # user 9 alternates b / c — transitions the others never make
        rows.append((i, base + datetime.timedelta(minutes=t), 9, "b" if t % 2 == 0 else "c", 1.0))
        i += 1
    out = timeseries.sequence_nll(_events(spark, rows), min_steps=5, k=10).collect()
    assert out[0]["user_id"] == 9 and out[0]["rank"] == 1
    assert out[0]["mean_nll"] > out[-1]["mean_nll"] or len(out) == 1


def test_cu07_ablation_conservation(spark):
    """Flag algebra holds on the real corpus: n_only <= n_flagged per
    gate, and the union bound sum(n_only) <= n_removed <= sum(n_flagged)."""
    from ntripmonitor_spark.plans.registry import REGISTRY

    rows = {r["gate"]: r for r in REGISTRY["cu07_gate_ablation"].fn(spark, SF).collect()}
    assert set(rows) == {"quality", "dup", "length"}
    n_removed = next(iter(rows.values()))["n_removed"]
    assert all(r["n_only"] <= r["n_flagged"] for r in rows.values())
    assert sum(r["n_only"] for r in rows.values()) <= n_removed
    assert n_removed <= sum(r["n_flagged"] for r in rows.values())


# ---------------------------------------------------------------------------
# wave 14: ts05
# ---------------------------------------------------------------------------


def test_ts05_keeps_the_spike(spark):
    """A flat bucket with one spike: the extreme row IS the spike and
    the mean still reflects the whole bucket; a constant bucket picks
    its earliest event with zero deviation."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(minutes=i), 1, "a", 10.0) for i in range(10)]
    rows.append((99, base + datetime.timedelta(minutes=30), 1, "a", 100.0))
    rows += [(200 + i, base + datetime.timedelta(hours=12, minutes=i), 1, "a", 5.0)
             for i in range(4)]
    out = sorted(timeseries.downsample_extremes(_events(spark, rows)).collect(),
                 key=lambda r: r["bkt"])
    assert len(out) == 2
    spike, flat = out[0], out[1]
    assert spike["ext_event_id"] == 99 and spike["ext_value"] == 100.0
    assert abs(spike["mean_v"] - (10 * 10 + 100) / 11) < 1e-6
    assert flat["ext_event_id"] == 200 and flat["ext_dev"] == 0.0
