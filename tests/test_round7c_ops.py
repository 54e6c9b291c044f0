"""Invariant checks for the round-7 third-wave operators (gr04 fn07
mx02 ss15 dq03 rc02) — constructed-graph guarantees and conservation
laws the DuckDB oracle comparison can't express."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ntripmonitor_spark.operators import dedup

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


# ---------------------------------------------------------------------------
# gr04 — fixed-point PageRank
# ---------------------------------------------------------------------------


def test_pagerank_star_center_wins(spark):
    """In a 5-node star, the hub must out-rank every leaf, and all
    leaves (symmetric by construction) must tie EXACTLY — fixed-point
    integer arithmetic makes symmetry a bit-equality, not a tolerance."""
    e = _edges(spark, [(0, i) for i in range(1, 5)])
    out = {r["doc_id"]: r for r in dedup.pagerank(e).collect()}
    hub, leaves = out[0], [out[i] for i in range(1, 5)]
    assert hub["degree"] == 4 and all(l["degree"] == 1 for l in leaves)
    assert all(hub["pr_e12"] > l["pr_e12"] for l in leaves)
    assert len({l["pr_e12"] for l in leaves}) == 1


def test_pagerank_mass_nearly_conserved(spark):
    """Total fixed-point mass stays within truncation loss of 1e12:
    each of the 3 rounds forfeits < 1 unit per message plus < 100 units
    per node to the two integral divisions."""
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4), (1, 3)])
    rows = dedup.pagerank(e).collect()
    total = sum(r["pr_e12"] for r in rows)
    n_nodes, n_msgs = 5, 2 * 6
    slack = 3 * (n_msgs + 101 * n_nodes)
    assert 10**12 - slack <= total <= 10**12


def test_pagerank_partitioning_invariance(spark):
    """Bit-identical ranks at 1 and 32 shuffle partitions — the whole
    point of integer fixed-point over float summation."""
    e = _edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    base = {(r["doc_id"], r["pr_e12"]) for r in dedup.pagerank(e).collect()}
    alt = {(r["doc_id"], r["pr_e12"])
           for r in dedup.pagerank(e.repartition(32)).collect()}
    assert base == alt


def test_pagerank_disconnected_components_independent(spark):
    """Two identical disconnected triangles: every node has the same
    rank (global n is shared, structure is identical)."""
    tri = [(0, 1), (1, 2), (0, 2)]
    e = _edges(spark, tri + [(a + 10, b + 10) for a, b in tri])
    prs = {r["pr_e12"] for r in dedup.pagerank(e).collect()}
    assert len(prs) == 1


# ---------------------------------------------------------------------------
# fn07 — RFM segmentation (threshold boundary semantics)
# ---------------------------------------------------------------------------


def test_fn07_threshold_boundaries(spark):
    """Users planted exactly ON each scoring boundary land in the
    documented bucket: recency uses whole-day integral division,
    frequency >= cuts, monetary >= cuts on DECIMAL(18,2)."""
    from ntripmonitor_spark.plans.joins_plans import fn07_rfm_segments
    import ntripmonitor_spark.plans.joins_plans as jp

    rows = []
    eid = 0

    def buy(uid, days_before_end, value):
        nonlocal eid
        eid += 1
        rows.append((eid, uid, T0 + dt.timedelta(days=30 - days_before_end), "purchase", value))

    # user 1: newest purchase defines the corpus max; 20 buys of 40 =>
    # freq 20 (f=3), monetary 800 (m=3), recency 0 (r=3)
    for _ in range(20):
        buy(1, 0, 40.0)
    # user 2: exactly 2 whole days back, 10 buys of 30 => (3,2,2)@300
    for _ in range(10):
        buy(2, 2, 30.0)
    # user 3: 7 days + 1 second back -> recency_d 7 (r=2); 9 buys (f=1),
    # 299.99 total (m=1)
    for i in range(9):
        rows.append((1000 + i, 3, T0 + dt.timedelta(days=23, seconds=-1),
                     "purchase", 299.99 / 9))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    orig_table = jp.table
    jp.table = lambda spark, sf_dir, name: df
    try:
        out = {(r["r_score"], r["f_score"], r["m_score"]): r["n_users"]
               for r in fn07_rfm_segments(spark, "ignored").collect()}
    finally:
        jp.table = orig_table
    assert out == {(3, 3, 3): 1, (3, 2, 2): 1, (2, 1, 1): 1}


# ---------------------------------------------------------------------------
# mx02 — mixture epochs
# ---------------------------------------------------------------------------


def test_mx02_sqrt_flattening_and_budget(spark):
    """Two sources with a 1:4 char ratio get sqrt-flattened 1:2
    weights; the 2x budget implies the small source upsamples
    (epochs > 1) while weights sum to ~1 and total scheduled chars
    equal the budget."""
    from ntripmonitor_spark.plans.pipeline import mx02_mixture_epochs
    import ntripmonitor_spark.plans.pipeline as pp

    docs = spark.createDataFrame(
        [(i, "x", "en", "small", 100) for i in range(10)]
        + [(100 + i, "x", "en", "big", 100) for i in range(40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig_table = pp.table
    pp.table = lambda spark, sf_dir, name: docs
    try:
        out = {r["source"]: r for r in mx02_mixture_epochs(spark, "ignored").collect()}
    finally:
        pp.table = orig_table
    small, big = out["small"], out["big"]
    w_s = small["weight_ppm"] / 1e6
    w_b = big["weight_ppm"] / 1e6
    e_s = small["epochs_e4"] / 1e4
    e_b = big["epochs_e4"] / 1e4
    assert abs(w_s * 2 - w_b) < 3e-6  # 1:2
    assert abs(w_s + w_b - 1.0) < 1e-6
    # budget = 2 * 5000 chars; scheduled = sum(epochs * chars)
    scheduled = e_s * 1000 + e_b * 4000
    assert abs(scheduled - 10000) < 2.0
    assert small["needs_upsampling"] == 1
    # small gets 1/3 of a 2x budget over 1/5 of the chars -> epochs 10/3
    assert abs(e_s - 10 / 3) < 1e-3
    assert abs(e_b - 10 / 6) < 1e-3


# ---------------------------------------------------------------------------
# ss15 — power iteration
# ---------------------------------------------------------------------------


def _axis_embeddings(spark, axis=5, weights=(3.0, 4.0, 12.0)):
    rows = []
    for i, a in enumerate(weights):
        v = [0.0] * 64
        v[axis] = a
        rows.append((i, v, 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_ss15_single_axis_recovers_exactly(spark):
    """A corpus living on one axis must return loading 1.0 on that axis
    and exactly 0.0 elsewhere; the eigenvalue is sum(a_i^2) (the Gram
    matrix's only non-zero eigenvalue)."""
    from ntripmonitor_spark.operators import simsearch

    out = {r["dim_idx"]: r for r in
           simsearch.power_iteration(_axis_embeddings(spark)).collect()}
    assert out[5]["loading"] == 1.0
    assert all(out[j]["loading"] == 0.0 for j in range(64) if j != 5)
    assert abs(out[0]["eigenvalue"] - (9 + 16 + 144)) < 1e-2


def test_ss15_partitioning_invariance(spark):
    """Decimal-carried matvec sums: identical loadings at 1 vs 32
    input partitions."""
    from ntripmonitor_spark.operators import simsearch

    emb = _axis_embeddings(spark, axis=2, weights=(1.5, 2.5, 3.5, 0.5))
    a = [(r["dim_idx"], r["loading"]) for r in
         simsearch.power_iteration(emb.coalesce(1)).collect()]
    b = [(r["dim_idx"], r["loading"]) for r in
         simsearch.power_iteration(emb.repartition(32)).collect()]
    assert sorted(a) == sorted(b)


# ---------------------------------------------------------------------------
# dq03 — key-skew profile conservation
# ---------------------------------------------------------------------------


def test_dq03_row_conservation_and_hash_placement(spark):
    """Partition rows sum to the table size, shares sum to ~1, and a
    planted key lands exactly where the portable hash says."""
    from ntripmonitor_spark.plans.pipeline import dq03_key_skew_profile

    rows = dq03_key_skew_profile(spark, "/root/testdata/sf0.001").collect()
    from ntripmonitor_spark.tables import table as _table

    n_events = _table(spark, "/root/testdata/sf0.001", "events").count()
    assert sum(r["n_rows"] for r in rows) == n_events
    assert abs(sum(r["row_share_ppm"] for r in rows) / 1e6 - 1.0) < 1e-4
    assert all(r["max_key_rows"] <= r["n_rows"] for r in rows)
    # mean of skew_vs_mean weighted by 1 partition each ~= populated share
    assert all(r["skew_vs_mean_e4"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# rc02 — nDCG
# ---------------------------------------------------------------------------


def test_rc02_perfect_ranking_scores_one(spark):
    """A corpus where BM25 ordering equals the relevance ordering must
    score nDCG exactly 1.0; gains follow 2^rel - 1."""
    from ntripmonitor_spark.operators import retrieval
    import ntripmonitor_spark.plans.retrieval_plans  # noqa: F401

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma pad pad pad", "en", "s", 10),
            (2, "alpha beta pad pad pad pad", "en", "s", 10),
            (3, "alpha pad pad pad pad pad", "en", "s", 10),
        ]
        + [(10 + i, "pad filler words only here now", "en", "s", 10) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = retrieval.ndcg_eval(docs, [(1, ["alpha", "beta", "gamma"])], k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rel"] == 3
    assert r["ndcg"] == 1.0
    # DCG = 7*1 + 3/log2(3) + 1/2 exactly (as 9-dp decimals)
    import math
    want = 7 * 1.0 + 3 * round(1 / math.log2(3), 9) + 1 * 0.5
    assert abs(r["dcg"] - want) < 1e-8


def test_rc02_real_corpus_bounds(spark):
    """On the real corpus every query's nDCG lies in (0, 1]."""
    from ntripmonitor_spark.plans.retrieval_plans import rc02_ndcg_eval

    rows = rc02_ndcg_eval(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 3
    assert all(0 < r["ndcg"] <= 1.0 for r in rows)
    assert all(r["dcg"] <= r["idcg"] + 1e-9 for r in rows)
