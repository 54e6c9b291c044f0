"""Invariant checks for the round-7 third-wave operators (gr04 fn07
mx02) — constructed-graph guarantees and conservation laws the DuckDB
oracle comparison can't express."""

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
    assert abs(small["weight"] * 2 - big["weight"] * 1) < 3e-6  # 1:2 (6-dp rounded)
    assert abs(small["weight"] + big["weight"] - 1.0) < 1e-6
    # budget = 2 * 5000 chars; scheduled = sum(epochs * chars)
    scheduled = small["epochs"] * 1000 + big["epochs"] * 4000
    assert abs(scheduled - 10000) < 2.0
    assert small["needs_upsampling"] == 1
    # small gets 1/3 of a 2x budget over 1/5 of the chars -> epochs 10/3
    assert abs(small["epochs"] - 10 / 3) < 1e-3
    assert abs(big["epochs"] - 10 / 6) < 1e-3
