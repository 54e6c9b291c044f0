"""Invariant checks for the round-7 second-wave operators (fn05 fn06
ss14 sp10 ts03) — constructed-input guarantees and conservation laws
the DuckDB oracle comparison can't express."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ntripmonitor_spark.operators import joins, sampling, simsearch, timeseries
from ntripmonitor_spark.tables import table

SF = "/root/testdata/sf0.001"

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    """rows = (event_id, user_id, minutes_after_t0, event_type, value)."""
    data = [
        (eid, uid, T0 + dt.timedelta(minutes=m), et, float(v))
        for eid, uid, m, et, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


# ---------------------------------------------------------------------------
# fn05 — window funnel
# ---------------------------------------------------------------------------


def test_fn05_planted_funnel_depths(spark):
    """One user per depth: full chain inside the window -> 3; click in
    window but purchase outside -> 2; click outside the window -> 1."""
    ev = _events(spark, [
        # user 1: view -> click(+10m) -> purchase(+20m), all inside 1h
        (1, 1, 0, "view", 0), (2, 1, 10, "click", 0), (3, 1, 20, "purchase", 0),
        # user 2: click inside, purchase 2h later (outside)
        (4, 2, 0, "view", 0), (5, 2, 10, "click", 0), (6, 2, 130, "purchase", 0),
        # user 3: click 2h after the view (outside)
        (7, 3, 0, "view", 0), (8, 3, 130, "click", 0),
    ])
    out = {r["max_step"]: r["n_starts"] for r in joins.window_funnel(ev, window_s=3600).collect()}
    assert out == {3: 1, 2: 1, 1: 1}


def test_fn05_strictly_after_at_equal_timestamps(spark):
    """A click at the view's exact timestamp does NOT advance the
    funnel (strict ordering), but one a microsecond later would — here
    one minute later, which does."""
    ev = _events(spark, [
        (1, 1, 0, "view", 0), (2, 1, 0, "click", 0),          # same instant: no
        (3, 2, 0, "view", 0), (4, 2, 1, "click", 0),          # later: yes
    ])
    res = joins.window_funnel(ev, window_s=3600).collect()
    steps = sorted((r["max_step"], r["n_starts"]) for r in res)
    assert steps == [(1, 1), (2, 1)]


def test_fn05_greedy_earliest_click_is_exact(spark):
    """Purchase only reachable via the SECOND click: the greedy
    earliest-click match must still find it (first purchase after the
    first click is the same row)."""
    ev = _events(spark, [
        (1, 1, 0, "view", 0),
        (2, 1, 5, "click", 0),      # earliest click
        (3, 1, 30, "click", 0),
        (4, 1, 40, "purchase", 0),  # after both clicks, inside window
    ])
    res = joins.window_funnel(ev, window_s=3600).collect()
    assert [(r["max_step"], r["n_starts"]) for r in res] == [(3, 1)]


# ---------------------------------------------------------------------------
# fn06 — linear attribution
# ---------------------------------------------------------------------------


def test_fn06_equal_split_and_window_edges(spark):
    """One view + one click before the purchase -> 0.5 credit each; a
    touch AT the purchase timestamp and one outside the 7-day lookback
    are both excluded."""
    week_m = 7 * 24 * 60
    ev = _events(spark, [
        (1, 1, 0, "view", 0), (2, 1, 10, "click", 0), (3, 1, 20, "purchase", 0),
        # user 2: touch exactly at the purchase instant -> no credit
        (4, 2, 0, "view", 0), (5, 2, 0, "purchase", 0),
        # user 3: touch 8 days before -> outside the lookback
        (6, 3, 0, "view", 0), (7, 3, week_m + 24 * 60, "purchase", 0),
    ])
    out = {r["channel"]: r for r in joins.linear_attribution(ev).collect()}
    assert out["view"]["credit"] == 0.5 and out["click"]["credit"] == 0.5
    assert out["view"]["n_conversions"] == 1 and out["click"]["n_conversions"] == 1


def test_fn06_credit_conservation_on_real_data(spark):
    """Total credit across channels equals the number of credited
    conversions (to rounding: each share is 6-dp rounded, so a
    conversion's shares can miss 1.0 by <= 1e-5)."""
    ev = table(spark, SF, "events")
    rows = joins.linear_attribution(ev).collect()
    total_credit = sum(r["credit"] for r in rows)
    # count conversions with >= 1 touch, independently
    from ntripmonitor_spark.functions.timeutil import epoch_us
    from pyspark.sql import Window

    w_us = 7 * 86400 * 1_000_000
    e = ev.filter(F.col("event_type").isin("purchase", "view", "click")).select(
        "event_type", "user_id", epoch_us("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us").rangeBetween(-w_us, -1)
    n_conv = (
        e.withColumn("n", F.count(F.when(F.col("event_type") != "purchase", 1)).over(w))
        .filter((F.col("event_type") == "purchase") & (F.col("n") > 0))
        .count()
    )
    assert abs(total_credit - n_conv) <= 1e-5 * max(n_conv, 1)


# ---------------------------------------------------------------------------
# ss14 — MMR re-rank
# ---------------------------------------------------------------------------


def test_ss14_structure_and_rank1_matches_knn(spark):
    emb = table(spark, SF, "embeddings")
    out = simsearch.mmr_rerank(emb).persist()
    per_q = out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("neighbor_id").alias("nd"),
    ).collect()
    assert all(r["n"] == 3 and r["nd"] == 3 for r in per_q)
    # rank-1 is pure relevance: must equal brute-force kNN rank-1
    knn1 = {
        (r["query_id"], r["neighbor_id"])
        for r in simsearch.knn_bruteforce(emb, n_queries=10, k=1).collect()
    }
    mmr1 = {
        (r["query_id"], r["neighbor_id"])
        for r in out.filter(F.col("mmr_rank") == 1).collect()
    }
    assert mmr1 == knn1
    out.unpersist()


def test_ss14_matches_numpy_greedy_replay(spark):
    """Replay the MMR greedy loop in numpy (same 6-dp rounding, same
    tie rule) for every query and require the identical selection."""
    import numpy as np

    emb = table(spark, SF, "embeddings")
    out = simsearch.mmr_rerank(emb).collect()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }

    def cos(a, b):
        return round(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["mmr_rank"])
        qv = vecs[q]
        rels = {i: cos(qv, v) for i, v in vecs.items() if i != q}
        pool = sorted(rels, key=lambda i: (-rels[i], i))[:10]
        sel = [min(pool, key=lambda i: (-rels[i], i))]
        for _ in range(2):
            rest = [c for c in pool if c not in sel]
            best = min(
                rest,
                key=lambda c: (
                    -(0.7 * rels[c] - 0.3 * max(cos(vecs[c], vecs[s]) for s in sel)),
                    c,
                ),
            )
            sel.append(best)
        assert [r["neighbor_id"] for r in rows] == sel, f"query {q}"


# ---------------------------------------------------------------------------
# sp10 — PPS resample
# ---------------------------------------------------------------------------


def test_sp10_determinism_and_bounds(spark):
    docs = table(spark, SF, "documents")
    a = sorted(map(tuple, sampling.pps_resample(docs).collect()))
    b = sorted(map(tuple, sampling.pps_resample(docs).collect()))
    assert a == b
    for (_, n_orig, n_kept, chars_kept, ht) in a:
        assert 0 <= n_kept <= n_orig
        assert ht >= n_kept  # each HT share is >= 1
        assert chars_kept >= 0


def test_sp10_largest_doc_always_kept(spark):
    """cutoff(max doc) == buckets, and bucket < buckets always, so the
    largest doc can never be dropped — planted corpus check."""
    rows = [(i, "src", 10 + i) for i in range(50)] + [(999, "big", 100000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r["source"]: r for r in sampling.pps_resample(docs).collect()}
    assert out["big"]["n_kept"] == 1


# ---------------------------------------------------------------------------
# ts03 — TWAP / LOCF
# ---------------------------------------------------------------------------


def test_ts03_planted_twap_exact(spark):
    """value 0 held for 10 min, then 10 held for 10 min -> TWAP 5.0;
    the final observation contributes no forward interval."""
    ev = _events(spark, [
        (1, 1, 0, "e", 0.0), (2, 1, 10, "e", 10.0), (3, 1, 20, "e", 99.0),
    ])
    rows = timeseries.twap_locf(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["twap"] == 5.0 and r["n_points"] == 3 and r["span_s"] == 1200


def test_ts03_single_or_tied_timestamp_users_excluded(spark):
    ev = _events(spark, [
        (1, 1, 0, "e", 1.0),                       # single point: no span
        (2, 2, 0, "e", 1.0), (3, 2, 0, "e", 2.0),  # zero-width span
        (4, 3, 0, "e", 1.0), (5, 3, 5, "e", 1.0),  # real span
    ])
    rows = timeseries.twap_locf(ev).collect()
    assert [r["user_id"] for r in rows] == [3]
    assert rows[0]["twap"] == 1.0
