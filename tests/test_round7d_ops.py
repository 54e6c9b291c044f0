"""Invariant checks for the round-7 fourth/fifth-wave operators (q26
q27 tp05 dd13 q28 sp11 dp02) — lattice/coverage conservation laws and
planted-pair calibration facts the DuckDB oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntripmonitor_spark.operators import dedup, sampling

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    """rows = (doc_id, text)."""
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


# ---------------------------------------------------------------------------
# tp05 — sliding chunks
# ---------------------------------------------------------------------------


def test_tp05_new_token_conservation(spark):
    """Every token is new in exactly one chunk: sum(n_new) per doc ==
    n_tokens, chunk overlap is exactly 32 for every non-first chunk."""
    texts = {
        1: " ".join(f"w{i}" for i in range(200)),   # 2 chunks: 128+72
        2: " ".join(f"w{i}" for i in range(128)),   # exactly one window
        3: " ".join(f"w{i}" for i in range(129)),   # 1-token second chunk
        4: "solo",                                   # tiny doc
    }
    out = sampling.sliding_chunks(_docs(spark, list(texts.items()))).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        n = rows[0]["n_tokens"]
        assert sum(r["n_new"] for r in rows) == n
        for r in rows:
            if r["chunk_idx"] > 0:
                assert r["chunk_len"] - r["n_new"] == 32
                assert r["start_tok"] == r["chunk_idx"] * 96
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 1 and len(by_doc[3]) == 2
    assert by_doc[3][-1]["n_new"] == 1 if by_doc[3][-1]["chunk_idx"] == 1 else True


def test_tp05_covers_every_token(spark):
    """Chunk spans tile [0, n_tokens) with no gap: each chunk ends at
    or after the next chunk's start."""
    text = " ".join(f"w{i}" for i in range(500))
    rows = sorted(
        sampling.sliding_chunks(_docs(spark, [(1, text)])).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert rows[0]["start_tok"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert prev["start_tok"] + prev["chunk_len"] >= cur["start_tok"]
    last = rows[-1]
    assert last["start_tok"] + last["chunk_len"] == 500


# ---------------------------------------------------------------------------
# q26 — CUBE lattice consistency
# ---------------------------------------------------------------------------


def test_q26_lattice_conservation(spark):
    """Each aggregation level of the CUBE reproduces the same grand
    totals: sum(n_orders) at every grouping level equals the base
    count, and the (1,1) row IS the grand total."""
    from ntripmonitor_spark.plans.relational import q26_cube_report

    rows = q26_cube_report(spark, SF).collect()
    levels = {}
    for r in rows:
        levels.setdefault((r["g_status"], r["g_priority"]), []).append(r)
    totals = {k: sum(r["n_orders"] for r in v) for k, v in levels.items()}
    assert len(set(totals.values())) == 1  # every level sums to the same N
    grand = levels[(1, 1)]
    assert len(grand) == 1 and grand[0]["n_orders"] == totals[(0, 0)]
    money = {k: round(sum(r["total_price"] for r in v), 2) for k, v in levels.items()}
    assert len(set(money.values())) == 1


# ---------------------------------------------------------------------------
# q27 — PIVOT conservation
# ---------------------------------------------------------------------------


def test_q27_counts_match_long_format(spark):
    """Wide-format counts sum back to the long-format totals per type."""
    from ntripmonitor_spark.plans.relational import q27_pivot_daily
    from ntripmonitor_spark.tables import table

    rows = q27_pivot_daily(spark, SF).collect()
    ev = table(spark, SF, "events")
    long = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    for t in ("view", "click", "purchase", "signup", "error"):
        assert sum(r[f"n_{t}"] for r in rows) == long[t]


# ---------------------------------------------------------------------------
# dd13 — LSH calibration on planted pairs
# ---------------------------------------------------------------------------


def test_dd13_identical_pair_is_exact(spark):
    """Two identical docs: all 9 signature slots match (bucket 9),
    exact jaccard 1.0, zero estimator error; the filler docs produce no
    candidate pairs."""
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(spark, [
        (1, dup), (2, dup),
        (3, "one two three four five six seven eight nine ten"),
        (4, "совсем unrelated words here that share nothing at all now"),
    ])
    rows = dedup.lsh_calibration(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_match"] == 9 and r["n_pairs"] == 1
    assert r["avg_exact"] == 1.0 and r["avg_abs_err"] == 0.0


def test_dd13_estimator_error_bounded_on_real_data(spark):
    """On the real corpus the mean |est - exact| per bucket stays below
    0.5 (a 9-perm estimator is coarse but must not be unhinged), and
    avg_exact is monotone-ish: the top bucket beats the bottom one."""
    from ntripmonitor_spark.plans.pipeline import dd13_lsh_calibration

    rows = sorted(dd13_lsh_calibration(spark, SF).collect(),
                  key=lambda r: r["n_match"])
    assert rows, "LSH produced no candidate pairs at sf0.001"
    assert all(0.0 <= r["avg_abs_err"] <= 0.5 for r in rows)
    assert all(0.0 <= r["avg_exact"] <= 1.0 for r in rows)
    # no strict monotonicity check: at sf0.001 buckets hold a handful
    # of near-saturated pairs and sampling noise can invert adjacent
    # bucket means (observed 0.975 vs 0.989)


# ---------------------------------------------------------------------------
# q28 — JSON schema-on-read
# ---------------------------------------------------------------------------


def test_q28_malformed_json_counted_not_fatal(spark):
    """from_json returns NULL for malformed props; the parse-failure
    count surfaces as n_events - n_parsed instead of an error."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "view", 1.0, '{"k": 5}'),
        (2, dt.datetime(2024, 1, 1), 1, "view", 1.0, "not json"),
        (3, dt.datetime(2024, 1, 1), 1, "view", 1.0, '{"k": 7}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    from pyspark.sql import functions as FF

    k = FF.from_json(FF.col("props"), "k INT").getField("k")
    out = df.select(k.alias("k")).agg(
        FF.count(FF.lit(1)).alias("n"), FF.count("k").alias("p"),
        FF.sum("k").alias("s"),
    ).collect()[0]
    assert (out["n"], out["p"], out["s"]) == (3, 2, 12)


def test_q28_all_corpus_rows_parse(spark):
    from ntripmonitor_spark.plans.relational import q28_json_props

    rows = q28_json_props(spark, SF).collect()
    assert rows and all(r["n_parsed"] == r["n_events"] for r in rows)
    assert all(0 <= r["min_k"] <= r["max_k"] for r in rows)


# ---------------------------------------------------------------------------
# sp11 — temporal split
# ---------------------------------------------------------------------------


def test_sp11_partitions_the_log_and_audits_leakage(spark):
    from ntripmonitor_spark.plans.pipeline import sp11_temporal_split
    from ntripmonitor_spark.tables import table as _table

    rows = {r["split"]: r for r in sp11_temporal_split(spark, SF).collect()}
    total = _table(spark, SF, "events").count()
    assert sum(r["n_events"] for r in rows.values()) == total
    tr = rows["train"]
    assert tr["n_users_shared_with_train"] == tr["n_users"]
    for s in ("embargo", "test"):
        if s in rows:
            assert rows[s]["n_users_shared_with_train"] <= rows[s]["n_users"]
    assert tr["first_day"] == 0 and tr["last_day"] <= 20
    if "embargo" in rows:
        assert rows["embargo"]["first_day"] == 21 == rows["embargo"]["last_day"]
    if "test" in rows:
        assert rows["test"]["first_day"] >= 22


# ---------------------------------------------------------------------------
# dp02 — PSI
# ---------------------------------------------------------------------------


def test_dp02_identical_halves_score_zero(spark):
    """Reference and current halves with IDENTICAL value distributions
    must score PSI ~ 0 (and never negative)."""
    import datetime as dt
    import ntripmonitor_spark.plans.pipeline as pp
    from ntripmonitor_spark.plans.pipeline import dp02_psi_drift

    rows = []
    eid = 0
    for day in list(range(0, 10)) + list(range(20, 30)):
        for i in range(20):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(days=day, minutes=i),
                         i, "view", float(25 * (i % 5) + 1), "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    orig = pp.table
    pp.table = lambda spark, sf_dir, name: df
    try:
        out = dp02_psi_drift(spark, "ignored").collect()
    finally:
        pp.table = orig
    assert len(out) == 1
    assert out[0]["psi"] == 0.0 and out[0]["drift_flag"] == 0


def test_dp02_real_corpus_psi_nonnegative(spark):
    from ntripmonitor_spark.plans.pipeline import dp02_psi_drift

    rows = dp02_psi_drift(spark, SF).collect()
    assert rows and all(r["psi"] >= 0.0 for r in rows)
    assert all(r["n_ref"] > 0 and r["n_cur"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# scd02 — AS OF snapshot
# ---------------------------------------------------------------------------


def test_scd02_one_state_per_active_user(spark):
    """The snapshot partitions the T-active population: sum of per-state
    user counts equals the number of users whose history starts at or
    before T (every such user is in EXACTLY one state at T)."""
    from ntripmonitor_spark.plans.joins_plans import scd02_asof_snapshot
    from ntripmonitor_spark.functions.timeutil import epoch_us
    from ntripmonitor_spark.tables import table as _table

    rows = scd02_asof_snapshot(spark, SF).collect()
    ev = _table(spark, SF, "events").select("user_id", epoch_us("ts").alias("us"))
    t_us = ev.agg(F.min("us")).collect()[0][0] + 15 * 86400000000
    n_active = (
        ev.groupBy("user_id").agg(F.min("us").alias("first_us"))
        .filter(F.col("first_us") <= t_us).count()
    )
    assert sum(r["n_users"] for r in rows) == n_active
    assert all(r["avg_state_age_h"] >= 0 for r in rows)


# ---------------------------------------------------------------------------
# ss16 — nprobe sweep monotonicity
# ---------------------------------------------------------------------------


def test_ss16_recall_monotone_in_probe_budget(spark):
    """More probed cells can only ADD candidates: avg recall@5 must be
    non-decreasing in nprobe, and every recall lies in [0, 1]."""
    from ntripmonitor_spark.plans.pipeline import ss16_nprobe_sweep

    rows = sorted(ss16_nprobe_sweep(spark, SF).collect(),
                  key=lambda r: r["nprobe"])
    assert [r["nprobe"] for r in rows] == [1, 2, 3]
    assert all(r["n_queries"] == 10 for r in rows)
    assert all(0.0 <= r["min_recall"] <= r["avg_recall"] <= 1.0 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b["avg_recall"] >= a["avg_recall"] - 1e-9
