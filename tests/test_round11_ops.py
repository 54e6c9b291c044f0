"""Round-11 behavior pins: the hq_* memo, the maxscore unpersist, and
LTOB's NULL-value discipline (round-10 ADVICE items + the fetchdf-leg
corollary)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_hq_relations_are_memoized(spark, sf_dir):
    """qa05 + its probe legs must share ONE persisted relation per
    input instead of persisting a fresh corpus-sized relation per call
    (round-10 ADVICE: the docstring claimed a cache that didn't
    exist)."""
    from ntripmonitor_spark.operators.stats import hq_cum, hq_ranked
    from ntripmonitor_spark.tables import table

    ev = table(spark, sf_dir, "events")
    assert hq_cum(ev) is hq_cum(ev)
    assert hq_ranked(ev) is hq_ranked(ev)
    # different params -> different relation
    assert hq_cum(ev) is not hq_cum(ev, n_bins=64)


def test_maxscore_releases_its_persisted_relation(spark, sf_dir):
    """maxscore_bound eagerly materializes its bounded report and
    unpersists the query-term contribution relation before returning
    (round-10 ADVICE: cached blocks otherwise accumulate for the
    session across a bench sweep)."""
    from ntripmonitor_spark.operators.retrieval import maxscore_bound
    from ntripmonitor_spark.tables import table

    sc = spark.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    out = maxscore_bound(
        table(spark, sf_dir, "documents"),
        queries=[(1, ["the", "of"]), (2, ["and", "a"])],
    )
    assert out.count() > 0
    after = sc._jsc.sc().getPersistentRDDs().size()
    assert after <= before, (
        f"maxscore leaked persisted RDDs: {before} -> {after}"
    )


def _events_with_nulls(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        # every 7th value NULL, including interior points of buckets
        v = None if i % 7 == 3 else float(100 + (i * 37) % 50)
        rows.append(("a", i, t0 + dt.timedelta(seconds=i), v))
    return spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp, value double"
    )


def test_lttb_drops_null_values_and_emits_sentinel_area(spark):
    """NULL metric rows are filtered before ranking (a NULL y would
    NULL its own and both neighbors' areas, and engines rank ORDER BY
    NULLs at opposite ends), and the endpoint sentinels emit area = -1
    instead of NULL (a nullable BIGINT output widens to float64 in a
    pandas fetch, truncating 17-digit areas past 2^53)."""
    from ntripmonitor_spark.operators.timeseries import lttb_downsample

    out = lttb_downsample(_events_with_nulls(spark), k=5).collect()
    assert out, "no rows selected"
    n_nonnull = 40 - len([i for i in range(40) if i % 7 == 3])
    assert all(r.area is not None for r in out)
    endpoints = [r for r in out if r.bucket in (-1, 5)]
    assert {r.bucket for r in endpoints} == {-1, 5}
    assert all(r.area == -1 for r in endpoints)
    interior = [r for r in out if r.bucket not in (-1, 5)]
    assert all(r.area >= 0 for r in interior)
    # the NULL rows can never be selected (they were dropped up front)
    null_ids = {i for i in range(40) if i % 7 == 3}
    assert not null_ids & {r.event_id for r in out}
    # first/last NON-NULL points are the kept endpoints
    kept_ids = {r.event_id for r in endpoints}
    non_null = sorted(set(range(40)) - null_ids)
    assert kept_ids == {non_null[0], non_null[-1]}, (kept_ids, n_nonnull)


# ---------------------------------------------------------------------------
# Round-11 operators (mx04 / qa08 / sp15 / lo04) — invariants
# ---------------------------------------------------------------------------


def test_mx04_waterfill_invariants(spark, sf_dir):
    """Budget conservation (floor under-spend bounded by the uncapped
    count), cap respected, capped flag consistent with the water level,
    and capped sources exactly exhaust their cap."""
    from ntripmonitor_spark.plans import REGISTRY

    rows = REGISTRY["mx04_unimax_waterfill"].fn(spark, sf_dir).collect()
    assert rows
    total_chars = sum(r.n_chars_total for r in rows)
    budget = 2 * total_chars
    spent = sum(r.alloc_chars for r in rows)
    n_uncapped = sum(1 for r in rows if not r.capped)
    assert 0 <= budget - spent <= max(n_uncapped, 1), (budget, spent)
    water = rows[0].water_chars
    for r in rows:
        assert r.cap_chars == 4 * r.n_chars_total
        assert r.alloc_chars <= r.cap_chars
        assert r.water_chars == water
        if r.capped:
            assert r.alloc_chars == r.cap_chars and r.cap_chars <= water
        else:
            assert r.alloc_chars == water and r.cap_chars > water
        assert 0 <= r.epochs_e4 <= 4 * 10000 + 1


def test_qa08_bins_partition_the_corpus(spark, sf_dir):
    """Bins are deciles of the score, counts partition the corpus, and
    frac_pos/mean/gap are mutually consistent integers."""
    import duckdb

    from ntripmonitor_spark.plans import REGISTRY

    rows = REGISTRY["qa08_calibration_bins"].fn(spark, sf_dir).collect()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.n for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0 <= r.n_pos <= r.n
        assert 0 <= r.frac_pos_ppm <= 1000000
        assert r.gap_ppm == abs(r.mean_p_ppm - r.frac_pos_ppm)


def test_sp15_allocations_sum_to_budget(spark, sf_dir):
    """Both Hamilton allocations sum to exactly 1000, and the Neyman
    shift moves rows toward higher-variance strata relative to
    proportional."""
    from ntripmonitor_spark.plans import REGISTRY

    rows = REGISTRY["sp15_neyman_allocation"].fn(spark, sf_dir).collect()
    assert sum(r.n_prop for r in rows) == 1000
    assert sum(r.n_neyman for r in rows) == 1000
    assert all(r.sd_e3 >= 0 for r in rows)
    if len({r.sd_e3 for r in rows}) > 1:
        hi = max(rows, key=lambda r: r.sd_e3)
        lo = min(rows, key=lambda r: r.sd_e3)
        # ratio n_neyman/n_prop must not be lower for the highest-S
        # stratum than for the lowest-S one
        assert hi.n_neyman * lo.n_prop >= lo.n_neyman * hi.n_prop


def test_lo04_plan_covers_all_rows(spark, sf_dir):
    """Ceil divisions: n_files >= 1 and files x rows_per_file cover the
    partition's rows without a >1-file overshoot."""
    from ntripmonitor_spark.plans import REGISTRY

    rows = REGISTRY["lo04_compaction_plan"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_files >= 1
        assert r.rows_per_file * r.n_files >= r.n_rows
        assert r.rows_per_file * (r.n_files - 1) < r.n_rows
        assert r.est_bytes >= 64 * r.n_rows
