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
