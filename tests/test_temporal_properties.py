"""Property-based cross-checks for the temporal operators: random
small event logs, Spark result vs a brute-force O(n²) Python reference.
These hunt exactly the bugs the DuckDB oracle can miss on one fixed
dataset — tie-breaking at equal timestamps, interval boundary
inclusion/exclusion, bucket-edge pairs, empty stages.

Hypothesis drives the datasets; one shared SparkSession keeps each
example cheap (~0.2 s), so examples are capped low but rerun with new
seeds every round.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ntripmonitor_spark.operators import joins

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user_id
        st.integers(min_value=0, max_value=2000),   # ts seconds
        st.booleans(),                              # is right-side / interval row
    ),
    min_size=1,
    max_size=25,
)


def _df(spark, rows):
    import pyspark.sql.functions as F

    data = [
        (i, u, s, "error" if flag else "view")
        for i, (u, s, flag) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, sec long, event_type string"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec"))).drop("sec")


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=EVENTS)
def test_asof_join_matches_bruteforce(spark, rows):
    import pyspark.sql.functions as F

    got = {
        r["event_id"]: r["gap_us"]
        for r in joins.asof_join_latest(
            _df(spark, rows), F.col("event_type") == "error"
        ).collect()
    }
    want = {}
    for i, (u, s, flag) in enumerate(rows):
        if flag:
            continue
        prior = [ps for (pu, ps, pflag) in rows if pflag and pu == u and ps <= s]
        want[i] = (s - max(prior)) * 1_000_000 if prior else None
    assert got == want


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=EVENTS)
def test_range_join_matches_bruteforce(spark, rows):
    import pyspark.sql.functions as F

    length_s = 300
    got = {
        (r["event_id"], r["interval_id"])
        for r in joins.range_join_intervals(
            _df(spark, rows), F.col("event_type") == "error", length_s=length_s
        ).collect()
    }
    want = set()
    for i, (u, s, flag) in enumerate(rows):
        if flag:
            continue
        for j, (iu, istart, iflag) in enumerate(rows):
            if iflag and iu == u and istart <= s < istart + length_s:
                want.add((i, j))
    assert got == want


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=EVENTS)
def test_funnel_matches_bruteforce(spark, rows):
    stages = [("view", "view_ts"), ("error", "error_ts")]
    got = {
        r["user_id"]: (r["view_ts"], r["error_ts"])
        for r in joins.event_funnel(_df(spark, rows), stages).collect()
    }
    want = {}
    for u in {u for (u, _, _) in rows}:
        views = [s for (pu, s, flag) in rows if pu == u and not flag]
        t1 = min(views) if views else None
        t2 = None
        if t1 is not None:
            errs = [s for (pu, s, flag) in rows if pu == u and flag and s > t1]
            t2 = min(errs) if errs else None
        want[u] = (t1, t2)
    import datetime as dt

    def ts(x):
        return None if x is None else dt.datetime.fromtimestamp(x, dt.timezone.utc).replace(tzinfo=None)

    want_ts = {u: (ts(a), ts(b)) for u, (a, b) in want.items()}
    got_naive = {
        u: tuple(None if v is None else v.replace(tzinfo=None) for v in pair)
        for u, pair in got.items()
    }
    assert got_naive == want_ts


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=EVENTS)
def test_asof_nearest_matches_bruteforce(spark, rows):
    """direction='nearest' semantics: smallest absolute gap before or
    after, ties to the backward match (an equal-ts right row is a
    backward gap-0 match and always wins)."""
    import pyspark.sql.functions as F

    got = {
        r["event_id"]: r["gap_us"]
        for r in joins.asof_join_nearest(
            _df(spark, rows), F.col("event_type") == "error"
        ).collect()
    }
    want = {}
    for i, (u, s, flag) in enumerate(rows):
        if flag:
            continue
        prior = [ps for (pu, ps, pflag) in rows if pflag and pu == u and ps <= s]
        later = [ps for (pu, ps, pflag) in rows if pflag and pu == u and ps > s]
        b = (s - max(prior)) * 1_000_000 if prior else None
        f = (min(later) - s) * 1_000_000 if later else None
        if b is not None and (f is None or b <= f):
            want[i] = b
        else:
            want[i] = f
    assert got == want


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=EVENTS)
def test_interval_overlap_matches_bruteforce(spark, rows):
    """Overlap pairs and lengths vs the O(n²) definition — hunting the
    bucket-crediting bugs (double-counted pairs at bucket boundaries,
    pairs whose shared bucket isn't the later start's)."""
    import pyspark.sql.functions as F

    a_len, b_len = 7, 13  # seconds; co-prime with the grain-min rule
    got = {
        (r["a_id"], r["b_id"]): r["overlap_s"]
        for r in joins.interval_overlap_join(
            _df(spark, rows),
            F.col("event_type") == "error",
            F.col("event_type") == "view",
            a_len_s=a_len, b_len_s=b_len,
        ).collect()
    }
    want = {}
    for i, (u, s, flag) in enumerate(rows):
        if not flag:
            continue
        a0, a1 = s, s + a_len
        for j, (u2, s2, flag2) in enumerate(rows):
            if flag2 or u2 != u:
                continue
            b0, b1 = s2, s2 + b_len
            if a0 < b1 and b0 < a1:
                want[(i, j)] = min(a1, b1) - max(a0, b0)
    assert got == want
