"""Round-12 behavior pins: memo hardening (round-11 ADVICE), the
distance-table codegen kernel, and the streaming bench leg's helper.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_memo_collision_falls_back_to_fresh_build(spark, sf_dir):
    """A 32-bit semanticHash collision must NOT serve the wrong cached
    relation: on a key hit whose stored input plan is NOT
    semantically equal, _hq_memoized must rebuild (round-11 ADVICE).
    Simulated by planting a cache entry under the new input's key with
    a DIFFERENT stored input plan and a poisoned cached relation."""
    from ntripmonitor_spark.operators import stats
    from ntripmonitor_spark.tables import table

    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    other = table(spark, sf_dir, "documents")  # different plan
    key = ("cum", id(ev.sparkSession), ev.semanticHash(), "value", "event_type", 128)
    poisoned = other.limit(1)
    stats._HQ_MEMO[key] = (other, poisoned)
    try:
        got = stats.hq_cum(table(spark, sf_dir, "events"))
        assert got is not poisoned, "collision served the wrong relation"
        # and the result is the real cum relation, not the poison
        assert "cum" in got.columns and "n_total" in got.columns
    finally:
        stats._HQ_MEMO.pop(key, None)


def test_memo_rearms_persist_after_clearcache(spark, sf_dir):
    """catalog.clearCache() (bench drains between timed queries) strips
    the persist marker from the memoized relation; the next hit must
    re-arm it so multi-consumer plans keep their one-scan shape."""
    from ntripmonitor_spark.operators.stats import clear_hq_memo, hq_cum
    from ntripmonitor_spark.tables import table

    clear_hq_memo()
    ev = table(spark, sf_dir, "events")
    rel = hq_cum(ev)
    rel.count()
    assert rel.storageLevel.useMemory or rel.storageLevel.useDisk
    spark.catalog.clearCache()
    assert not (rel.storageLevel.useMemory or rel.storageLevel.useDisk)
    rel2 = hq_cum(table(spark, sf_dir, "events"))
    assert rel2 is rel
    assert rel2.storageLevel.useMemory or rel2.storageLevel.useDisk
    clear_hq_memo()


def test_clear_hq_memo_unpersists_and_empties(spark, sf_dir):
    """clear_hq_memo must unpersist every cached relation and empty the
    memo (round-11 ADVICE: the memo never evicted, so cross-sf sweeps
    accumulated corpus-sized persisted blocks for the process)."""
    from ntripmonitor_spark.operators import stats
    from ntripmonitor_spark.tables import table

    stats.clear_hq_memo()
    rel = stats.hq_cum(table(spark, sf_dir, "events"))
    rel.count()
    assert stats._HQ_MEMO
    stats.clear_hq_memo()
    assert not stats._HQ_MEMO
    assert not (rel.storageLevel.useMemory or rel.storageLevel.useDisk)


def test_dist_table_matches_unrolled_form(spark):
    """The one-lambda transform kernel must emit the exact values of
    the k-unrolled aggregate form it replaced (same element order,
    same IEEE chain — the codegen shrink must be value-invisible)."""
    from ntripmonitor_spark.operators.simsearch import _dist_table, _seed_dists

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0],), ([0.5, -1.0, 4.0],)], "v array<double>"
    )
    seeds = [(0, [0.0, 0.0, 0.0]), (1, [1.0, 2.0, 3.0]), (2, [-1.0, 5.0, 0.25])]
    got = df.select(_seed_dists(F.col("v"), seeds).alias("d")).collect()
    # unrolled reference computed in python with identical op order
    import math

    for row, vec in zip(got, [[1.0, 2.0, 3.0], [0.5, -1.0, 4.0]]):
        for j, (_, s) in enumerate(seeds):
            acc = 0.0
            for a, b in zip(vec, s):
                acc = acc + (a - b) * (a - b)
            want = math.floor(acc * 10**6 + 0.5) / 10**6 if acc >= 0 else acc
            assert abs(row["d"][j] - round(acc, 6)) < 1e-12


def test_sub_codebook_slices_subspace_major(spark):
    """_sub_codebook(seeds, s, d) must carry subspace s's sub-vectors
    in seed order — the ADC digit indexing depends on it."""
    from ntripmonitor_spark.operators.simsearch import _sub_codebook

    seeds = [(0, [1.0, 2.0, 3.0, 4.0]), (1, [5.0, 6.0, 7.0, 8.0])]
    df = spark.range(1)
    row = df.select(_sub_codebook(seeds, 1, 2).alias("cb")).collect()[0]
    assert row["cb"] == [[3.0, 4.0], [7.0, 8.0]]
