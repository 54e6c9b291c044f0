"""Parallelism invariance: a 100 TB job reruns with different
executor counts, AQE decisions, and retry layouts — results must not
depend on shuffle partitioning. Re-plan float-sensitive queries under
a different spark.sql.shuffle.partitions and require canonically
identical output (this is the property the decimal-aggregation and
rounded-before-compare disciplines exist to guarantee)."""

from __future__ import annotations

import pytest

from ntripmonitor_spark.plans import REGISTRY

# The float-heavy / ordering-sensitive set most likely to betray a
# summation-order dependence.
QUERIES = [
    "q01_pricing_summary", "q05_rate_normalization", "q21_rollup_hierarchy",
    "an04_ewma_drift", "an05_seasonal_decompose", "ig02_loss_aware_mix",
    "tx07_unigram_surprisal", "tx10_bigram_nll", "tx14_stupid_backoff",
    "cu05_ccnet_buckets", "ws01_weighted_sample", "qa03_robust_outliers",
    "sk02_kmv_set_algebra", "ts02_ohlc_downsample", "fn03_user_growth",
    "sj02_salted_join", "dq01_table_profile", "lr01_grouped_regression",
    # round-5 loop-unrolled trainers: iterated float aggregates are the
    # most summation-order-sensitive plans in the repo; dq02 pins HLL
    # merge-order invariance
    "lr02_logreg_quality", "ss07_ivf_train_full", "dq02_profile_approx",
    # round-7: CC-backed split/survivor (iterative min-label joins),
    # bounded-pair source overlap, percentile latency aggregate
    "sp08_cluster_split", "dd12_quality_survivor", "mx01_source_overlap",
    "fn04_conversion_latency",
    # round-7 waves 2-4: decimal-carried credit/TWAP/HT/matvec/DCG sums,
    # greedy MMR decimal scoring, calibration bucket means
    "fn06_linear_attribution", "ts03_twap_locf", "sp10_pps_resample",
    "ss14_mmr_rerank", "ss15_power_iteration", "mx02_mixture_epochs",
    "dd13_lsh_calibration", "rc02_ndcg_eval",
    # round-7 wave 6: CUSUM cumsum/running-min identity over rounded
    # bucket means, decimal-carried winsorized/TTR/chi-square means
    "an06_cusum_shift", "qa04_winsorized_mean", "dq04_benford",
    "tx18_lexical_diversity",
    # round-7 wave 7: decimal-carried excess means and RANGE-frame sums
    "an07_mean_excess", "q30_range_frame",
    # round-7 wave 8: decimal-carried ACF quotients, fertility ratios
    "an08_autocorrelation", "tk02_fertility",
    # round-7 wave 9: pairwise-slope median, exploded rolling distinct
    "an09_theil_sen", "fn08_rolling_dau",
    # round-7 wave 10: percentile-threshold phase cut, zone-map floors
    "tp07_curriculum_order", "lo03_layout_matrix",
    # round-7 wave 11: one-scan threshold flags, fp-window inflation
    "cu06_threshold_sweep", "dd15_dup_inflation",
    # round-7 wave 12: median-sign run counting, FK orphan audit
    "an10_runs_test", "dq06_referential_integrity",
    # round-7 wave 13: decimal-carried sequence surprisal, flag algebra
    "mk02_sequence_nll", "cu07_gate_ablation",
    # round-7 wave 14: rounded-deviation pick in the downsampler
    "ts05_downsample_extremes",
    # round-8: histogram-quantile interpolation over double grids,
    # LSH-vs-exact confusion ratios, variance-ratio strengths over raw
    # quantized components, single-pass JS nano-bit sums, replay ledger
    "qa05_histogram_quantiles", "dd17_lsh_recall", "an11_seasonal_strength",
    "dp03_js_matrix", "rt11_package_ledger", "an12_period_power",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in r) for r in df.select(cols).collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_shuffle_partitioning(spark, sf_dir, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    fn = REGISTRY[name].fn
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _canon(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = _canon(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, f"{name}: result depends on shuffle partitioning"


# Join-strategy-sensitive set: AQE rewrites joins (broadcast promotion,
# skew split) at runtime — results must not depend on whether it runs.
AQE_QUERIES = [
    "sj01_salted_distinct", "sj02_salted_join", "dd03_minhash_lsh",
    "ss11_ivfpq_search", "q09_three_way_join", "rj01_range_join",
    # round-7: LSH-edge cluster split (banded self-join + CC),
    # posting-probe boolean retrieval (anti-join exclusion)
    "sp09_cluster_split_lsh", "in04_boolean_probe",
    # round-7 waves 3-4: fixed-point PageRank (iterative joins over the
    # banded edge list), candidate-gated exact-jaccard calibration
    "gr04_pagerank", "dd13_lsh_calibration",
    # round-7 wave 6: oriented triangle enumeration (edge-edge joins),
    # CDC chunk-hash window dedup, positional posting-pair join
    "gr05_triangle_stats", "dd14_cdc_chunks", "in05_proximity_rank",
    # round-7 wave 7: iterative semi-join peeling, IVF cell radius join
    "gr06_kcore", "ss17_radius_search",
    # round-7 wave 8: CC + majority-vote join survivorship
    "er05_golden_record",
]


@pytest.mark.parametrize("name", AQE_QUERIES)
def test_result_invariant_to_aqe(spark, sf_dir, name):
    """The driver (and any production cluster) may run with AQE on or
    off; runtime join re-planning must never change answers."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    fn = REGISTRY[name].fn
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        a = _canon(fn(spark, sf_dir))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        b = _canon(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert a == b, f"{name}: result depends on AQE"
