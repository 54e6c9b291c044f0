"""Physical-plan quality guards (the SCALE.md §5 audit, pinned).

These tests assert plan *shape*, not results: column pruning reaches
the parquet scan, range predicates push down, dimension joins broadcast
(no sort-merge of the fact side), and the pure-filter operators compile
to zero exchanges. A regression here means a future change silently
re-introduced a shuffle or un-pruned a scan — the kind of thing that is
invisible at sf0.01 and fatal at 100 TB.
"""

from __future__ import annotations

import re

import pytest

from ntripmonitor_spark.plans import REGISTRY


def _explain(spark, name, sf_dir):
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _exchanges(plan: str) -> int:
    # numbered operator lines, excluding reuse nodes
    return len(re.findall(r"^\(\d+\) (?:Exchange|BroadcastExchange)\b", plan, re.M)) - len(
        re.findall(r"^\(\d+\) BroadcastExchange\b", plan, re.M)
    )


def test_pure_filters_have_zero_exchanges(spark, sf_dir):
    for name in ("sp01_stratified_sample", "tx02_quality_score", "tx03_token_count"):
        plan = _explain(spark, name, sf_dir)
        assert _exchanges(plan) == 0, f"{name}: unexpected shuffle\n{plan[:2000]}"


def test_window_agg_single_shuffle(spark, sf_dir):
    for name in ("q01_pricing_summary", "q02_tumbling_window", "q05_rate_normalization"):
        plan = _explain(spark, name, sf_dir)
        assert _exchanges(plan) == 1, f"{name}: expected exactly one (agg) shuffle"


def test_dim_joins_broadcast_not_sortmerge(spark, sf_dir):
    for name in ("q07_dim_join", "q08_semi_join", "q09_three_way_join"):
        plan = _explain(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, f"{name}: dimension join not broadcast"
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"{name}: fact-side sort-merge crept in"


def test_scan_column_pruning(spark, sf_dir):
    plan = _explain(spark, "tx02_quality_score", sf_dir)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no parquet ReadSchema found"
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}, f"documents scan reads extra columns: {cols}"


def test_time_range_predicate_pushdown(spark, sf_dir):
    plan = _explain(spark, "q08_semi_join", sf_dir)
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(o_orderdate", plan), (
        "orderdate range filter not pushed to the orders scan"
    )


def test_connected_components_log_rounds(spark):
    """dd06 scale guard: pointer doubling must converge a 64-node CHAIN
    (worst-case diameter) in O(log n) rounds, not O(n)."""
    from ntripmonitor_spark.operators.dedup import connected_components

    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels, rounds = connected_components(nodes, edges, max_iter=20)
    rows = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert rows == {i: 0 for i in range(n)}, "chain did not fully contract"
    assert rounds <= 10, f"chain of 64 took {rounds} rounds (pointer doubling broken?)"


def test_tx07_scoring_stage_shuffle_free(spark, sf_dir):
    """tx07's SCORING plan must be a pure column fold: the fitted
    vocab rides in as a literal map, so after model-fit (a separate
    job) the per-doc scan compiles to zero exchanges."""
    plan = _explain(spark, "tx07_unigram_surprisal", sf_dir)
    assert _exchanges(plan) == 0, f"tx07 scoring shuffles\n{plan[:2000]}"


def test_sp03_corpus_never_shuffles(spark, sf_dir):
    """sp03: the only exchange feeds the tiny per-source count agg;
    the corpus side reaches the filter via a broadcast join."""
    plan = _explain(spark, "sp03_source_mixing", sf_dir)
    assert "BroadcastHashJoin" in plan, "rates join not broadcast"
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, "corpus shuffled for the rates join"
    assert _exchanges(plan) <= 1, f"extra corpus shuffle\n{plan[:2000]}"


def test_ss03_candidates_deduped_before_vectors(spark, sf_dir):
    """ss03: the candidate join must move signatures, not embeddings —
    query side broadcast, no sort-merge on the signature stack."""
    plan = _explain(spark, "ss03_ann_lsh_multitable", sf_dir)
    assert "BroadcastHashJoin" in plan, "query stack not broadcast"


def test_cu01_funnel_shape(spark, sf_dir):
    """cu01: rates join broadcast (corpus never sort-merged); the only
    corpus-sized shuffles are the content-hash dedup window and the
    per-source pack window."""
    plan = _explain(spark, "cu01_curation_funnel", sf_dir)
    assert "BroadcastHashJoin" in plan, "rates join not broadcast"
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, "corpus sort-merge crept in"


def test_temporal_joins_never_nested_loop(spark, sf_dir):
    """aj01/rj01 exist precisely to avoid the inequality-join trap:
    neither plan may contain a BroadcastNestedLoopJoin or
    CartesianProduct — as-of compiles to one window pass, range join
    to an equi hash join on (key, bucket)."""
    for name in ("aj01_asof_join", "rj01_range_join", "rj02_interval_overlap"):
        plan = _explain(spark, name, sf_dir)
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} degenerated\n{plan[:1500]}"
        assert "CartesianProduct" not in plan, f"{name} degenerated\n{plan[:1500]}"
    aj = _explain(spark, "aj01_asof_join", sf_dir)
    assert "Window" in aj, "as-of join lost its window formulation"


def test_dc01_benchmark_side_broadcasts(spark, sf_dir):
    """dc01: both benchmark joins must broadcast — the corpus side may
    never sort-merge against the (tiny) benchmark shingle set."""
    plan = _explain(spark, "dc01_decontamination", sf_dir)
    assert "BroadcastHashJoin" in plan, "benchmark join not broadcast"
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"corpus sort-merged\n{plan[:1500]}"


def test_packing_shards_within_source(spark, sf_dir):
    """tp01/tp02/cu01: the pack window must partition by (source,
    shard), never source alone — one-task-per-source serializes a
    dominant source at 100 TB and AQE cannot split a window partition."""
    for name in ("tp01_sequence_pack", "tp02_sorted_pack", "cu01_curation_funnel"):
        plan = _explain(spark, name, sf_dir)
        parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        pack_parts = [p for p in parts if "source" in p and "shard" in p]
        assert pack_parts, f"{name}: pack window not sharded within source\n{plan[:2000]}"


def test_packing_parallel_within_single_source(spark):
    """Skewed fixture: ONE source holding every doc still packs across
    >1 shard (so >1 task), and shard-local pack ids stay dense from 0."""
    from ntripmonitor_spark.operators.sampling import (
        PACK_SHARD_STRIDE,
        sequence_pack,
    )

    docs = spark.createDataFrame(
        [(i, "only-source", "tok " * (1 + i % 7)) for i in range(400)],
        "doc_id long, source string, text string",
    )
    packed = sequence_pack(docs, pack_tokens=32).collect()
    shards = {r.pack_id // PACK_SHARD_STRIDE for r in packed}
    assert len(shards) > 1, "single source collapsed to one shard/task"
    for s in shards:
        local = sorted(r.pack_id % PACK_SHARD_STRIDE for r in packed
                       if r.pack_id // PACK_SHARD_STRIDE == s)
        assert local[0] == 0 and local[-1] == len(set(local)) - 1


def test_dd02_df_cap_kills_hot_shingles(spark):
    """dd02 scale guard: a stopword gram present in EVERY doc must not
    generate candidate pairs. 60 docs all sharing one hot 3-gram but
    otherwise disjoint → with the DF cap the join yields zero pairs;
    without it, the hot shingle alone would emit C(60,2)=1770
    candidates. Two genuinely near-dup docs must still be found."""
    from ntripmonitor_spark.operators.dedup import ngram_jaccard_pairs

    hot = "of the and"
    rows = [(i, f"{hot} u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(60)]
    rows.append((1000, "real dup text body shared across both copies"))
    rows.append((1001, "real dup text body shared across both copies"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.6).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert got == {(1000, 1001)}, f"expected only the true dup pair, got {sorted(got)[:10]}"


def test_dd04_fit_is_join_free(spark, sf_dir):
    """dd04 scale guard: the signature fit must not join a vocabulary
    bit table onto the token relation (64× shuffle amplification) —
    bits come from arithmetic on md5 chunks, so the fit is zero joins
    and ≤3 exchanges ((doc,tok) count + per-doc vote sums + the
    ensure_parallelism respread of the under-split small fixture)."""
    from ntripmonitor_spark.operators.dedup import simhash_signatures
    from ntripmonitor_spark.tables import table

    # Earlier tests may leave a persisted signature relation in the cache
    # manager; the cache-substituted plan string nests the original plan
    # (initial + final AQE sections), double-counting its exchanges.
    spark.catalog.clearCache()
    df = simhash_signatures(table(spark, sf_dir, "documents"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Join" not in plan, f"vocab join crept back into the fit\n{plan[:2000]}"
    assert _exchanges(plan) <= 3, f"fit shuffles more than expected\n{plan[:2000]}"


def test_ss05_pq_encode_is_scan_only(spark, sf_dir):
    """PQ encoding is pure column arithmetic over one corpus scan: no
    joins and at most the ensure_parallelism respread of an
    under-split small fixture — never a data-dependent shuffle."""
    spark.catalog.clearCache()
    plan = _explain(spark, "ss05_pq_encode", sf_dir)
    assert "Join" not in plan, f"codebook join crept into PQ encode\n{plan[:2000]}"
    assert _exchanges(plan) <= 1, f"PQ encode shuffles\n{plan[:2000]}"


def test_ss06_ivf_probe_corpus_never_shuffled(spark, sf_dir):
    """IVF serving: candidate generation must be a broadcast hash join
    of the (tiny) probe set onto the corpus cell column — a sort-merge
    or nested-loop join here would shuffle/replicate the corpus."""
    spark.catalog.clearCache()
    plan = _explain(spark, "ss06_ivf_probe", sf_dir)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"corpus shuffled for probe join\n{plan[:2000]}"
    assert "BroadcastNestedLoopJoin" not in plan, f"cartesian probe join\n{plan[:2000]}"
    assert "BroadcastHashJoin" in plan, f"expected broadcast probe join\n{plan[:2000]}"


def test_qa01_exact_quantiles_single_exchange(spark, sf_dir):
    """Exact per-group percentile = one partial+final aggregate pair:
    exactly one exchange, keyed on the group column."""
    spark.catalog.clearCache()
    plan = _explain(spark, "qa01_quantile_thresholds", sf_dir)
    assert _exchanges(plan) == 1, f"quantile agg shuffles more than once\n{plan[:2000]}"


def test_approx_quantiles_tracks_exact(spark, sf_dir):
    """The sketch-based scale path: approx_percentile returns a group
    MEMBER (no interpolation) with rank error < 1 at this accuracy on
    these group sizes — so each approx value must be one of the two
    order statistics bracketing the target rank q·(n−1)."""
    import math

    from ntripmonitor_spark.operators import stats
    from ntripmonitor_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    approx = {r["source"]: r for r in stats.approx_quantiles(docs).collect()}
    groups: dict[str, list[int]] = {}
    for r in docs.select("source", "n_chars").collect():
        groups.setdefault(r["source"], []).append(r["n_chars"])
    assert set(groups) == set(approx)
    for src, vals in groups.items():
        vals.sort()
        a = approx[src]
        assert a["n_docs"] == len(vals)
        for q, p in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            pos = q * (len(vals) - 1)
            allowed = {vals[math.floor(pos)], vals[math.ceil(pos)]}
            assert a[p] in allowed, f"{src} {p}: approx={a[p]} not in {allowed}"


def test_dc02_bloom_probe_filters_before_join(spark, sf_dir):
    """dc02: the corpus must reach the exact confirming join through
    the Bloom probe FILTER (element_at word probes in the plan) — the
    whole point is that the corpus is filtered by literal arithmetic,
    not joined against the full benchmark set."""
    spark.catalog.clearCache()
    plan = _explain(spark, "dc02_decontamination_bloom", sf_dir)
    assert "element_at" in plan, f"bloom probe missing from corpus path\n{plan[:2000]}"
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_cu02_thresholds_broadcast(spark, sf_dir):
    """cu02: the per-source quantile thresholds (tiny) must broadcast
    onto the corpus scan — never sort-merge the corpus against them."""
    spark.catalog.clearCache()
    plan = _explain(spark, "cu02_adaptive_gate", sf_dir)
    assert "BroadcastHashJoin" in plan, f"thresholds join not broadcast\n{plan[:2000]}"
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"corpus sort-merged\n{plan[:2000]}"


def test_sn01_single_exchange_pruned_scan(spark, sf_dir):
    """sn01 (VERDICT r2 #6): sessionization is ONE exchange on the
    session key, and Catalyst prunes the events scan to (ts, user_id)
    — the payload columns never ride the window shuffle."""
    spark.catalog.clearCache()
    plan = _explain(spark, "sn01_user_sessions", sf_dir)
    assert _exchanges(plan) == 1, f"sessionization shuffles more than once\n{plan[:2000]}"
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"ts", "user_id"}, f"window shuffle carries extra columns: {cols}"


def test_tp03_split_math_and_plan(spark, sf_dir):
    """tp03: a 300-token doc yields chunks (128, 128, 44), an empty doc
    one zero-length chunk; and the plan is a pure generate — zero
    exchanges, no join (the oracle corpus only has single-chunk docs,
    so the multi-chunk arithmetic is pinned here)."""
    from ntripmonitor_spark.operators.sampling import split_long_docs

    docs = spark.createDataFrame(
        [(1, "s", "tok " * 300), (2, "s", "")],
        "doc_id long, source string, text string",
    )
    rows = {(r["doc_id"], r["chunk_idx"]): r["chunk_len"]
            for r in split_long_docs(docs, 128).collect()}
    assert rows == {(1, 0): 128, (1, 1): 128, (1, 2): 44, (2, 0): 0}, rows

    spark.catalog.clearCache()
    plan = _explain(spark, "tp03_split_long_docs", sf_dir)
    assert _exchanges(plan) == 0, f"split shuffles\n{plan[:2000]}"
    assert "Join" not in plan, f"split joins\n{plan[:2000]}"


def test_ivf_train_loop_converges(spark, sf_dir):
    """ss04's driver loop made real: three Lloyd rounds on the
    embeddings table must produce non-increasing inertia (within the
    1e-6 rounding slack) and k full-dimension centroids."""
    from ntripmonitor_spark.operators.simsearch import ivf_train
    from ntripmonitor_spark.tables import table

    cents, hist = ivf_train(table(spark, sf_dir, "embeddings"), k=4, iters=3)
    assert len(cents) == 4 and all(len(vec) == 64 for _, vec in cents)
    assert len(hist) == 3
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-3, f"inertia increased across rounds: {hist}"


def test_kmv_estimator_accuracy(spark):
    """KMV statistical sanity: k=64 on 2000 distinct members must land
    within ~3/sqrt(k) (≈37%) of truth — a loose bound that still
    catches an off-by-2^x or inverted estimator."""
    from ntripmonitor_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("g", i) for i in range(2000)], "event_type string, user_id long"
    )
    row = kmv_distinct(df, k=64).first()
    assert row["exact_distinct"] == 2000
    assert abs(row["kmv_estimate"] - 2000) / 2000 < 0.4, row["kmv_estimate"]


def test_fn01_funnel_single_exchange(spark, sf_dir):
    """fn01: all three chained funnel stages plus the final per-key
    reduction must plan on ONE exchange (the key partitioning is
    reused across every window pass) — per-stage scans or joins would
    multiply the corpus cost by the funnel depth."""
    spark.catalog.clearCache()
    plan = _explain(spark, "fn01_conversion_funnel", sf_dir)
    assert _exchanges(plan) == 1, f"funnel shuffles per stage\n{plan[:2000]}"
    assert "Join" not in plan, f"funnel joins crept in\n{plan[:2000]}"


def test_fn02_no_self_join_two_exchanges(spark, sf_dir):
    """fn02: cohort assignment is a window min, not a first-seen
    self-join — the event log must never appear twice in the plan; two
    exchanges total (key window + final aggregate)."""
    spark.catalog.clearCache()
    plan = _explain(spark, "fn02_cohort_retention", sf_dir)
    assert "Join" not in plan, f"cohort self-join crept in\n{plan[:2000]}"
    assert _exchanges(plan) <= 2, f"retention shuffles more than twice\n{plan[:2000]}"


def test_an01_single_exchange_no_join(spark, sf_dir):
    """an01: the rolling-statistics anomaly scan is ONE key-partitioned
    window pass — a second exchange or a join would mean the rolling
    frame got re-expressed as a self-join."""
    spark.catalog.clearCache()
    plan = _explain(spark, "an01_rolling_zscore", sf_dir)
    assert _exchanges(plan) == 1, f"an01 shuffles more than once\n{plan[:2000]}"
    assert "Join" not in plan, f"an01 rolling frame became a join\n{plan[:2000]}"


def test_ts01_two_exchanges_no_nested_loop(spark, sf_dir):
    """ts01: bucket aggregation + spine window, both keyed by user —
    two exchanges; the spine↔observed attach must be an equi
    (hash/broadcast) join, never a nested loop."""
    spark.catalog.clearCache()
    plan = _explain(spark, "ts01_gap_fill", sf_dir)
    assert _exchanges(plan) <= 2, f"ts01 extra shuffles\n{plan[:2000]}"
    assert "NestedLoop" not in plan and "Cartesian" not in plan, (
        f"ts01 spine join degenerated\n{plan[:2000]}"
    )


def test_in01_two_exchanges(spark, sf_dir):
    """in01: (doc,term) tf aggregate + term-keyed posting aggregate =
    two exchanges, join-free."""
    spark.catalog.clearCache()
    plan = _explain(spark, "in01_inverted_index", sf_dir)
    assert _exchanges(plan) == 2, f"in01 unexpected shuffle count\n{plan[:2000]}"
    assert "Join" not in plan, f"in01 join crept in\n{plan[:2000]}"


def test_tx08_single_exchange_sort_limited(spark, sf_dir):
    """tx08: one pair-keyed aggregate exchange; the top-n must compile
    to TakeOrderedAndProject (only top_n rows move to the driver-side
    limit), not a global Sort."""
    spark.catalog.clearCache()
    plan = _explain(spark, "tx08_bpe_pairs", sf_dir)
    assert _exchanges(plan) == 1, f"tx08 unexpected shuffles\n{plan[:2000]}"
    assert "TakeOrderedAndProject" in plan, f"tx08 global sort instead of top-k\n{plan[:2000]}"


def test_bm01_no_sortmerge_stats_broadcast(spark, sf_dir):
    """bm01: every join (query dim, 1-row stats cross) must broadcast —
    the postings relation is the only thing allowed through an
    exchange; a SortMergeJoin would mean the corpus got shuffled onto
    a join key. Also pins the rank step to a WindowGroupLimit (top-k
    pushdown), the exchange budget (5: tf agg, df window on term,
    1-row stats partial, score agg, rank), and that only TWO parquet
    scans exist (stats + postings; the df branch must not re-scan)."""
    spark.catalog.clearCache()
    plan = _explain(spark, "bm01_bm25_topk", sf_dir)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"bm01 corpus-side sort-merge join\n{plan[:2000]}"
    assert "WindowGroupLimit" in plan, f"bm01 rank without top-k pushdown\n{plan[:2000]}"
    assert _exchanges(plan) <= 5, f"bm01 extra shuffles\n{plan[:2000]}"
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 2, f"bm01 corpus scanned more than twice\n{tree}"


def test_dd07_pairwise_is_cell_equijoin(spark, sf_dir):
    """dd07: the SemDeDup pairwise stage must be an equi-join on the
    cell id — never a cartesian/nested-loop over the corpus. (With k
    cells the join key cardinality is k; at scale k grows ~√N so
    per-cell work stays bounded.)"""
    spark.catalog.clearCache()
    plan = _explain(spark, "dd07_semantic_dedup", sf_dir)
    tree = plan.split("\n\n")[0]
    assert "Cartesian" not in tree and "NestedLoop" not in tree, (
        f"dd07 pairwise degenerated to all-pairs\n{tree}"
    )
    assert _exchanges(plan) <= 5, f"dd07 extra shuffles\n{tree}"


def test_ss08_only_intended_crossjoin(spark, sf_dir):
    """ss08: the recall harness may contain exactly ONE nested-loop —
    the brute-force side's broadcast query crossJoin (tiny build side);
    the IVF side must stay equi-joined on the cell."""
    spark.catalog.clearCache()
    plan = _explain(spark, "ss08_ann_recall", sf_dir)
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastNestedLoopJoin") <= 1, f"ss08 extra nested loops\n{tree}"
    assert "CartesianProduct" not in tree, f"ss08 cartesian crept in\n{tree}"


def test_lr01_regression_is_one_aggregate(spark, sf_dir):
    """lr01: the whole OLS fit must compile to one partial+final hash
    aggregate (regr_* = six mergeable sums) — a second exchange would
    mean the fit stopped being a pure aggregation."""
    spark.catalog.clearCache()
    plan = _explain(spark, "lr01_grouped_regression", sf_dir)
    assert _exchanges(plan) == 1, f"lr01 extra shuffles\n{plan[:2000]}"
    assert "HashAggregate" in plan


def test_mk01_single_input_scaled_exchange(spark, sf_dir):
    """mk01: one window exchange on user_id over the events scan; the
    later aggregate + normalization window run over the |types|^2
    matrix. Pin ≤3 exchanges and no join (the normalization must be a
    window over the aggregate, not a join back to the stream)."""
    spark.catalog.clearCache()
    plan = _explain(spark, "mk01_event_transitions", sf_dir)
    assert _exchanges(plan) <= 3, f"mk01 extra shuffles\n{plan[:2000]}"
    assert "Join" not in plan.split("\n\n")[0], "mk01 normalization joined instead of windowed"


def test_cm01_countmin_overestimates_and_broadcasts(spark, sf_dir):
    """CMS invariant: estimate ≥ exact for every heavy hitter; plan:
    the probe side broadcasts (no sort-merge), and no nested loop."""
    spark.catalog.clearCache()
    from ntripmonitor_spark.plans import REGISTRY

    df = REGISTRY["cm01_countmin_heavy_hitters"].fn(spark, sf_dir)
    rows = df.collect()
    assert rows, "no heavy hitters returned"
    assert all(r.n_cms >= r.n_exact for r in rows), "CMS underestimated a count"
    plan = _explain(spark, "cm01_countmin_heavy_hitters", sf_dir)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"cm01 probe join not broadcast\n{plan[:2000]}"
    assert "BroadcastHashJoin" in plan


def test_sd01_no_join_bounded_exchanges(spark, sf_dir):
    """sd01 is explode + aggregate: no join of any kind, and at most
    two exchanges (the count-distinct rewrite's two-phase aggregate);
    the text column itself must not survive past the scan projection
    into the exchange."""
    spark.catalog.clearCache()
    plan = _explain(spark, "sd01_duplicate_spans", sf_dir)
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree, f"sd01 grew a join\n{tree}"
    assert _exchanges(plan) <= 2, f"sd01 extra shuffles\n{tree}"


def test_ig01_model_broadcasts_corpus_never_sortmerged(spark, sf_dir):
    """ig01: the 1024-row log-ratio model must broadcast onto the
    token relation — a sort-merge would shuffle the whole exploded
    corpus by bucket, the exact thing the DSIR shape avoids."""
    spark.catalog.clearCache()
    plan = _explain(spark, "ig01_dsir_weights", sf_dir)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"ig01 corpus shuffled for model join\n{plan[:2000]}"
    assert "BroadcastHashJoin" in plan


def test_sp04_two_level_rank_no_join(spark, sf_dir):
    """sp04: shard-level rank then stratum re-rank = two window
    exchanges, no join; and the survivors filter must cut before the
    global window (the second sort sees ≤ shards·k rows per stratum)."""
    spark.catalog.clearCache()
    plan = _explain(spark, "sp04_stratified_ksample", sf_dir)
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree, f"sp04 grew a join\n{tree}"
    assert _exchanges(plan) <= 2, f"sp04 extra shuffles\n{tree}"


def test_sp04_matches_single_window_and_merges(spark, sf_dir):
    """The two-level sample must equal the single-window top-k (the
    mergeable-reservoir property: top-k of shard top-ks = global
    top-k)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ntripmonitor_spark.operators import sampling
    from ntripmonitor_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    got = {(r.source, r.doc_id, r.rk) for r in sampling.stratified_ksample(docs, k=10).collect()}
    coin = F.pmod(F.col("doc_id").cast("long") * F.lit(sampling.KNUTH), F.lit(1 << 32))
    w = Window.partitionBy("source").orderBy(F.col("coin").asc(), F.col("doc_id").asc())
    ref = {
        (r.source, r.doc_id, r.rk)
        for r in docs.select("source", "doc_id", coin.alias("coin"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .collect()
    }
    assert got == ref


def test_hs01_bounded_normalization(spark, sf_dir):
    """hs01: one input-scaled aggregate; the fraction window runs over
    the groups×bins histogram only (≤2 exchanges, no join)."""
    spark.catalog.clearCache()
    plan = _explain(spark, "hs01_length_histogram", sf_dir)
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree, f"hs01 grew a join\n{tree}"
    assert _exchanges(plan) <= 2, f"hs01 extra shuffles\n{tree}"


def test_tx09_topv_via_bounded_takeordered(spark, sf_dir):
    """tx09: the top-1000 selection must compile to TakeOrdered (a
    bounded per-partition heap + driver merge), never a full global
    sort of the token-frequency table."""
    spark.catalog.clearCache()
    plan = _explain(spark, "tx09_zipf_fit", sf_dir)
    assert "TakeOrderedAndProject" in plan, f"tx09 full-sorts the frequency table\n{plan[:2000]}"


def test_countmin_partials_merge_to_batch(spark, sf_dir):
    """CMS mergeability: sketching two disjoint slices and summing the
    counter tables must equal sketching the union — the property that
    lets every executor (or every streaming window) keep its own
    counters."""
    from pyspark.sql import functions as F

    from ntripmonitor_spark.operators import sketch
    from ntripmonitor_spark.tables import table

    ev = table(spark, sf_dir, "events")
    full = {
        (r.d, r.bkt): r.cnt for r in sketch.countmin_counters(ev, "user_id").collect()
    }
    a = sketch.countmin_counters(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    b = sketch.countmin_counters(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = {
        (r.d, r.bkt): r.cnt for r in sketch.countmin_merge(a.union(b)).collect()
    }
    assert merged == full


def test_tx10_model_broadcasts_no_sortmerge(spark, sf_dir):
    """tx10: every join (model build and scoring) must broadcast —
    a sort-merge would shuffle the exploded corpus by bigram key."""
    spark.catalog.clearCache()
    plan = _explain(spark, "tx10_bigram_nll", sf_dir)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"tx10 corpus shuffled for a join\n{plan[:2000]}"
    assert "BroadcastHashJoin" in plan


def test_an02_baseline_broadcasts_stream_never_shuffles(spark, sf_dir):
    """an02: the |types|x24 baseline must broadcast onto the event
    stream — no sort-merge, no window sort of the stream itself."""
    spark.catalog.clearCache()
    plan = _explain(spark, "an02_seasonal_anomalies", sf_dir)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"an02 stream shuffled for baseline join\n{plan[:2000]}"
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan.split("\n\n")[0]


def test_ss09_codes_only_scoring(spark, sf_dir):
    """ss09: the ADC scoring scan must read codes + the broadcast
    distance tables — one intended nested-loop (tiny broadcast query
    side), never a sort-merge, and no second read of the embedding
    column on the scoring side."""
    spark.catalog.clearCache()
    plan = _explain(spark, "ss09_pq_adc_topk", sf_dir)
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" not in tree, f"ss09 corpus shuffled for query join\n{tree}"
    assert tree.count("BroadcastNestedLoopJoin") <= 1, f"ss09 extra nested loops\n{tree}"


def test_rc01_legs_broadcast_fusion_tiny(spark, sf_dir):
    """rc01: both legs keep their broadcast-query shape — the ONLY
    sort-merge allowed is the full-outer fusion itself (Spark cannot
    broadcast full-outer joins, and its inputs are ≤ queries·k_leg
    rows, so the merge is driver-scale)."""
    spark.catalog.clearCache()
    plan = _explain(spark, "rc01_hybrid_rrf", sf_dir)
    tree = plan.split("\n\n")[0]
    smjs = [ln for ln in tree.splitlines() if "SortMergeJoin" in ln]
    assert len(smjs) <= 1, f"rc01 corpus-side sort-merge crept in\n{tree[:2000]}"
    assert all("FullOuter" in ln for ln in smjs), f"non-fusion sort-merge\n{smjs}"


def test_cu03_two_corpus_exchanges_before_packer(spark, sf_dir):
    """cu03: the full pipeline must stay gate/mix-as-predicates +
    dedup window + verdict join + packer window — bound the total
    exchange count and require the benchmark shingle set to broadcast
    (the corpus never sort-merges against it)."""
    spark.catalog.clearCache()
    plan = _explain(spark, "cu03_full_pipeline", sf_dir)
    tree = plan.split("\n\n")[0]
    smjs = [ln for ln in tree.splitlines() if "SortMergeJoin" in ln]
    # the only allowed sort-merge is the per-doc verdict LEFT join —
    # it appears twice statically because the rates-agg subtree
    # recomputes the survivor relation (AQE reuses the exchange at
    # runtime); benchmark shingle joins must broadcast, nothing may
    # degenerate to a cartesian, and the packer must shard-partition.
    assert len(smjs) <= 2, f"cu03 extra sort-merges\n{tree[:2500]}"
    assert all("LeftOuter" in ln for ln in smjs), f"non-verdict sort-merge\n{smjs}"
    assert "CartesianProduct" not in tree and "BroadcastNestedLoopJoin" not in tree
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("source" in p and "shard" in p for p in parts), (
        f"cu03 pack window not sharded within source\n{plan[:2000]}"
    )


def test_tx11_sp05_pure_column_zero_exchanges(spark, sf_dir):
    # the rule gate and the hash split are scan predicates in waiting:
    # any exchange here means a 100 TB corpus pays a shuffle for a
    # per-row pure function
    for name in ("tx11_gopher_rules", "sp05_hash_split"):
        plan = _explain(spark, name, sf_dir)
        assert _exchanges(plan) == 0, f"{name}: unexpected shuffle\n{plan[:2000]}"


def test_scd01_single_keyed_exchange(spark, sf_dir):
    # run detection (lag) and interval close (lead) must share the one
    # user_id exchange; a second exchange means the window specs
    # diverged and the log shuffles twice
    plan = _explain(spark, "scd01_history", sf_dir)
    assert _exchanges(plan) == 1, f"scd01: expected one keyed shuffle\n{plan[:2000]}"
    assert "Join" not in plan, "scd01 must not self-join the event log"


def test_ss10_stats_broadcast_corpus_never_shuffled(spark, sf_dir):
    # pass 1 reduces to ONE row (partial_min/max -> single merge);
    # pass 2 must attach it by broadcast — the corpus-side relation
    # never moves
    plan = _explain(spark, "ss10_sq8_quantize", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, "ss10: stats join must broadcast"
    # corpus side: no Exchange other than the single-row aggregate's
    assert _exchanges(plan) <= 1, f"ss10: corpus-side shuffle crept in\n{plan[:2000]}"


def test_tx12_unigrams_broadcast_bigrams_shuffle_once(spark, sf_dir):
    # the corpus-sized bigram relation may shuffle once (its groupBy);
    # unigram counts and totals re-attach as broadcasts, and the final
    # top-N must be a bounded TakeOrdered, not a global sort
    plan = _explain(spark, "tx12_pmi_collocations", sf_dir)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, "tx12: PMI joins must broadcast"
    assert "TakeOrderedAndProject" in plan, "tx12: top-N should be TakeOrdered"


def test_q22_threshold_broadcast_anti_join(spark, sf_dir):
    # the 1-row cents threshold must broadcast onto the customer scan;
    # the no-orders test must plan as a real anti join, never a
    # correlated nested loop
    plan = _explain(spark, "q22_no_order_customers", sf_dir)
    assert "LeftAnti" in plan, "q22: anti join missing"
    assert "BroadcastNestedLoopJoin BuildRight, Inner" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin LeftAnti" not in plan or "Exchange" in plan  # keyed SMJ acceptable at scale


def test_an03_two_sided_windows_single_exchange(spark, sf_dir):
    # trailing and leading frames share one (user_id, ts) partitioning:
    # exactly one exchange, or the event log shuffles twice per scan
    plan = _explain(spark, "an03_mean_shift", sf_dir)
    assert _exchanges(plan) == 1, f"an03: expected one keyed shuffle\n{plan[:2000]}"


def test_tk01_encode_is_scan_only(spark, sf_dir):
    # after training, the merge table folds in as literals — encoding
    # must be one scan with zero joins and zero exchanges
    plan = _explain(spark, "tk01_bpe_encode", sf_dir)
    assert _exchanges(plan) == 0, f"tk01: encode should not shuffle\n{plan[:2000]}"
    assert "Join" not in plan, "tk01: merge table must fold in as literals, not join"


def test_mm05_mapinpandas_no_shuffle(spark, sf_dir):
    # the audio-energy kernel is a per-partition Arrow stage: payload
    # bytes must never cross an exchange
    plan = _explain(spark, "mm05_audio_energy", sf_dir)
    assert _exchanges(plan) == 0, f"mm05: unexpected shuffle\n{plan[:2000]}"


def test_ss11_codes_ride_candidates_vectors_only_rerank(spark, sf_dir):
    # the serving invariant: candidate scoring and the rerank fetch are
    # broadcast joins (query-bounded sides); the corpus never sort-merges
    # and only the qid-keyed top-k windows may exchange
    plan = _explain(spark, "ss11_ivfpq_search", sf_dir)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, "ss11: corpus-scale join crept in"
    assert plan.count("BroadcastHashJoin") >= 2, "ss11: candidate/rerank joins must broadcast"
    # the only key-partitioned exchanges allowed are the two qid-keyed
    # top-k windows (shortlist + final rank) — query-bounded relations.
    # ensure_parallelism's round-robin scan repartitions (single-file
    # local fixtures) are not data-bearing shuffles and don't count.
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash <= 2, f"ss11: corpus-keyed shuffle crept in ({n_hash})\n{plan[:2000]}"


def test_dd09_two_hash_keyed_exchanges_text_never_shuffles(spark, sf_dir):
    # keeper decision (block-hash window) + reconstruction (doc agg):
    # two key-partitioned exchanges, no join anywhere
    plan = _explain(spark, "dd09_block_dedup_rebuild", sf_dir)
    assert "Join" not in plan, "dd09 must not join"
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash <= 2, f"dd09: expected <=2 keyed exchanges, got {n_hash}"


def test_aj03_nearest_single_exchange_no_join(spark, sf_dir):
    """aj03: both as-of directions are window frames over ONE keyed
    sort — a single exchange, no join of any kind (the two-direction
    formulation must not degrade to two plans merged by a join)."""
    plan = _explain(spark, "aj03_asof_nearest", sf_dir)
    assert "Join" not in plan, f"aj03 grew a join\n{plan[:1500]}"
    assert _exchanges(plan) == 1, f"aj03: expected exactly one keyed exchange\n{plan[:1500]}"
    assert "Window" in plan, "aj03 lost its window formulation"


def test_ks01_grid_joins_broadcast(spark, sf_dir):
    """ks01: after the one input-scaled counts aggregate, everything
    runs on the bounded sources × values grid — the grid joins must
    broadcast (never sort-merge) and no cartesian over input-scaled
    relations may appear (the crossJoins are 1-row / bounded sides)."""
    plan = _explain(spark, "ks01_source_drift", sf_dir)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"ks01 grid join sort-merged\n{plan[:2000]}"


def test_kl01_model_joins_broadcast(spark, sf_dir):
    """kl01: the (source, symbol) aggregate is the only input-scaled
    exchange; the corpus marginal and totals are bounded and must
    broadcast back — no sort-merge anywhere."""
    plan = _explain(spark, "kl01_source_divergence", sf_dir)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"kl01 model join sort-merged\n{plan[:2000]}"


def test_dd10_blocked_join_no_cartesian(spark, sf_dir):
    """dd10 shares dd02's blocked self-join: candidates meet only on
    the hashed shingle key — no cartesian/nested-loop anywhere, and the
    hot-shingle DF cap applies (same capped relation)."""
    plan = _explain(spark, "dd10_containment", sf_dir)
    assert "CartesianProduct" not in plan
    # The only nested-loop allowed is the sanctioned one-row
    # crossJoin(broadcast(agg)) that folds the DF-cap scalar into the
    # plan (round-12 _capped_shingles); anything else is a real
    # cartesian regression.
    # (the formatted plan re-prints the cached subtree per consumer and
    # repeats each node as a bare detail header, so match the tree
    # lines' "<join> <type> <build side>" form and check every
    # occurrence's shape, not the count)
    import re as _re

    shapes = _re.findall(r"BroadcastNestedLoopJoin (\w+) (Build\w+)", plan)
    assert all(typ == "Cross" for typ, _ in shapes), (
        f"unexpected nested-loop join {shapes}\n{plan[:2000]}"
    )
    # Round-13 (ADVICE): bound the BNLJ to exactly the ONE sanctioned
    # node — the cached subtree re-prints it per consumer under the
    # SAME operator id, so distinct ids > 1 means a second, genuine
    # cross join slipped in. And the sanctioned node's stream side must
    # be the one-row DF-cap HashAggregate fold, not a data relation.
    ids = set(_re.findall(r"BroadcastNestedLoopJoin \w+ Build\w+ \((\d+)\)", plan))
    assert len(ids) <= 1, f"more than one distinct BNLJ node: {ids}\n{plan[:2000]}"
    for m in _re.finditer(r"BroadcastNestedLoopJoin \w+ Build\w+ \(\d+\)\n(.*\n)", plan):
        assert "HashAggregate" in m.group(1), (
            f"BNLJ stream side is not the scalar-fold aggregate\n{m.group(0)}"
        )


def test_qa02_single_exchange(spark, sf_dir):
    """qa02 is one keyed window sort — exactly one exchange, no join."""
    plan = _explain(spark, "qa02_percentile_normalize", sf_dir)
    assert "Join" not in plan
    assert _exchanges(plan) == 1, f"qa02: expected one exchange\n{plan[:1200]}"


def test_dp01_one_aggregate_no_self_join(spark, sf_dir):
    """dp01: sufficient statistics only — one input-scaled aggregate,
    the totals come back as a broadcast 1-row relation, and the corpus
    never joins against itself (no sort-merge)."""
    plan = _explain(spark, "dp01_mean_drift", sf_dir)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"dp01 self-joined the corpus\n{plan[:1500]}"


def test_sj01_salt_widens_distinct_state(spark, sf_dir):
    """sj01: the dedup aggregate must be keyed by (event_type, salt,
    user_id) — the Knuth-hash salt expression rides the partitioning so
    no cell ever holds a hot type's full distinct state — and the merge
    phases reduce to bounded relations (3 exchanges total: dedup,
    per-cell count, final sum)."""
    plan = _explain(spark, "sj01_salted_distinct", sf_dir)
    m = re.search(r"hashpartitioning\(event_type[^)]*pmod[^)]*user_id|"
                  r"hashpartitioning\(event_type[^)]*user_id[^)]*pmod|"
                  r"hashpartitioning\(event_type[^)]*_groupingexpression[^)]*user_id", plan)
    assert m or "pmod" in plan, f"sj01: salt not in dedup partitioning\n{plan[:2000]}"
    assert _exchanges(plan) <= 3


def test_sj02_join_key_carries_salt(spark, sf_dir):
    """sj02 with broadcast disabled: the fact-side join must key on
    (event_type, _salt) — 32-way spread of the hot type — and never
    fall back to a nested loop."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _explain(spark, "sj02_salted_join", sf_dir)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "_salt" in plan, f"sj02: salt column missing from plan\n{plan[:1500]}"
    assert re.search(r"hashpartitioning\(event_type[^)]*_salt", plan), (
        f"sj02: join exchange not keyed by (event_type, _salt)\n{plan[:2000]}"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ws01_distributed_topk_no_global_sort(spark, sf_dir):
    """ws01: the weighted draw must plan as TakeOrderedAndProject
    (per-partition top-k + k-row merge), never a range-partitioned
    global sort, and the priority is a pure projection (0 exchanges)."""
    plan = _explain(spark, "ws01_weighted_sample", sf_dir)
    assert "TakeOrderedAndProject" in plan, f"ws01: no TakeOrdered\n{plan[:1500]}"
    assert "rangepartitioning" not in plan, "ws01: global sort crept in"
    assert _exchanges(plan) == 0


def test_dq01_single_scan_single_aggregate(spark, sf_dir):
    """dq01: the whole profile must come from ONE scan of events (the
    oracle's five scans collapse) through one Expand-backed aggregate."""
    plan = _explain(spark, "dq01_table_profile", sf_dir)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, (
        f"dq01: expected exactly one events scan\n{plan[:1500]}"
    )
    assert "Expand" in plan


def test_dq02_no_expand_single_scan(spark, sf_dir):
    """dq02 (the 100 TB profile): same single events scan as dq01 but
    the HLL aggregate must NOT multiply rows through Expand — that is
    the entire point of the approx mode."""
    plan = _explain(spark, "dq02_profile_approx", sf_dir)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, (
        f"dq02: expected exactly one events scan\n{plan[:1500]}"
    )
    assert "Expand" not in plan


def test_profiler_approx_tracks_exact(spark, sf_dir):
    """The HLL profile (100 TB mode) must match the exact profile on
    nulls/ranges and be within 5% on every cardinality."""
    from ntripmonitor_spark.operators.profile import profile_table
    from ntripmonitor_spark.tables import table as load

    ev = load(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    exact = {r["column"]: r for r in profile_table(ev, cols).collect()}
    approx = {r["column"]: r for r in profile_table(ev, cols, approx=True).collect()}
    for c in cols:
        e, a = exact[c], approx[c]
        assert a["n_null"] == e["n_null"] and a["n_rows"] == e["n_rows"]
        assert a["min_num"] == e["min_num"] and a["max_num"] == e["max_num"]
        if e["n_distinct"]:
            rel = abs(a["n_distinct"] - e["n_distinct"]) / e["n_distinct"]
            assert rel < 0.05, f"{c}: approx distinct off by {rel:.1%}"


def test_tx14_models_broadcast_no_sortmerge(spark, sf_dir):
    """tx14: trigram/bigram/unigram model tables are vocab-bounded and
    must ride in as broadcasts — the corpus-scale trigram relation
    never sort-merges."""
    plan = _explain(spark, "tx14_stupid_backoff", sf_dir)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, f"tx14 model join sort-merged\n{plan[:2000]}"
    assert "BroadcastHashJoin" in plan


def test_aqe_splits_runtime_skew_join(spark):
    """The runtime half of the skew story (sj01/sj02 are the
    logical-plan half): a constructed hot key (95% of the build of one
    partition) joined without broadcast must trigger AQE's skew-join
    split — final plan shows SortMergeJoin(skew=true) over a skewed
    AQEShuffleRead — while producing exactly the plain join's rows."""
    from pyspark.sql import functions as F2

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(200_000).select(
            F2.lit(0).alias("k"), F2.col("id").alias("v")
        ).union(
            spark.range(10_000).select((F2.col("id") % 100 + 1).alias("k"), F2.col("id").alias("v"))
        )
        small = spark.range(101).select(F2.col("id").alias("k"), (F2.col("id") * 10).alias("w"))
        j = big.join(small, "k")
        n = len(j.collect())
        assert n == 210_000
        plan = j._sc._jvm.PythonSQLUtils.explainString(j._jdf.queryExecution(), "simple")
        assert "isFinalPlan=true" in plan
        # With preferSortMergeJoin=false (round-12) AQE may run the
        # split join as shuffled-hash; either flavor proves the split.
        assert (
            "SortMergeJoin(skew=true)" in plan
            or "ShuffledHashJoin(skew=true)" in plan
        ), f"AQE did not split the skew\n{plan[:1500]}"
        assert "skewed" in plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
