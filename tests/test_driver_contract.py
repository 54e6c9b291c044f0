"""The driver-facing surface is a CONTRACT: __spark_entry__ exposes
entry()/queries()/oracle_sql() with exact shapes, and bench.py prints
one JSON line with fixed keys. These tests pin that surface so a
refactor cannot silently break what the harness consumes."""

from __future__ import annotations

import sys


def test_entry_contract(spark):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.limit(2001).collect()
    assert len(rows) > 0
    assert df.columns, "entry() returned an empty schema"


def test_queries_and_oracles_contract(spark):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    qs = E.queries()
    osql = E.oracle_sql()
    assert len(qs) >= 140
    # every oracle key maps to a registered query
    assert set(osql) <= set(qs)
    # the driver's 50-row window is exactly the canonical names
    names = sorted(qs)
    canon = [n for n in names if not n.startswith("x_")]
    assert len(canon) == 50, f"canonical window is {len(canon)}, not 50"
    assert set(names[:50]) == set(canon)
    # callables take (spark, sf_dir) and return a DataFrame lazily
    df = qs[canon[0]](spark, "/root/testdata/sf0.001")
    assert df.columns


def test_bench_emits_one_json_line():
    """bench.py at sf0.001 with a clipped set: exit 0, exactly one
    stdout line, parseable JSON with the driver's keys."""
    import json
    import os
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="8",
               SPARK_GRAFT_BENCH_ONLY="q01_pricing_summary,sn01_user_sessions,ws01_weighted_sample")
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True, text=True, timeout=900, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [line for line in out.stdout.splitlines() if line.strip()]
    assert len(lines) == 1, f"expected one JSON line, got {len(lines)}"
    d = json.loads(lines[0])
    assert {"metric", "value", "unit", "queries", "excluded", "sf"} <= set(d)
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["excluded"] == []
    assert abs(d["value"] - round(sum(d["queries"].values()), 2)) < 0.011
    # the archived line reports the headline subset (q01 is the only
    # headline query in this dev set); the full record carries the rest
    assert set(d["queries"]) == {"q01_pricing_summary"}
    full = json.load(open("/root/repo/BENCH_FULL_DEV.json"))
    assert set(full["queries"]) == {
        "q01_pricing_summary", "sn01_user_sessions", "ws01_weighted_sample"
    }
    assert full["excluded"] == {}


def test_bench_headline_line_fits_tail_capture():
    """The driver archives only a ~2 kB output tail (BENCH_r04 was
    truncated to unparseability). The headline line must stay well
    under that even with worst-case float widths."""
    import json

    from bench import HEADLINE

    worst = {
        "metric": "query_set_wall_clock",
        "value": 99999.99,
        "unit": "sec",
        "queries": {n: 99999.99 for n in HEADLINE},
        "excluded": [],
        "sf": 0.1,
        "full_value": 99999.9999,
        "n_full": 999,
    }
    assert len(json.dumps(worst)) < 1200
    assert len(HEADLINE) == 14


def test_queries_survive_non_utc_driver_session():
    """The harness driver builds its OWN SparkSession — nothing
    guarantees UTC. _pin_utc must make the contract hold anyway: run
    the most timezone-sensitive window queries against their oracles
    from a session pinned to America/New_York (subprocess: a second
    differently-configured session cannot coexist with the suite's).
    This is the r3 failure class (timestamp semantics diverging at the
    driver) pinned from the driver's side."""
    import subprocess

    code = """
import sys
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
from pyspark.sql import SparkSession
import __spark_entry__ as E
from tests.oracle import compare_query
spark = (SparkSession.builder.master('local[8]')
         .appName('ntz_driver_sim')
         .config('spark.sql.session.timeZone', 'America/New_York')
         .config('spark.ui.enabled', 'false')
         .config('spark.ui.showConsoleProgress', 'false')
         .getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
qs = E.queries(); osql = E.oracle_sql()
sf = '/root/testdata/sf0.001'
for n in ['sn01_user_sessions', 'aj01_asof_join', 'ts01_gap_fill',
          'q02_tumbling_window', 'q13_mod_latency', 'q19_mjd_bucket',
          'rt01_packages',
          # round-7 waves 2-4 epoch-arithmetic members
          'fn05_window_funnel', 'fn06_linear_attribution',
          'fn07_rfm_segments', 'ts03_twap_locf', 'q27_pivot_daily',
          # round-7 waves 6-11: hourly/daily-bucket epoch arithmetic
          # and the RANGE frame over epoch microseconds
          'an06_cusum_shift', 'an08_autocorrelation', 'an09_theil_sen',
          'fn08_rolling_dau', 'q30_range_frame',
          # round-10: LTOB x-coordinates are epoch microseconds
          'ts07_lttb_downsample']:
    e = n if n in qs else f'x_{n}'  # canonical name may be rotated out
    ok, msg = compare_query(spark, sf, n, qs[e], osql[e])
    assert ok, f'{n}: {msg[:500]}'
print('NONUTC_OK')
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "NONUTC_OK" in out.stdout


def test_operator_index_is_current():
    """docs/OPERATORS.md must match the live registry (regenerate with
    tools/gen_operator_index.py after adding operators)."""
    import io
    import contextlib

    sys.path.insert(0, "/root/repo/tools")
    import gen_operator_index

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        gen_operator_index.main()
    want = buf.getvalue()
    got = open("/root/repo/docs/OPERATORS.md").read()
    assert got == want, "docs/OPERATORS.md is stale — regenerate it"


def test_concurrent_queries_one_session(spark):
    """Serving reality: one long-lived session answers many queries at
    once. Eight different registered queries submitted from eight
    threads must all return their single-threaded answers — pinning
    session/plan thread-safety (broadcasts, literal folds, persisted
    relations included)."""
    from concurrent.futures import ThreadPoolExecutor

    from ntripmonitor_spark.plans import REGISTRY

    names = [
        "q01_pricing_summary", "q09_three_way_join", "sn01_user_sessions",
        "dd03_minhash_lsh", "tx02_quality_score", "sj01_salted_distinct",
        "ws01_weighted_sample", "an04_ewma_drift",
    ]
    sf = "/root/testdata/sf0.001"

    def run(name):
        rows = REGISTRY[name].fn(spark, sf).collect()
        return name, sorted(tuple(str(v) for v in r) for r in rows)

    serial = dict(run(n) for n in names)
    with ThreadPoolExecutor(max_workers=8) as pool:
        concurrent = dict(pool.map(run, names))
    assert concurrent == serial


def test_round13_driver_window_is_frozen():
    """The driver grades the first 50 exposed names alphabetically; the
    round-13 window regrades every query whose plan changed after its
    newest driver-green row (the 18 r12 stale-changed entries incl. the
    verdict-audit additions, plus the 6 r13-changed retrieval/kl01/dc02
    plans) and backfills the stalest r6/r7 greens. It must not shift
    under late registrations — new queries go to DRIVER_ROTATED_OUT
    (x_ alias) until the next rotation. A failure here means a
    registration displaced a frozen slot."""
    import __spark_entry__ as entry

    window = sorted(entry.queries())[:50]
    assert window == [
        "an02_seasonal_anomalies", "an03_mean_shift", "an06_cusum_shift",
        "bm01_bm25_topk", "cu03_full_pipeline", "cu05_ccnet_buckets",
        "dc02_decontamination_bloom", "dd02_ngram_jaccard", "dd06_dup_clusters",
        "dd10_containment", "dd14_cdc_chunks", "dp02_psi_drift",
        "er02_entity_clusters", "fn04_conversion_latency", "fn05_window_funnel",
        "fn06_linear_attribution", "fn07_rfm_segments", "gr01_cluster_sizes",
        "gr02_dup_degree", "gr03_lsh_clusters", "gr04_pagerank",
        "in03_phrase_probe", "in04_boolean_probe", "kl01_source_divergence",
        "mm05_audio_energy", "mm12_media_manifest", "mm13_phash_planted",
        "mm14_scene_change", "q25_except_users", "q26_cube_report",
        "q27_pivot_daily", "q28_json_props", "rc01_hybrid_rrf",
        "rc02_ndcg_eval", "rc03_mrr_eval", "scd02_asof_snapshot",
        "sp09_cluster_split_lsh", "ss02_ann_bucketed", "ss03_ann_lsh_multitable",
        "ss13_sq8_recall", "ss14_mmr_rerank", "ss16_nprobe_sweep",
        "ss17_radius_search", "tk01_bpe_encode", "ts01_gap_fill",
        "tx08_bpe_pairs", "tx09_zipf_fit", "tx10_bigram_nll",
        "tx11_gopher_rules", "tx12_pmi_collocations",
    ]


def test_window_emits_no_decimal_output_columns(spark):
    """Round-9 standing decision (docs/OPERATORS.md): no window query
    may emit a final DECIMAL(p,s) column — rounds 7–8 showed the
    driver's environment canonicalizes DECIMAL output differently from
    the local replica (every DECIMAL emitter hash-red, every integer
    emitter green). The single sanctioned exception is
    dq08_decimal_canary, the DELIBERATE falsifiability probe. DECIMAL
    as an internal exact-sum carrier is fine; this checks OUTPUT
    schemas only."""
    from pyspark.sql.types import DecimalType

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    qs = E.queries()
    window = [n for n in sorted(qs)[:50]]
    offenders = {}
    for n in window:
        if n == "dq08_decimal_canary":
            continue
        df = qs[n](spark, "/root/testdata/sf0.001")
        bad = [f.name for f in df.schema.fields
               if isinstance(f.dataType, DecimalType)]
        if bad:
            offenders[n] = bad
    assert not offenders, f"DECIMAL output columns in window: {offenders}"
