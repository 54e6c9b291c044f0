#!/usr/bin/env python
"""Benchmark harness: times the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with a full materialization (count of the result
— the aggregates are small, so count ≈ collect cost) after one warm-up
of the session (JVM + parquet footer caches).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from ntripmonitor_spark.session import get_spark
    from ntripmonitor_spark.plans import REGISTRY, bench_queries

    spark = get_spark("ntripmonitor_spark_bench")

    names = sorted(bench_queries()) or sorted(REGISTRY)
    # Dev/test subsetting: SPARK_GRAFT_BENCH_ONLY=q01_...,rt02_... runs just
    # those queries (the driver never sets it, so the recorded bench is
    # always the full set).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = {w.strip() for w in only.split(",") if w.strip()}
        names = [n for n in names if n in wanted]
    # Warm-up: run every bench query once at the TARGET SF to pay the
    # one-time JVM/codegen, Python-worker-pool spawn (32 workers
    # importing pandas/pyarrow) and OS page-cache costs — steady-state
    # on a long-lived cluster. Then report best-of-5 timed runs to
    # shave scheduler/GC/co-tenant jitter (observed bursts inflate a
    # 0.4 s query to 3+ s; 5 samples ride out most bursts).
    # A query that errors must not sink the whole bench record: drop it
    # from the set and keep timing the rest — but record the drop in the
    # JSON line itself ("excluded"), not only on stderr, so a bench=True
    # query that breaks is visible in the archived record.
    excluded: dict[str, str] = {}
    for name in list(names):
        try:
            REGISTRY[name].fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            print(f"# {name}: FAILED in warm-up ({exc!r}) — excluded", file=sys.stderr)
            excluded[name] = f"{type(exc).__name__}: {exc}"[:200]
            names.remove(name)

    # Trials interleave round-robin across queries so a co-tenant load
    # burst degrades one SAMPLE of many queries, not all samples of one
    # query (best-of would then still see a clean run). Best-of-5 for
    # small sets; best-of-3 once the set is large enough that the
    # round-robin itself amortizes burst exposure (and total wall time
    # matters: 50+ queries x 5 trials at sf0.1 is ~10 min).
    n_trials = 5 if len(names) <= 20 else 3
    best: dict[str, float] = {name: float("inf") for name in names}
    rows: dict[str, int] = {}
    for _ in range(n_trials):
        for name in names:
            t0 = time.perf_counter()
            rows[name] = REGISTRY[name].fn(spark, sf_dir).count()
            best[name] = min(best[name], time.perf_counter() - t0)
    timings = {name: round(best[name], 4) for name in names}
    for name in names:
        print(f"# {name}: {timings[name]:.3f}s ({rows[name]} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "query_set_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "excluded": sorted(excluded),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
