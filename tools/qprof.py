#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

For each named query: captures ``.explain("formatted")`` to a file and
times the computation with the noop sink (which materializes every
column, unlike ``count()`` which lets the optimizer prune) — warm-up
run + best-of-N, jobs labelled via setJobDescription so a UI/event-log
reading maps back to queries.

Usage:
    PYTHONPATH=. python tools/qprof.py [--sf DIR] [--plans-dir DIR]
        [--suffix before|after] [--trials N] [--no-time] q1 q2 ...

Plans go to <plans-dir>/<query>_<suffix>.txt; timings print as one JSON
line to stdout. This tool is measurement-only: it never touches the
bench contract (bench.py) or any query's semantics.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default=None, help="where to write explain output (skip if unset)")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--no-time", action="store_true", help="capture plans only")
    args = ap.parse_args()

    from ntripmonitor_spark.plans import REGISTRY
    from ntripmonitor_spark.session import get_spark

    spark = get_spark("qprof")
    spark.sparkContext.setLogLevel("ERROR")

    names = list(args.queries)
    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for name in names:
            # Isolate each query's plan from the previous query's cached
            # relations (CacheManager substitutes semantically-equal
            # subtrees, which would make the printed plan depend on
            # capture order).
            spark.catalog.clearCache()
            df = REGISTRY[name].fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)

    timings: dict[str, float] = {}
    if not args.no_time:
        import gc

        def drain() -> None:
            gc.collect()
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()  # type: ignore[union-attr]
            except Exception:
                pass

        def noop(df) -> None:
            df.write.format("noop").mode("overwrite").save()

        for name in names:  # warm-up pass (JVM/codegen/page cache)
            noop(REGISTRY[name].fn(spark, args.sf))
        for name in names:  # second pass: C2-promote generated classes
            noop(REGISTRY[name].fn(spark, args.sf))
        best = {name: float("inf") for name in names}
        for _ in range(args.trials):
            for name in names:
                drain()
                spark.sparkContext.setJobDescription(f"qprof:{name}")
                t0 = time.perf_counter()
                noop(REGISTRY[name].fn(spark, args.sf))
                best[name] = min(best[name], time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
        timings = {name: round(best[name], 3) for name in names}

    print(json.dumps({"sf": args.sf, "noop_best": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
