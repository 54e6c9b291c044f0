#!/usr/bin/env python
"""Construction-vs-action sweep (guide §1): for each query, time
fn() (plan construction, incl. any eager driver jobs) separately from
the noop-sink action, best-of-N each. Separates driver/plan-build cost
from data work — the split that drove the round-12 findings.

    PYTHONPATH=. python tools/fnsweep.py [--sf DIR] [--trials N] q1 q2 ...

Measurement-only: never touches the bench contract or query semantics.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--all", action="store_true", help="sweep every bench query")
    args = ap.parse_args()

    from ntripmonitor_spark.plans import REGISTRY, bench_queries
    from ntripmonitor_spark.session import get_spark

    spark = get_spark("fnsweep")
    spark.sparkContext.setLogLevel("ERROR")

    names = sorted(bench_queries()) if args.all else list(args.queries)

    import gc

    def drain() -> None:
        gc.collect()
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()  # type: ignore[union-attr]
        except Exception:
            pass

    out: dict[str, dict[str, float]] = {}
    for name in names:
        # warm-up (codegen, page cache) outside the timed trials
        try:
            df = REGISTRY[name].fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": str(exc)[:120]}  # type: ignore[dict-item]
            continue
        best_fn, best_act = float("inf"), float("inf")
        for _ in range(args.trials):
            drain()
            spark.sparkContext.setJobDescription(f"fnsweep:{name}:fn")
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, args.sf)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"fnsweep:{name}:action")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            best_fn = min(best_fn, t1 - t0)
            best_act = min(best_act, t2 - t1)
        out[name] = {"fn": round(best_fn, 3), "act": round(best_act, 3),
                     "total": round(best_fn + best_act, 3)}
    print(json.dumps({"sf": args.sf, "trials": args.trials, "split": out}, indent=1))


if __name__ == "__main__":
    main()
