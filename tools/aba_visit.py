#!/usr/bin/env python
"""One A-B-A bench visit: time a fixed query set on ONE repo tip in a
fresh process/JVM and print one JSON line.

Round-11 verdict #2: the headline bench has read above r9's 11.21 s for
two consecutive rounds, with the inflation concentrated in the
cu01/dc01/dd02/tx02 shingle/quality substrate while rt02/q09 improved.
The round-10 A/B attributed it to a host factor, but two rounds demand
pinning: this tool runs the SAME timing harness over r9/r10/r11
checkouts interleaved (tip order A-B-C repeated, each visit its own
JVM), so host drift lands on all tips equally and a code regression
shows as a tip-stable delta.

    python tools/aba_visit.py <tip_repo_path> [sf_dir]

Prints: {"tip": ..., "queries": {name: best_sec, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = (
    "cu01_curation_funnel",
    "dc01_decontamination",
    "dd02_ngram_jaccard",
    "tx02_quality_score",
    "rt02_observations",
    "q09_three_way_join",
)
N_TRIALS = 3


def main() -> None:
    tip = os.path.abspath(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sys.path.insert(0, tip)
    os.chdir(tip)

    from ntripmonitor_spark.plans import REGISTRY
    from ntripmonitor_spark.session import get_spark

    spark = get_spark("aba_visit")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in QUERIES if n in REGISTRY]
    # Two warm-up passes (codegen + C2 promotion), same as bench.py.
    for _ in range(2):
        for n in names:
            REGISTRY[n].fn(spark, sf_dir).count()
    best = {n: float("inf") for n in names}
    for _ in range(N_TRIALS):
        for n in names:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            REGISTRY[n].fn(spark, sf_dir).count()
            best[n] = min(best[n], time.perf_counter() - t0)
    print(json.dumps({
        "tip": os.path.basename(tip),
        "queries": {n: round(t, 3) for n, t in best.items()},
        "total": round(sum(best.values()), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
