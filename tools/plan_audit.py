#!/usr/bin/env python
"""Plan-shape audit over every registered query: counts exchanges,
scans, join strategies, and codegen coverage from the FORMATTED
physical plan, and flags the shapes that hurt at 100 TB (cartesian /
nested-loop joins, range-partitioned global sorts, corpus-side
sort-merge where a broadcast was intended).

Usage:
    python tools/plan_audit.py [--sf-dir /root/testdata/sf0.001] [--md]

--md prints the markdown table SCALE.md embeds; default prints a TSV.
Queries are PLANNED only (no execution), so the audit runs in seconds
and is safe to run per-round. AQE rewrites (e.g. sort-merge → broadcast
at runtime) are not visible here — this is the static planner's output,
i.e. the worst case the plan admits.
"""

from __future__ import annotations

import argparse
import re
import sys


def audit_plan(plan: str) -> dict:
    def count(pat: str) -> int:
        return len(re.findall(pat, plan, re.M))

    n_bc = count(r"^\(\d+\) BroadcastExchange\b")
    return {
        "exchanges": count(r"^\(\d+\) Exchange\b"),
        "broadcasts": n_bc,
        "scans": count(r"^\(\d+\) Scan parquet\b"),
        "bhj": count(r"^\(\d+\) BroadcastHashJoin\b"),
        "smj": count(r"^\(\d+\) SortMergeJoin\b"),
        "bnlj": count(r"^\(\d+\) BroadcastNestedLoopJoin\b"),
        "cartesian": count(r"^\(\d+\) CartesianProduct\b"),
        "global_sort": int(bool(re.search(r"Exchange rangepartitioning", plan))),
        "expand": count(r"^\(\d+\) Expand\b"),
        "python": count(r"^\(\d+\) (?:MapInPandas|PythonMapInArrow|ArrowEvalPython|BatchEvalPython)\b"),
        "wsc_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args()

    from ntripmonitor_spark.plans import REGISTRY
    from ntripmonitor_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    rows = []
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"# {name}: PLAN FAILED: {exc}", file=sys.stderr)
            rows.append((name, None))
            continue
        rows.append((name, audit_plan(plan)))

    cols = ["exchanges", "broadcasts", "scans", "bhj", "smj", "bnlj",
            "cartesian", "global_sort", "expand", "python", "wsc_spans"]
    if args.md:
        print("| query | " + " | ".join(cols) + " | flags |")
        print("|---" * (len(cols) + 2) + "|")
    else:
        print("query\t" + "\t".join(cols) + "\tflags")
    n_flagged = 0
    for name, a in rows:
        if a is None:
            print(f"| {name} | PLAN FAILED |" if args.md else f"{name}\tPLAN FAILED")
            continue
        flags = []
        if a["cartesian"]:
            flags.append("CARTESIAN")
        if a["bnlj"]:
            flags.append("NESTED-LOOP")
        if a["global_sort"]:
            flags.append("GLOBAL-SORT")
        if a["smj"]:
            flags.append("sortmerge")
        n_flagged += bool(flags)
        vals = [str(a[c]) for c in cols]
        if args.md:
            print(f"| {name} | " + " | ".join(vals) + f" | {','.join(flags) or '—'} |")
        else:
            print(name + "\t" + "\t".join(vals) + "\t" + (",".join(flags) or "-"))
    print(f"# {len(rows)} queries audited, {n_flagged} flagged", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
