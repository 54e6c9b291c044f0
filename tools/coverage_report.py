#!/usr/bin/env python
"""Cross-round driver-coverage report, derived from artifacts alone:
CORRECTNESS_r*.json (driver rows) + the live registry (canonical names
and the current ``x_`` rotation window). Lets a reviewer audit the
50-name-window rotation (plans/registry.py DRIVER_ROTATED_OUT) without
trusting any hand-maintained count:

    PYTHONPATH=. python tools/coverage_report.py            # summary
    PYTHONPATH=. python tools/coverage_report.py --per-query

A query counts as GREEN in a round when its row has rows_match and
schema_match true and hash_match true-or-absent (rows-only queries have
no hash). ``latest`` is the most recent round with any row.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds() -> dict[int, dict[str, dict]]:
    rounds: dict[int, dict[str, dict]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        digits = "".join(c for c in os.path.basename(path) if c.isdigit())
        with open(path) as f:
            rounds[int(digits)] = json.load(f)
    return rounds


def is_green(row: dict) -> bool:
    return (
        bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and row.get("hash_match") in (True, None)
    )


def main() -> None:
    from ntripmonitor_spark.plans import REGISTRY
    from ntripmonitor_spark.plans.registry import DRIVER_ROTATED_OUT

    rounds = load_rounds()
    latest: dict[str, tuple[int, bool]] = {}
    green_rounds: dict[str, list[int]] = {}
    for r in sorted(rounds):
        for exposed, row in rounds[r].items():
            canon = exposed[2:] if exposed.startswith("x_") else exposed
            latest[canon] = (r, is_green(row))
            if is_green(row):
                green_rounds.setdefault(canon, []).append(r)

    names = sorted(REGISTRY)
    window = sorted(n for n in names if n not in DRIVER_ROTATED_OUT)
    ever_green = [n for n in names if n in green_rounds]
    never = [n for n in names if n not in latest]
    stale_error = [n for n in names if n in latest and not latest[n][1]]

    print(f"registered queries:        {len(names)}")
    print(f"  with value oracle:       {sum(1 for n in names if REGISTRY[n].oracle)}")
    print(f"current driver window:     {len(window)} (canonical, non-x_ names)")
    print(f"ever driver-green:         {len(ever_green)}")
    print(f"never driver-checked:      {len(never)}")
    print(f"latest driver row not green: {len(stale_error)}")
    if stale_error:
        print("  " + ", ".join(f"{n} (r{latest[n][0]})" for n in stale_error))
    pending = [n for n in never if n not in window]
    print(f"never-checked AND out of window (next rotation's debt): {len(pending)}")
    if pending:
        print("  " + ", ".join(pending))

    if "--per-query" in sys.argv:
        print()
        print(f"{'query':34} {'latest':8} {'green rounds'}")
        for n in names:
            if n in latest:
                r, ok = latest[n]
                tag = f"r{r} {'ok' if ok else 'ERR'}"
            else:
                tag = "never"
            gr = ",".join(f"r{r}" for r in green_rounds.get(n, [])) or "-"
            mark = "*" if n in window else " "
            print(f"{mark}{n:33} {tag:8} {gr}")
        print("\n* = in the current 50-name driver window")


if __name__ == "__main__":
    main()
