#!/usr/bin/env python
"""Propose the NEXT round's 50-name driver window from artifacts alone,
applying the documented priority order (plans/registry.py):

  1. queries whose latest driver row is an ERROR (fix needs re-proof)
  2. never-driver-checked queries
  3. names passed via --changed (code changed after their last green
     row — the tool cannot infer this from artifacts, so list them)
  4. stalest green rows (oldest round first) as backfill

Prints the proposed window and a ready-to-paste DRIVER_ROTATED_OUT
set literal. Advisory only — it does not edit registry.py.

    PYTHONPATH=. python tools/propose_rotation.py [--changed a,b,c]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WINDOW = 50


def main() -> None:
    from coverage_report import load_rounds, is_green

    from ntripmonitor_spark.plans import REGISTRY

    changed: list[str] = []
    if "--changed" in sys.argv:
        changed = [
            c for c in sys.argv[sys.argv.index("--changed") + 1].split(",") if c
        ]
        unknown = [c for c in changed if c not in REGISTRY]
        if unknown:
            sys.exit(f"unknown --changed names: {unknown}")

    rounds = load_rounds()
    latest: dict[str, tuple[int, bool]] = {}
    last_green: dict[str, int] = {}
    for r in sorted(rounds):
        for exposed, row in rounds[r].items():
            canon = exposed[2:] if exposed.startswith("x_") else exposed
            latest[canon] = (r, is_green(row))
            if is_green(row):
                last_green[canon] = r

    from ntripmonitor_spark.plans.registry import is_retired

    # Retired diagnostics (probe matrix, DECIMAL canary) keep red
    # latest rows BY DESIGN — never re-proof candidates.
    names = sorted(n for n in REGISTRY if not is_retired(n))
    error_latest = [n for n in names if n in latest and not latest[n][1]]
    never = [n for n in names if n not in latest]
    stale = sorted(
        (n for n in names if n in last_green and n not in changed),
        key=lambda n: (last_green[n], n),
    )

    window: list[str] = []
    for bucket in (error_latest, never, changed, stale):
        for n in bucket:
            if n not in window and len(window) < WINDOW:
                window.append(n)
    window.sort()
    bad = [n for n in window if n >= "x"]
    if bad:
        sys.exit(f"names sorting >= 'x' break the alias scheme: {bad}")

    # Retired diagnostics must ALSO carry the x_ alias (coverage_report
    # derives the driver window as REGISTRY - DRIVER_ROTATED_OUT), so
    # include them in the emitted literal even though they never enter
    # the window.
    retired = sorted(n for n in REGISTRY if is_retired(n))
    out = sorted(set(names) - set(window) | set(retired))
    print(f"# proposed window ({len(window)}): "
          f"{len([n for n in window if n in error_latest])} error-latest, "
          f"{len([n for n in window if n in never])} never-checked, "
          f"{len([n for n in window if n in changed])} changed, "
          f"{len([n for n in window if n in stale])} stale-green backfill")
    for n in window:
        tag = ("ERROR-latest" if n in error_latest else
               "never" if n in never else
               "changed" if n in changed else
               f"green r{last_green[n]}")
        print(f"#   {n:34} {tag}")
    print()
    print("DRIVER_ROTATED_OUT: frozenset[str] = frozenset(")
    print("    {")
    for n in out:
        print(f'        "{n}",')
    print("    }")
    print(")")


if __name__ == "__main__":
    main()
