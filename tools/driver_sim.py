#!/usr/bin/env python
"""Local simulation of the driver's t2 correctness gate: run the FIRST
50 exposed names (alphabetical — exactly the driver's window) at sf0.01
under a driver-like vanilla session (ANSI on, 200 shuffle partitions,
UTC), compare each against its oracle with the FIXTURES.md §B
canonicalization, print one line per query and a summary.

    PYTHONPATH=. python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--names a,b]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    only: list[str] | None = None
    if "--names" in sys.argv:
        only = sys.argv[sys.argv.index("--names") + 1].split(",")

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    from tests.oracle import compare_query

    qs = entry.queries()
    oracles = entry.oracle_sql()
    window = sorted(qs)[:50]
    if only:
        window = [n for n in window if n in only or n.removeprefix("x_") in only]
        missed = [
            n for n in only
            if n not in window and f"x_{n}" not in qs and n not in qs
        ]
        outside = [
            n for n in only
            if n not in window
            and (n in qs or f"x_{n}" in qs)
        ]
        if missed:
            sys.exit(f"unknown names: {missed}")
        if outside:
            print(f"WARNING: not in the driver window (rotated out or past "
                  f"slot 50), skipped: {outside}")
        if not window:
            sys.exit("no requested name is inside the 50-name driver window")

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "200")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    fails = 0
    for name in window:
        t0 = time.time()
        if name not in oracles:
            try:
                n = qs[name](spark, sf_dir).count()
                print(f"  {name:<35} ROWS-ONLY ({n} rows, {time.time()-t0:.1f}s)")
            except Exception as e:  # noqa: BLE001
                fails += 1
                print(f"  {name:<35} ERROR {e}")
            continue
        try:
            ok, msg = compare_query(spark, sf_dir, name, qs[name], oracles[name])
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"{name}: EXC {e}"
        if not ok:
            fails += 1
        print(f"  {name:<35} {'OK' if ok else 'FAIL'} ({time.time()-t0:.1f}s)"
              + ("" if ok else f"\n    {msg[:500]}"))
    print(f"\n{len(window) - fails}/{len(window)} green")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
