#!/usr/bin/env python
"""Lint every registered oracle's OUTPUT column types through DuckDB.

Why (VERDICT r10 root cause): DuckDB widens integer ``sum()`` (and
window sums) to HUGEINT (int128), and DECIMAL stays DECIMAL. The
driver's correctness gate fetches oracle results through pandas/Arrow,
where HUGEINT renders as float64 (``3.0`` vs Spark's ``3``) and DECIMAL
as object — hash-mismatching rows that are value-identical. Sixteen
round-10 reds, zero exceptions, all fit this rule; the local harness's
``fetchall()`` leg hid it for three rounds because HUGEINT arrives as a
Python int there.

The lint binds (``DESCRIBE``) each oracle against the sf0.001 views and
fails on any output column whose declared type is HUGEINT, UHUGEINT or
DECIMAL — the two numeric classes the driver's pandas path cannot carry
losslessly. Interior CTE columns are free to be HUGEINT (pb02/pb10/pb11
graded green with consumed sums); only the final SELECT's types matter.

Exemptions: ``dq08_decimal_canary`` is the deliberate DECIMAL
falsifiability probe (kept out-of-window, see plans/registry.py).

    PYTHONPATH=. python tools/oracle_type_lint.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")
EXEMPT = frozenset({"dq08_decimal_canary"})


def lint_oracles(sf_dir: str) -> dict[str, list[tuple[str, str]]]:
    """Return {query_name: [(column, duckdb_type), ...]} for every
    registered oracle emitting a banned output type."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ntripmonitor_spark.plans import REGISTRY
    from tests.oracle import duck_connection

    con = duck_connection(sf_dir)
    bad: dict[str, list[tuple[str, str]]] = {}
    for name, q in sorted(REGISTRY.items()):
        if q.oracle is None or name in EXEMPT:
            continue
        rows = con.execute(f"DESCRIBE {q.oracle}").fetchall()
        hits = [
            (col, typ)
            for col, typ, *_ in rows
            if any(b in typ.upper() for b in BANNED)
        ]
        if hits:
            bad[name] = hits
    con.close()
    return bad


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bad = lint_oracles(sf_dir)
    if not bad:
        print("OK: no registered oracle emits HUGEINT/DECIMAL output columns")
        return
    print(f"{len(bad)} oracle(s) emit banned output types:")
    for name, hits in bad.items():
        cols = ", ".join(f"{c}:{t}" for c, t in hits)
        print(f"  {name}: {cols}")
    sys.exit(1)


if __name__ == "__main__":
    main()
