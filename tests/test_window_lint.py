"""Static lint: every UNPARTITIONED window (``Window.orderBy(...)``
with no ``partitionBy``) in package source must carry an adjacent
``GLOBAL-WINDOW-OK`` justification comment (round-11 verdict hygiene
item: these sites each trip a WindowExec single-partition warning, and
an unjustified one is a potential scale-killer — all sanctioned sites
run over LIMITed top-k or |groups|-bounded aggregate relations).
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "ntripmonitor_spark")
MARKER = "GLOBAL-WINDOW-OK"
# how many lines above the site the marker may sit
LOOKBACK = 4


def _unjustified_sites() -> list[str]:
    bad = []
    for root, _, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            lines = open(path).read().splitlines()
            for i, line in enumerate(lines):
                if not re.search(r"\bWindow\.orderBy\(", line):
                    continue
                ctx = "\n".join(lines[max(0, i - LOOKBACK):i + 1])
                if MARKER not in ctx:
                    rel = os.path.relpath(path, os.path.dirname(PKG))
                    bad.append(f"{rel}:{i + 1}: {line.strip()[:80]}")
    return bad


def test_every_global_window_is_justified():
    bad = _unjustified_sites()
    assert not bad, (
        "unpartitioned Window.orderBy sites without a GLOBAL-WINDOW-OK "
        f"justification comment within {LOOKBACK} lines:\n" + "\n".join(bad)
    )


def test_lint_detects_unmarked_site(tmp_path):
    """Regression guard on the lint itself: it must flag an unmarked
    Window.orderBy if one is introduced."""
    sample = 'w = Window.orderBy(F.col("x"))\n'
    assert re.search(r"\bWindow\.orderBy\(", sample)
    assert MARKER not in sample
