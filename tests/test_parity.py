"""Spark-vs-DuckDB parity for every registered query with an oracle —
a local mirror of the driver's t2 correctness gate (sf0.001 for speed;
the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from ntripmonitor_spark.plans import REGISTRY
from tests.oracle import compare_query

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_parity(spark, sf_dir, name):
    q = REGISTRY[name]
    # dq08_decimal_canary is the deliberate DECIMAL probe: its whole
    # point is to fail the driver's pandas path, so only the fetchall
    # leg applies (tools/oracle_type_lint.py exempts it the same way).
    faithful = name != "dq08_decimal_canary"
    ok, msg = compare_query(spark, sf_dir, name, q.fn, q.oracle,
                            driver_faithful=faithful)
    assert ok, msg


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle must still run and return a schema."""
    for name, q in REGISTRY.items():
        if q.oracle is None:
            df = q.fn(spark, sf_dir)
            assert df.columns, f"{name}: empty schema"
            df.limit(5).collect()
