"""DuckDB-oracle comparison utilities mirroring the driver's t2 check:
run the Spark query and the oracle SQL on the same parquet, sort rows by
all columns (sorted by column name), round floats to 9 significant
digits, cast decimals to string, compare (FIXTURES.md §B)."""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb

from ntripmonitor_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon_value(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonicalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_query(spark, sf_dir: str, name: str, fn, oracle_sql: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    cur = con.execute(oracle_sql)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    con.close()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"{name}: row count mismatch spark={len(s_rows)} duck={len(d_rows)}"
    cs, cd = canonicalize(s_cols, s_rows), canonicalize(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        return False, f"{name}: value mismatch; first diffs (spark,duck): {diffs}"
    return True, f"{name}: OK ({len(s_rows)} rows)"
