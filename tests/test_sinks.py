"""Sink-layer tests: upsert SQL text, routing, dedupe, package uid
determinism (no Postgres in the container — the JDBC writer itself is
exercised only for SQL/plan construction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntripmonitor_spark import sinks


def test_upsert_sql_text():
    sql = sinks.upsert_sql("t", ["a", "b", "c"], ["a"])
    assert sql == (
        "INSERT INTO t (a, b, c) VALUES (%s, %s, %s) "
        "ON CONFLICT (a) DO UPDATE SET b = EXCLUDED.b, c = EXCLUDED.c"
    )
    assert "ON CONFLICT (mountpoint, countrycode, casterprovider)" in sinks.sourcetable_upsert_sql()
    assert sinks.reconnect_update_sql().startswith("UPDATE connection_logger")


def test_route_observations(spark):
    obs = spark.createDataFrame(
        [("MP1", "GPS", 1.0), ("MP1", "GLONASS", 2.0), ("MP2", "GPS", 3.0)],
        "mountpoint string, constellation string, code double",
    )
    routed = sinks.route_observations(obs)
    assert set(routed) == set(sinks.OBS_TABLES.values())
    assert routed["gps_observations"].count() == 2
    assert routed["glonass_observations"].count() == 1
    assert "constellation" not in routed["gps_observations"].columns


def test_dedupe_last_writer(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 5.0)],
        "k string, v int, ts double",
    )
    out = sinks.dedupe_last_writer(df, ["k"], "ts").orderBy("k").collect()
    assert [(r["k"], r["v"]) for r in out] == [("a", 2), ("b", 1)]


def test_package_uid_deterministic(spark):
    pk = spark.createDataFrame(
        [("MP1", "2024-01-01 00:00:00", 1077, 67)],
        "mountpoint string, receive_time string, msg_type int, msg_size int",
    ).withColumn("receive_time", F.to_timestamp("receive_time"))
    a = sinks.with_package_uid(pk).collect()[0]["package_uid"]
    b = sinks.with_package_uid(pk).collect()[0]["package_uid"]
    assert a == b and isinstance(a, int)


def test_jdbc_roundtrip_if_available(spark):
    """Live JDBC e2e (VERDICT r2 #10): runs only when the environment
    provides a reachable database and driver jar via
    SPARK_GRAFT_JDBC_URL (e.g. jdbc:postgresql://host:5432/db) and
    optional SPARK_GRAFT_JDBC_USER/_PASSWORD; skips cleanly otherwise
    (no driver jar ships in this container)."""
    import os

    import pytest

    url = os.environ.get("SPARK_GRAFT_JDBC_URL")
    if not url:
        pytest.skip("SPARK_GRAFT_JDBC_URL not set; no JDBC endpoint in container")

    from ntripmonitor_spark import sinks

    opts = {}
    if os.environ.get("SPARK_GRAFT_JDBC_USER"):
        opts["user"] = os.environ["SPARK_GRAFT_JDBC_USER"]
        opts["password"] = os.environ.get("SPARK_GRAFT_JDBC_PASSWORD", "")
    df = spark.createDataFrame(
        [("MP1", 1005, 42), ("MP2", 1077, 7)],
        "mountpoint string, rtcm_msg_type int, rtcm_msg_size int",
    )
    table = "spark_graft_jdbc_smoke"
    sinks.write_jdbc_append(df, url, table, opts)
    back = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
        .options(**opts).load()
    )
    assert back.count() >= 2
