"""K1–K5 sink semantics against a REAL SQL database (DuckDB stands in
for PostgreSQL — same INSERT … ON CONFLICT dialect, real constraints):
streamed envelope appends with exactly-once ledger bookkeeping,
last-writer coordinate upserts, reconnect point updates, and the
reference dashboard's SQL running against what the stream wrote."""

from __future__ import annotations

import duckdb
import pytest

from ntripmonitor_spark.plans.rtcm import decoded_events, event_blobs
from ntripmonitor_spark.operators import rtcm
from ntripmonitor_spark.sinks import with_package_uid
from ntripmonitor_spark import sinks_sql
from ntripmonitor_spark.sources.framing import split_frames
from ntripmonitor_spark.streaming import pipeline as sp
from ntripmonitor_spark.streaming.replay import frames_stream, write_frame_archive


@pytest.fixture(scope="module")
def archive(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("arch_sql") / "frames")
    write_frame_archive(split_frames(event_blobs(spark, sf_dir)), path)
    return path


def test_streamed_appends_match_batch_and_replay_is_noop(spark, sf_dir, archive, tmp_path):
    db = str(tmp_path / "gnss.duckdb")
    sink = sinks_sql.append_packages(db)

    def batch_fn(decoded, batch_id):
        sink(with_package_uid(rtcm.packages(decoded)), batch_id)

    frames = frames_stream(spark, archive, batch_rows=500)
    decoded_stream = sp.stream_packages(frames)  # decoded envelope stream
    # the replay source does not support availableNow (see
    # streaming/replay.py) — drain with processAllAvailable like the
    # other replay-source streaming tests
    query = (
        decoded_stream.writeStream.foreachBatch(
            lambda df, bid: sink(with_package_uid(df), bid)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    query.processAllAvailable()
    query.stop()

    want = with_package_uid(rtcm.packages(decoded_events(spark, sf_dir)))
    con = duckdb.connect(db)
    got_n, want_n = con.execute("SELECT count(*) FROM rtcm_packages").fetchone()[0], want.count()
    assert got_n == want_n
    got_sum = con.execute("SELECT sum(msg_size), count(DISTINCT package_uid) FROM rtcm_packages").fetchone()
    want_sum = (want.groupBy().sum("msg_size").collect()[0][0], want.select("package_uid").distinct().count())
    assert (got_sum[0], got_sum[1]) == want_sum

    # replaying an already-committed batch id must be a no-op
    some_batch = want.limit(50)
    sink(some_batch, 0)
    assert con.execute("SELECT count(*) FROM rtcm_packages").fetchone()[0] == got_n

    # the reference dashboard's rate-per-mountpoint SQL runs unchanged
    rows = con.execute(
        "SELECT mountpoint, sum(msg_size) AS total_bytes FROM rtcm_packages "
        "GROUP BY mountpoint ORDER BY mountpoint"
    ).fetchall()
    want_rows = [
        (r["mountpoint"], r["total_bytes"])
        for r in want.groupBy("mountpoint").agg({"msg_size": "sum"})
        .withColumnRenamed("sum(msg_size)", "total_bytes")
        .orderBy("mountpoint").collect()
    ]
    assert rows == want_rows
    con.close()


def test_coordinate_upserts_last_writer_wins(spark, tmp_path):
    import datetime as dt

    db = str(tmp_path / "coords.duckdb")
    sink = sinks_sql.upsert_coordinates(db)
    schema = ("mountpoint string, ecef_x_m double, ecef_y_m double, "
              "ecef_z_m double, ant_height_m double, updated_at timestamp")
    t0 = dt.datetime(2024, 1, 1)
    b1 = spark.createDataFrame(
        [("MP1", 1.0, 2.0, 3.0, 0.1, t0), ("MP2", 4.0, 5.0, 6.0, 0.2, t0)], schema
    )
    # batch 2 updates MP1 (newer) AND races itself on MP2 (newest must win)
    b2 = spark.createDataFrame(
        [
            ("MP1", 10.0, 20.0, 30.0, 0.3, t0 + dt.timedelta(hours=1)),
            ("MP2", 7.0, 8.0, 9.0, 0.4, t0 + dt.timedelta(hours=2)),
            ("MP2", -1.0, -1.0, -1.0, 0.0, t0 + dt.timedelta(minutes=30)),
        ],
        schema,
    )
    sink(b1, 1)
    sink(b2, 2)
    sink(b2, 2)  # replay: no-op
    con = duckdb.connect(db)
    rows = {r[0]: r for r in con.execute(
        "SELECT mountpoint, ecef_x_m, updated_at FROM coordinates").fetchall()}
    assert len(rows) == 2
    assert rows["MP1"][1] == 10.0
    assert rows["MP2"][1] == 7.0  # newest in-batch writer won
    con.close()


def test_reconnect_point_update(tmp_path):
    import datetime as dt

    db = str(tmp_path / "conn.duckdb")
    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    sinks_sql.log_disconnect(db, 42, "MP1", t0)
    sinks_sql.log_disconnect(db, 42, "MP1", t0)  # replay-safe
    sinks_sql.update_reconnect(db, 42, t0 + dt.timedelta(seconds=75))
    con = duckdb.connect(db)
    row = con.execute(
        "SELECT mountpoint, disconnect_time, reconnect_time FROM connection_logger "
        "WHERE connection_id = 42"
    ).fetchone()
    assert row[0] == "MP1"
    assert (row[2] - row[1]).total_seconds() == 75
    con.close()


def test_observation_routing_into_six_tables(spark, sf_dir, tmp_path):
    """K2/D9 live: one decoded observation batch lands routed across
    the six constellation tables atomically; per-table counts match
    the batch's constellation histogram; replay is a no-op."""
    db = str(tmp_path / "obs.duckdb")
    obs = rtcm.observations(decoded_events(spark, sf_dir))
    sink = sinks_sql.append_observations(db)
    sink(obs, 7)
    sink(obs, 7)  # replay
    want = {r["constellation"]: r["count"] for r in obs.groupBy("constellation").count().collect()}
    from ntripmonitor_spark.sinks import OBS_TABLES

    con = duckdb.connect(db)
    total = 0
    for const, t in OBS_TABLES.items():
        n = con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        assert n == want.get(const, 0), (const, n, want.get(const, 0))
        total += n
    assert total == obs.count()
    con.close()


def test_sourcetable_startup_upsert(tmp_path):
    """K4 live: the composite-key metadata upsert refreshes changed
    rows and keeps the key space unique."""
    db = str(tmp_path / "st.duckdb")
    row = dict(mountpoint="MP1", identifier="Old", format="RTCM3",
               countrycode="DK", latitude=55.7, longitude=12.5,
               generator="g", casterprovider="casterA")
    sinks_sql.upsert_sourcetable(db, [row])
    sinks_sql.upsert_sourcetable(db, [dict(row, identifier="New", latitude=56.0)])
    con = duckdb.connect(db)
    rows = con.execute("SELECT mountpoint, identifier, latitude FROM sourcetable_constants").fetchall()
    assert rows == [("MP1", "New", 56.0)]
    con.close()
