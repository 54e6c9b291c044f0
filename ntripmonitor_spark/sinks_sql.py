"""Real-SQL-database sink: the reference's PostgreSQL surface (K1–K5,
SURVEY.md §2.4) exercised END TO END against an actual SQL engine.

The test container ships no JDBC driver jar, so the distributed
append path (`sinks.write_jdbc_append`) cannot run live. DuckDB — a
real SQL database with PostgreSQL-compatible ``INSERT … ON CONFLICT``
— stands in at the harness scale: every statement this module issues
(typed appends, last-writer upserts, point updates, batch-ledger
bookkeeping) is the statement the reference's stored procedures
implement, executed against real tables with real constraint
enforcement, so "the dashboards' SQL works against what we wrote" is
provable in-container.

Scope note (100 TB): DuckDB here is embedded and single-writer, so the
micro-batch funnels through one connection — fine for proving sink
SEMANTICS; the production path is the same foreachBatch body with the
distributed JDBC writer doing the append leg. Exactly-once comes from
the ``_ingest_ledger`` table: each batch commits its rows and its
batch_id in ONE transaction, so a checkpoint replay of a committed
batch is a no-op and a crash between rows and ledger rolls both back.
"""

from __future__ import annotations

import duckdb

from pyspark.sql import DataFrame

PACKAGES_DDL = """
CREATE TABLE IF NOT EXISTS rtcm_packages (
    package_uid BIGINT,
    mountpoint VARCHAR,
    receive_time TIMESTAMP,
    msg_type INTEGER,
    msg_size INTEGER,
    sat_count INTEGER,
    obs_epoch TIMESTAMP
);
CREATE TABLE IF NOT EXISTS coordinates (
    mountpoint VARCHAR PRIMARY KEY,
    ecef_x_m DOUBLE, ecef_y_m DOUBLE, ecef_z_m DOUBLE,
    ant_height_m DOUBLE, updated_at TIMESTAMP
);
CREATE TABLE IF NOT EXISTS connection_logger (
    connection_id BIGINT PRIMARY KEY,
    mountpoint VARCHAR,
    disconnect_time TIMESTAMP,
    reconnect_time TIMESTAMP
);
CREATE TABLE IF NOT EXISTS _ingest_ledger (
    sink VARCHAR, batch_id BIGINT,
    n_rows BIGINT,
    PRIMARY KEY (sink, batch_id)
);
"""


def connect(db_path: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect(db_path)
    con.execute(PACKAGES_DDL)
    return con


def _already_committed(con, sink: str, batch_id: int) -> bool:
    return bool(
        con.execute(
            "SELECT 1 FROM _ingest_ledger WHERE sink = ? AND batch_id = ?",
            [sink, batch_id],
        ).fetchone()
    )


def append_packages(db_path: str):
    """K1 foreachBatch body: typed envelope append + ledger, one
    transaction — replaying a committed batch_id is a no-op."""

    def write(batch: DataFrame, batch_id: int) -> None:
        pdf = batch.toPandas()
        con = connect(db_path)
        try:
            if _already_committed(con, "packages", batch_id):
                return
            con.register("batch_df", pdf)
            con.execute("BEGIN")
            con.execute(
                "INSERT INTO rtcm_packages "
                "SELECT package_uid, mountpoint, receive_time, msg_type, "
                "       msg_size, sat_count, obs_epoch FROM batch_df"
            )
            con.execute(
                "INSERT INTO _ingest_ledger VALUES ('packages', ?, ?)",
                [batch_id, len(pdf)],
            )
            con.execute("COMMIT")
        finally:
            con.close()

    return write


def upsert_coordinates(db_path: str):
    """K3 foreachBatch body: last-writer-wins per mountpoint via the
    reference's INSERT … ON CONFLICT DO UPDATE, against a real PRIMARY
    KEY. The batch is pre-deduped to its newest row per key (a batch
    must not race itself), then upserted inside the ledger
    transaction."""
    from ntripmonitor_spark.sinks import dedupe_last_writer

    def write(batch: DataFrame, batch_id: int) -> None:
        deduped = dedupe_last_writer(batch, ["mountpoint"], "updated_at").toPandas()
        con = connect(db_path)
        try:
            if _already_committed(con, "coordinates", batch_id):
                return
            con.register("batch_df", deduped)
            con.execute("BEGIN")
            con.execute(
                "INSERT INTO coordinates "
                "SELECT mountpoint, ecef_x_m, ecef_y_m, ecef_z_m, ant_height_m, updated_at "
                "FROM batch_df "
                "ON CONFLICT (mountpoint) DO UPDATE SET "
                "ecef_x_m = EXCLUDED.ecef_x_m, ecef_y_m = EXCLUDED.ecef_y_m, "
                "ecef_z_m = EXCLUDED.ecef_z_m, ant_height_m = EXCLUDED.ant_height_m, "
                "updated_at = EXCLUDED.updated_at"
            )
            con.execute(
                "INSERT INTO _ingest_ledger VALUES ('coordinates', ?, ?)",
                [batch_id, len(deduped)],
            )
            con.execute("COMMIT")
        finally:
            con.close()

    return write


def log_disconnect(db_path: str, connection_id: int, mountpoint: str,
                   disconnect_time) -> None:
    """K5 insert half (reference: INSERT … RETURNING id; the id here is
    caller-minted, replay-stable)."""
    con = connect(db_path)
    try:
        con.execute(
            "INSERT INTO connection_logger VALUES (?, ?, ?, NULL) "
            "ON CONFLICT (connection_id) DO NOTHING",
            [connection_id, mountpoint, disconnect_time],
        )
    finally:
        con.close()


def update_reconnect(db_path: str, connection_id: int, reconnect_time) -> None:
    """K5 point update (initdb/99-stored_procedures.sql:195-206)."""
    con = connect(db_path)
    try:
        con.execute(
            "UPDATE connection_logger SET reconnect_time = ? WHERE connection_id = ?",
            [reconnect_time, connection_id],
        )
    finally:
        con.close()


OBS_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
    mountpoint VARCHAR,
    obs_epoch TIMESTAMP,
    msg_type INTEGER,
    sat_id VARCHAR,
    sat_signal VARCHAR,
    code DOUBLE,
    phase DOUBLE,
    doppler DOUBLE,
    snr DOUBLE,
    lock DOUBLE
);
"""

SOURCETABLE_DDL = """
CREATE TABLE IF NOT EXISTS sourcetable_constants (
    mountpoint VARCHAR, identifier VARCHAR, format VARCHAR,
    countrycode VARCHAR, latitude DOUBLE, longitude DOUBLE,
    generator VARCHAR, casterprovider VARCHAR,
    PRIMARY KEY (mountpoint, countrycode, casterprovider)
);
"""

_OBS_COLS = ("mountpoint, obs_epoch, msg_type, sat_id, sat_signal, "
             "code, phase, doppler, snr, lock")


def append_observations(db_path: str):
    """K2/D9 foreachBatch body: ONE decoded observation micro-batch
    routed into the six constellation tables (the reference's
    per-constellation stored procedures, src/databasehandling.py:60-129)
    inside a single ledger transaction — all six appends and the
    batch_id commit or roll back together."""
    from ntripmonitor_spark.sinks import OBS_TABLES

    def write(batch: DataFrame, batch_id: int) -> None:
        pdf = batch.toPandas()
        con = connect(db_path)
        try:
            for t in OBS_TABLES.values():
                con.execute(OBS_DDL.format(table=t))
            if _already_committed(con, "observations", batch_id):
                return
            con.register("batch_df", pdf)
            con.execute("BEGIN")
            for const, t in OBS_TABLES.items():
                con.execute(
                    f"INSERT INTO {t} SELECT {_OBS_COLS} "
                    f"FROM batch_df WHERE constellation = ?",
                    [const],
                )
            con.execute(
                "INSERT INTO _ingest_ledger VALUES ('observations', ?, ?)",
                [batch_id, len(pdf)],
            )
            con.execute("COMMIT")
        finally:
            con.close()

    return write


def upsert_sourcetable(db_path: str, rows: list[dict]) -> None:
    """K4 one-shot startup upsert (initdb/99-stored_procedures.sql:
    154-178): metadata refresh keyed by (mountpoint, countrycode,
    casterprovider) against a real composite PRIMARY KEY."""
    con = connect(db_path)
    try:
        con.execute(SOURCETABLE_DDL)
        con.executemany(
            "INSERT INTO sourcetable_constants VALUES (?, ?, ?, ?, ?, ?, ?, ?) "
            "ON CONFLICT (mountpoint, countrycode, casterprovider) DO UPDATE SET "
            "identifier = EXCLUDED.identifier, format = EXCLUDED.format, "
            "latitude = EXCLUDED.latitude, longitude = EXCLUDED.longitude, "
            "generator = EXCLUDED.generator",
            [
                [r.get("mountpoint"), r.get("identifier"), r.get("format"),
                 r.get("countrycode"), r.get("latitude"), r.get("longitude"),
                 r.get("generator"), r.get("casterprovider")]
                for r in rows
            ],
        )
    finally:
        con.close()
