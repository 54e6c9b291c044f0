"""S6 config enumeration: the reference's .env caster-group format
(src/ingestion.py:551-579) must round-trip into ntrip_live's casters
option and the sink settings."""

from __future__ import annotations

import json

from ntripmonitor_spark.config import (
    CasterSettings,
    casters_option,
    jdbc_options,
    jdbc_url,
    load_caster_settings,
    load_db_settings,
    load_engine_settings,
    read_dotenv,
)

ENV = {
    "1_CASTER_ID": "gnss-main",
    "1_CASTER_URL": "http://caster.example:2101",
    "1_CASTER_USER": "alice",
    "1_CASTER_PASSWORD": "s3cret",
    "1_CASTER_MOUNTPOINT": "MPT00 , MPT01,MPT02",
    "2_CASTER_ID": "Empty",  # reference skips literal "Empty"
    "2_CASTER_URL": "http://ignored.example",
    "3_CASTER_ID": "gnss-backup",
    "3_CASTER_URL": "https://backup.example:443",
    # no user/password/mountpoint keys for 3 → defaults
    "DB_HOST": "db.example",
    "DB_PORT": "5433",
    "DB_NAME": "gnss",
    "DB_USER": "writer",
    "DB_PASSWORD": "pw",
    "DB_STORE_OBSERVATIONS": "False",
    "MAX_READERS": "2",
    "READERS_PER_DECODER": "4",
    "MULTIPROCESSING_ACTIVE": "True",
    "CLEAR_CHECK": "0.5",
    "APPEND_CHECK": "1.5",
}


def test_caster_groups_enumerated():
    casters = load_caster_settings(env=ENV)
    assert set(casters) == {"gnss-main", "gnss-backup"}  # "Empty" skipped
    main = casters["gnss-main"]
    assert main.url == "http://caster.example:2101"
    assert main.user == "alice" and main.password == "s3cret"
    assert main.mountpoints == ["MPT00", "MPT01", "MPT02"]  # stripped
    backup = casters["gnss-backup"]
    assert backup.user == "" and backup.mountpoints == []


def test_empty_mountpoint_string_yields_no_mountpoints():
    env = {"9_CASTER_ID": "c", "9_CASTER_MOUNTPOINT": ""}
    assert load_caster_settings(env=env)["c"].mountpoints == []


def test_casters_option_one_entry_per_mountpoint():
    casters = load_caster_settings(env=ENV)
    entries = json.loads(casters_option(casters))
    assert [(e["caster_id"], e["mountpoint"]) for e in entries] == [
        ("gnss-main", "MPT00"),
        ("gnss-main", "MPT01"),
        ("gnss-main", "MPT02"),
    ]
    assert entries[0]["url"] == "http://caster.example:2101"
    assert entries[0]["user"] == "alice"
    # MAX_READERS caps total stream partitions
    assert len(json.loads(casters_option(casters, max_readers=2))) == 2


def test_db_and_engine_settings():
    db = load_db_settings(env=ENV)
    assert (db.host, db.port, db.database) == ("db.example", 5433, "gnss")
    assert db.store_observations is False  # literal-"True" comparison
    assert jdbc_url(db) == "jdbc:postgresql://db.example:5433/gnss"
    assert jdbc_options(db)["user"] == "writer"
    eng = load_engine_settings(env=ENV)
    assert eng.max_readers == 2 and eng.readers_per_decoder == 4
    assert eng.clear_check == 0.5 and eng.append_check == 1.5


def test_dotenv_reader(tmp_path):
    p = tmp_path / ".env"
    p.write_text(
        "# comment\n"
        "export 1_CASTER_ID=gnss-x\n"
        "1_CASTER_URL='http://q.example:2101'\n"
        '1_CASTER_PASSWORD="p#w=1"\n'
        "1_CASTER_MOUNTPOINT=A,B\n"
        "\n"
        "not a valid line\n"
    )
    env = read_dotenv(str(p))
    assert env["1_CASTER_ID"] == "gnss-x"
    assert env["1_CASTER_URL"] == "http://q.example:2101"
    assert env["1_CASTER_PASSWORD"] == "p#w=1"  # quotes stripped, # kept
    casters = load_caster_settings(env={}, dotenv_path=str(p))
    assert casters["gnss-x"].mountpoints == ["A", "B"]


def test_process_env_overrides_dotenv():
    # mirrors python-dotenv load_dotenv(override=False), as the reference
    # uses it: a var already present in the process env wins over the file;
    # keys only in the file are still picked up.
    import tempfile, os as _os

    with tempfile.NamedTemporaryFile("w", suffix=".env", delete=False) as f:
        f.write("5_CASTER_ID=from-file\n6_CASTER_ID=file-only\n")
        path = f.name
    try:
        casters = load_caster_settings(
            env={"5_CASTER_ID": "from-env"}, dotenv_path=path
        )
        assert "from-env" in casters and "from-file" not in casters
        assert "file-only" in casters
    finally:
        _os.unlink(path)


def test_settings_dataclass_defaults():
    c = CasterSettings()
    assert c.mountpoints == [] and c.url == ""
