"""Live NTRIP streaming DataSource (S1) — one partition per mountpoint.

Executor-side readers hold a TCP/SSL connection to the caster (HTTP GET
/{mountpoint}, Basic auth — `sources.ntrip_client`), run the
chunked-transfer decoder and the frame aligner incrementally, and emit
CRC-valid frames as (mountpoint, receive_time_us, frame) rows.

Design notes (SURVEY.md §7.3):

* A caster stream is NOT replayable, so offsets are batch generation
  counters, not byte positions — delivery is at-least-once and the
  first sink must be the bronze frame archive (from which everything
  downstream re-derives deterministically; the replay source then
  gives exact reprocessing).
* Connection state (socket, chunk decoder, frame buffer) lives in a
  per-executor cache keyed by (caster, mountpoint), surviving across
  micro-batches while the Python worker is reused.
* Reconnect-with-backoff mirrors D7 (fixed 5 s,
  src/databasehandling.py:287-307).

The protocol/alignment state machine (``MountpointStreamState``) is
sans-IO and unit-tested; only ``_read_socket_window`` touches the
network and is exercised against in-process fake sockets.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from ntripmonitor_spark.sources.framing import scan_frames
from ntripmonitor_spark.sources.ntrip_client import (
    ChunkedDecoder,
    build_request,
    parse_response_head,
)
from ntripmonitor_spark.streaming.replay import ARCHIVE_SCHEMA

RECONNECT_DELAY_S = 5.0  # D7: fixed NTRIP retry cadence


@dataclass
class MountpointStreamState:
    """Sans-IO per-connection state: HTTP head parse → optional chunk
    decode → frame alignment with carry-over."""

    mountpoint: str
    head_parsed: bool = False
    chunked: bool = False
    _raw: bytearray = field(default_factory=bytearray)
    _chunker: ChunkedDecoder = field(default_factory=ChunkedDecoder)
    _buf: bytes = b""

    def feed(self, data: bytes) -> list[bytes]:
        """Raw socket bytes in → complete CRC-valid frames out."""
        if not self.head_parsed:
            self._raw.extend(data)
            try:
                head, rest = parse_response_head(bytes(self._raw))
            except ValueError:
                return []  # header still incomplete
            if head.status != 200:
                raise ConnectionError(f"{self.mountpoint}: caster answered {head.status}")
            self.head_parsed = True
            self.chunked = head.chunked
            self._raw.clear()
            data = rest
        body = self._chunker.feed(data) if self.chunked else data
        self._buf += body
        frames, self._buf = scan_frames(self._buf, final=False)
        return frames


class _MountpointPartition(InputPartition):
    def __init__(self, idx: int, caster: dict):
        self.idx = idx
        self.caster = caster


# Per-executor connection cache: (url, mountpoint) → (socket, state).
_CONNECTIONS: dict = {}


def _connect(caster: dict):
    import socket
    import ssl

    url = caster["url"]
    scheme, rest = url.split("://", 1) if "://" in url else ("http", url)
    hostport = rest.rstrip("/")
    host, _, port = hostport.partition(":")
    port = int(port or (443 if scheme == "https" else 2101))
    sock = socket.create_connection((host, port), timeout=10.0)
    if scheme == "https":
        sock = ssl.create_default_context().wrap_socket(sock, server_hostname=host)
    sock.sendall(
        build_request(caster["mountpoint"], hostport,
                      caster.get("user", ""), caster.get("password", ""))
    )
    return sock


def _read_socket_window(caster: dict, window_s: float) -> list[tuple[str, int, bytes]]:
    """Read frames from one mountpoint connection for ~window_s."""
    key = (caster["url"], caster["mountpoint"])
    rows: list[tuple[str, int, bytes]] = []
    deadline = time.monotonic() + window_s
    while time.monotonic() < deadline:
        conn = _CONNECTIONS.get(key)
        if conn is None:
            try:
                sock = _connect(caster)
                conn = (sock, MountpointStreamState(caster["mountpoint"]))
                _CONNECTIONS[key] = conn
            except OSError:
                time.sleep(min(RECONNECT_DELAY_S, max(deadline - time.monotonic(), 0)))
                continue
        sock, state = conn
        try:
            sock.settimeout(max(min(deadline - time.monotonic(), 1.0), 0.05))
            data = sock.recv(8192)
            if not data:
                raise ConnectionError("EOF")
        # ConnectionError ⊂ OSError: the reconnect handler must come
        # FIRST or a graceful EOF falls into the retry-same-socket arm
        # and the dead connection is never dropped (D7 would stall).
        except ConnectionError:
            _CONNECTIONS.pop(key, None)
            continue
        except (TimeoutError, OSError):
            continue
        now_us = time.time_ns() // 1000
        try:
            for frame in state.feed(data):
                rows.append((caster["mountpoint"], now_us, frame))
        except ConnectionError:
            _CONNECTIONS.pop(key, None)
    return rows


class _LiveReader(DataSourceStreamReader):
    def __init__(self, options):
        casters = options.get("casters")
        if not casters:
            raise ValueError(
                'ntrip_live requires option casters=\'[{"url":…,"mountpoint":…,…}]\''
            )
        self.casters = json.loads(casters)
        self.window_s = float(options.get("window_s", "1.0"))
        self._gen = 0

    def initialOffset(self) -> dict:
        return {"gen": 0}

    def latestOffset(self) -> dict:
        # Live stream: every poll opens a new read window. Offsets are
        # generation counters (non-replayable source — bronze-first).
        self._gen += 1
        return {"gen": self._gen}

    def partitions(self, start: dict, end: dict):
        return [_MountpointPartition(i, c) for i, c in enumerate(self.casters)]

    def read(self, partition: _MountpointPartition):
        return iter(_read_socket_window(partition.caster, self.window_s))

    def commit(self, end: dict) -> None:
        pass


class NtripLiveDataSource(DataSource):
    """``spark.readStream.format("ntrip_live")
    .option("casters", json).option("window_s", "1.0")``"""

    @classmethod
    def name(cls) -> str:
        return "ntrip_live"

    def schema(self):
        return ARCHIVE_SCHEMA

    def streamReader(self, schema):
        return _LiveReader(self.options)


def register_live_source(spark) -> None:
    spark.dataSource.register(NtripLiveDataSource)
