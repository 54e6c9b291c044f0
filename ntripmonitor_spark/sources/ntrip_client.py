"""NTRIP caster protocol: request building, response parsing, chunked
transfer decoding, sourcetable parsing (S1, S2, S5, S6).

The wire-protocol logic is pure functions/classes (fully unit-testable
without a network); the socket layer is a thin wrapper the streaming
DataSource uses and is import-gated so the engine runs in offline
environments. Protocol behavior mirrors the reference client
(`src/ntripclient.py:117-170` request, `:261-305` response parse,
`:441-503` chunked decode, `:359-401` sourcetable) re-expressed as a
sans-IO state machine.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass, field

NTRIP_AGENT = "NTRIP ntripmonitor_spark/0.1"


def build_request(mountpoint: str, host: str, user: str = "", password: str = "",
                  ntrip_version: str = "Ntrip/2.0") -> bytes:
    """HTTP GET for a mountpoint stream with Basic auth."""
    lines = [
        f"GET /{mountpoint} HTTP/1.1",
        f"Host: {host}",
        f"Ntrip-Version: {ntrip_version}",
        f"User-Agent: {NTRIP_AGENT}",
    ]
    if user or password:
        token = base64.b64encode(f"{user}:{password}".encode()).decode()
        lines.append(f"Authorization: Basic {token}")
    lines += ["Connection: close", "", ""]
    return "\r\n".join(lines).encode()


def build_sourcetable_request(host: str) -> bytes:
    """HTTP GET / — the caster directory listing."""
    return build_request("", host)


@dataclass
class ResponseHead:
    status: int
    headers: dict[str, str]
    chunked: bool


def parse_response_head(raw: bytes) -> tuple[ResponseHead, bytes]:
    """Parse an HTTP/ICY response header block; returns the head and
    any body bytes that followed it in the same read."""
    sep = raw.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("incomplete response header")
    head_lines = raw[:sep].decode("latin-1").split("\r\n")
    status_parts = head_lines[0].split(" ", 2)
    if len(status_parts) < 2 or not status_parts[1].isdigit():
        # Ntrip/1.0 casters answer "ICY 200 OK"
        raise ValueError(f"bad status line: {head_lines[0]!r}")
    headers = {}
    for line in head_lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    chunked = headers.get("transfer-encoding", "").lower() == "chunked"
    return ResponseHead(int(status_parts[1]), headers, chunked), raw[sep + 4:]


@dataclass
class ChunkedDecoder:
    """Incremental HTTP chunked-transfer decoder (sans-IO).

    Feed raw socket bytes; collect decoded payload bytes. Mirrors the
    chunk-length/CRLF-trailer handling of `src/ntripclient.py:441-503`
    but as a resumable state machine instead of blocking reads.
    """

    _buf: bytearray = field(default_factory=bytearray)
    done: bool = False

    def feed(self, data: bytes) -> bytes:
        self._buf.extend(data)
        out = bytearray()
        while True:
            nl = self._buf.find(b"\r\n")
            if nl < 0:
                break
            try:
                size = int(bytes(self._buf[:nl]).split(b";")[0], 16)
            except ValueError as exc:
                raise ValueError(f"bad chunk length line: {bytes(self._buf[:nl])!r}") from exc
            start = nl + 2
            end = start + size
            if len(self._buf) < end + 2:
                break  # whole chunk + trailer not here yet
            if bytes(self._buf[end:end + 2]) != b"\r\n":
                raise ValueError("missing CRLF chunk trailer")
            if size == 0:
                self.done = True
                del self._buf[: end + 2]
                break
            out.extend(self._buf[start:end])
            del self._buf[: end + 2]
        return bytes(out)


# ---------------------------------------------------------------------------
# Sourcetable (S5 + P18-P20)
# ---------------------------------------------------------------------------

SOURCETABLE_END = "ENDSOURCETABLE"

# Projected columns of an STR row (src/ingestion.py:476-483 keeps
# fields [1,2,3,8,9,10,13] of the ';'-split line).
STR_FIELDS = {1: "mountpoint", 2: "identifier", 3: "format", 8: "countrycode",
              9: "latitude", 10: "longitude", 13: "generator"}


def parse_sourcetable(text: str, caster_id: str = "") -> list[dict]:
    """';'-split directory rows; keep STR rows, project the reference's
    column subset, first-wins dedupe on mountpoint (P19)."""
    rows: list[dict] = []
    seen: set[str] = set()
    for line in text.splitlines():
        line = line.strip()
        if line == SOURCETABLE_END:
            break
        parts = line.split(";")
        if not parts or parts[0] != "STR":
            continue
        row = {name: (parts[i] if i < len(parts) else None) for i, name in STR_FIELDS.items()}
        row["casterprovider"] = caster_id
        mp = row["mountpoint"]
        if mp in seen:
            continue  # duplicate mountpoint: first wins
        seen.add(mp)
        rows.append(row)
    return rows


def live_casters(tables: dict[str, list[dict] | None]) -> dict[str, list[dict]]:
    """Drop casters whose sourcetable fetch failed (P20)."""
    return {cid: rows for cid, rows in tables.items() if rows}
