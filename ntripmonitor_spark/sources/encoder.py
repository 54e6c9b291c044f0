"""RTCM v3 frame ENCODER — deterministic test-fixture generator.

The reference can only encode message 1029 (`src/rtcm3.py:80-96`); the
engine's test strategy (SURVEY.md §5.1) needs golden frames for every
decoded type, so this module encodes 1005/1006, 1029 and MSM5/MSM7 from
plain dicts, using the same bit layouts the decoder reads
(`src/rtcm3.py:316-391` / RTCM 10403). Encode→decode round-trips are
the property-based correctness check, and the pipeline fixture queries
(plans/rtcm.py) derive frames from the ``events`` table with it.
"""

from __future__ import annotations

from ntripmonitor_spark.functions.bitio import BitWriter
from ntripmonitor_spark.functions.crc24q import append_crc

PREAMBLE = 0xD3


def frame(payload: bytes) -> bytes:
    """Wrap a payload in the RTCM envelope: preamble, 6 reserved bits,
    10-bit length, payload, CRC-24Q (src/ntripclient.py:20-21,523-536)."""
    if len(payload) > 1023:
        raise ValueError("payload too long for 10-bit length field")
    head = BitWriter().uint(PREAMBLE, 8).pad(6).uint(len(payload), 10).to_bytes()
    return append_crc(head + payload)


def encode_1029(station_id: int, mjd: int, utc_s: int, text: str) -> bytes:
    """Unicode text message (layout src/rtcm3.py:342)."""
    data = text.encode("utf-8")
    w = (
        BitWriter()
        .uint(1029, 12)
        .uint(station_id, 12)
        .uint(mjd, 16)
        .uint(utc_s, 17)
        .uint(len(text), 7)
        .uint(len(data), 8)
        .raw_bytes(data)
    )
    return frame(w.to_bytes())


def encode_1005(station_id: int, ecef_x: int, ecef_y: int, ecef_z: int,
                ant_height: int | None = None) -> bytes:
    """Station ARP, ECEF in 1e-4 m ints (layout src/rtcm3.py:344-357);
    pass ant_height for the 1006 variant."""
    w = (
        BitWriter()
        .uint(1006 if ant_height is not None else 1005, 12)
        .uint(station_id, 12)
        .uint(0, 6)      # ITRF realization year
        .bit(1).bit(0).bit(0)  # GPS / GLONASS / Galileo indicators
        .bit(0)          # reference-station indicator
        .sint(ecef_x, 38)
        .bit(0)          # single receiver oscillator
        .pad(1)
        .sint(ecef_y, 38)
        .pad(2)
        .sint(ecef_z, 38)
    )
    if ant_height is not None:
        w.uint(ant_height, 16)
    return frame(w.to_bytes())


def encode_msm(
    msg_type: int,
    station_id: int,
    epoch: int,
    sat_slots: list[int],
    sig_slots: list[int],
    sats: list[dict],
    cells: list[dict],
    cell_mask: str | None = None,
    glonass_dow: int = 0,
) -> bytes:
    """MSM5/MSM7 message.

    ``sat_slots``/``sig_slots`` are 0-based mask bit indices (ascending);
    ``sats`` dicts carry int_ms/ext_info/mod1ms/rough_rate; ``cells``
    dicts carry fine_code/fine_phase/lock/half_cycle/cnr/fine_rate, one
    per '1' in ``cell_mask`` (default: all cells present). For GLONASS
    types (1081-1087) the 30-bit epoch is DOW(3)|TOD(27)
    (src/rtcm3.py:106-109,366).
    """
    level = msg_type % 10
    if level not in (1, 2, 3, 4, 5, 6, 7):
        raise ValueError(f"not an MSM type: {msg_type}")
    nsat, nsig = len(sat_slots), len(sig_slots)
    if cell_mask is None:
        cell_mask = "1" * (nsat * nsig)
    if len(cell_mask) != nsat * nsig:
        raise ValueError("cell_mask length must be nsat*nsig")
    if sum(ch == "1" for ch in cell_mask) != len(cells):
        raise ValueError("cells count must equal popcount(cell_mask)")

    if 1081 <= msg_type <= 1087:
        epoch30 = (glonass_dow << 27) | epoch
    else:
        epoch30 = epoch

    w = (
        BitWriter()
        .uint(msg_type, 12)
        .uint(station_id, 12)
        .uint(epoch30, 30)
        .bit(0)          # multiple-message flag
        .uint(0, 3)      # IODS
        .pad(7)          # reserved
        .uint(0, 2)      # clock steering
        .uint(0, 2)      # external clock
        .bit(0)          # divergence-free smoothing
        .bin("000")      # smoothing interval
    )
    w.bin("".join("1" if i in set(sat_slots) else "0" for i in range(64)))
    w.bin("".join("1" if i in set(sig_slots) else "0" for i in range(32)))
    w.bin(cell_mask)

    # Satellite block, field-major (all int_ms, then all ext, ...) —
    # matching the reference's read order (src/rtcm3.py:161-163).
    # MSM1-3 satellites are the 10-bit rough-range-mod-1-ms alone;
    # MSM4/6 add int_ms but no ext_info / rough rate (RTCM 10403; the
    # reference's non-5/7 decode crash is NOT reproduced — SURVEY.md
    # §7.3).
    if level >= 4:
        for s in sats:
            w.uint(s["int_ms"], 8)
    if level in (5, 7):
        for s in sats:
            w.uint(s["ext_info"], 4)
    for s in sats:
        w.uint(s["mod1ms"], 10)
    if level in (5, 7):
        for s in sats:
            w.sint(s["rough_rate"], 14)

    # Signal block, field-major (src/rtcm3.py:164-167). MSM1-5 use the
    # 15/22-bit fine fields, MSM6/7 the 20/24-bit high-res ones; the
    # lower levels carry subsets (MSM1: code; MSM2: phase+lock+half;
    # MSM3: both; MSM4+ adds CNR; 5/7 add the fine rate).
    if level == 1:
        widths = [("fine_code", 15, True)]
    elif level == 2:
        widths = [("fine_phase", 22, True), ("lock", 4, False), ("half_cycle", 1, False)]
    elif level == 3:
        widths = [("fine_code", 15, True), ("fine_phase", 22, True), ("lock", 4, False),
                  ("half_cycle", 1, False)]
    elif level in (4, 5):
        widths = [("fine_code", 15, True), ("fine_phase", 22, True), ("lock", 4, False),
                  ("half_cycle", 1, False), ("cnr", 6, False)]
    else:
        widths = [("fine_code", 20, True), ("fine_phase", 24, True), ("lock", 10, False),
                  ("half_cycle", 1, False), ("cnr", 10, False)]
    if level in (5, 7):
        widths.append(("fine_rate", 15, True))
    for name, nbits, signed in widths:
        for c in cells:
            v = int(c[name])
            if signed:
                w.sint(v, nbits)
            else:
                w.uint(v, nbits)
    return frame(w.to_bytes())


_LEGACY_OBS_BITS = {
    1001: 58, 1002: 74, 1003: 110, 1004: 134,
    1009: 63, 1010: 79, 1011: 115, 1012: 139,
}


def encode_legacy(
    msg_type: int, station_id: int, epoch_ms: int, nsat: int,
    records: list[dict] | None = None,
) -> bytes:
    """Legacy GPS/GLONASS observable message (1001-1004 / 1009-1012).

    With ``records`` (one dict per satellite, keys from the type's
    layout — src/rtcm3.py:320-339) the per-sat observation records are
    encoded field-for-field; without, they are zero-filled (enough for
    the envelope-level tests; the reference never stores legacy
    observations either, src/decoderclasses.py:256-316)."""
    from ntripmonitor_spark.operators.rtcm import LEGACY_LAYOUTS

    if msg_type not in _LEGACY_OBS_BITS:
        raise ValueError(f"not a legacy observable type: {msg_type}")
    if records is not None and len(records) != nsat:
        raise ValueError("records count must equal nsat")
    w = (
        BitWriter()
        .uint(msg_type, 12)
        .uint(station_id, 12)
        .uint(epoch_ms, 30 if msg_type <= 1004 else 27)
        .bit(0)          # synchronous GNSS flag
        .uint(nsat, 5)
        .bit(0)          # smoothing
        .bin("000")      # smoothing interval
    )
    if records is None:
        w.pad(nsat * _LEGACY_OBS_BITS[msg_type])
    else:
        for rec in records:
            for name, nbits, signed in LEGACY_LAYOUTS[msg_type]:
                v = int(rec[name])
                if signed:
                    w.sint(v, nbits)
                else:
                    w.uint(v, nbits)
    return frame(w.to_bytes())


def msm_payload_bits(level: int, nsat: int, nsig: int, ncells: int) -> int:
    """Analytic payload size in bits (oracle-checkable msg_size)."""
    header = 169 + nsat * nsig
    sat = nsat * (8 + 4 + 10 + 14)
    cell = ncells * ((15 + 22 + 4 + 1 + 6 + 15) if level == 5 else (20 + 24 + 10 + 1 + 10 + 15))
    return header + sat + cell
