"""Golden parity: the vectorized batch decoder (operators/rtcm_vec)
must agree field-for-field with the row-wise reference decoder
(`rtcm._decode_one`) on every frame class — MSM5/7 across
constellations, MSM envelope-only levels, legacy observables, 1005/6,
1029, unknown types, CRC-corrupt and truncated frames."""

from __future__ import annotations

import numpy as np
import pytest

from ntripmonitor_spark.functions.bitvec import (
    frames_matrix,
    popcount64,
    ragged_indices,
    read_mask,
    read_sint,
    read_uint,
)
from ntripmonitor_spark.functions.bitio import BitReader, BitWriter
from ntripmonitor_spark.functions.crc24q import (
    append_crc,
    crc24q,
    crc24q_batch,
    frame_crc_ok_batch,
)
from ntripmonitor_spark.operators.rtcm import _decode_one
from ntripmonitor_spark.operators.rtcm_vec import decode_matrix, decoded_record_batch
from ntripmonitor_spark.sources import encoder


def _rng_fields(e: int, level: int, nsat: int, ncells: int):
    sats = [
        {
            "int_ms": (e + j) % 128,
            "ext_info": j % 16,
            "mod1ms": (e * 31 + j * 7) % 1024,
            "rough_rate": ((e * 13 + j * 101) % 16384) - 8192,
        }
        for j in range(nsat)
    ]
    hi = level in (6, 7)
    cells = [
        {
            "fine_code": ((e * 7919 + c * 131) % (1 << (20 if hi else 15))) - (1 << (19 if hi else 14)),
            "fine_phase": ((e * 104729 + c * 7919) % (1 << (24 if hi else 22))) - (1 << (23 if hi else 21)),
            "lock": (e + c) % (1024 if hi else 16),
            "half_cycle": (e + c) % 2,
            "cnr": (e * 3 + c) % (1024 if hi else 64),
            "fine_rate": ((e * 17 + c * 29) % (1 << 15)) - (1 << 14),
        }
        for c in range(ncells)
    ]
    return sats, cells


def _fixture_frames() -> list[bytes]:
    frames: list[bytes] = []
    for e, t in enumerate((1075, 1077, 1087, 1097, 1107, 1117, 1127)):
        nsat = 1 + e % 3
        level = t % 10
        ncell_pos = nsat * 2
        drop = e % 2 == 1
        cell_mask = "".join(
            "0" if (drop and c == ncell_pos - 1) else "1" for c in range(ncell_pos)
        )
        sats, cells = _rng_fields(e, level, nsat, cell_mask.count("1"))
        frames.append(
            encoder.encode_msm(
                t, 100 + e, 3_600_000 + e, [(e % 50) + j for j in range(nsat)],
                [1, 7], sats, cells, cell_mask=cell_mask,
                glonass_dow=(3 if 1081 <= t <= 1087 else 0),
            )
        )
    # GLONASS MSM5 with DOW
    sats, cells = _rng_fields(9, 5, 2, 4)
    frames.append(encoder.encode_msm(1085, 7, 80_000_000, [4, 9], [1, 7], sats, cells, glonass_dow=5))
    # MSM1/2/3: 10-bit rough-only sat block, per-level cell subsets
    for t123 in (1071, 1082, 1093, 1101, 1112, 1123, 1113):
        sats, cells = _rng_fields(17 + t123 % 10, t123 % 10, 2, 4)
        frames.append(
            encoder.encode_msm(
                t123, 42, 5_400_000, [2, 7], [1, 7], sats, cells,
                glonass_dow=(6 if 1081 <= t123 <= 1087 else 0),
            )
        )
    # truncated MSM2: sat block complete, cell block cut short →
    # sats decode, cells stay null (both decoders)
    w2 = (
        BitWriter().uint(1072, 12).uint(9, 12).uint(777, 30)
        .bit(0).uint(0, 3).pad(7).uint(0, 2).uint(0, 2).bit(0).uint(0, 3)
    )
    w2.bin("0" * 5 + "1" + "0" * 58)  # 1 sat
    w2.bin("1" + "0" * 31)            # 1 signal
    w2.bin("1")                        # 1 cell
    w2.uint(512, 10)                   # sat rough mod1ms
    w2.uint(3, 2)                      # 2 of the 27 cell bits only
    frames.append(encoder.frame(w2.to_bytes()))
    # MSM4 / MSM6 (no ext_info / rates — graceful decode, SURVEY §7.3)
    for t4 in (1074, 1096, 1086):
        sats, cells = _rng_fields(11 + t4 % 10, t4 % 10, 2, 4)
        frames.append(
            encoder.encode_msm(
                t4, 31, 7_200_000, [3, 8], [1, 7], sats, cells,
                glonass_dow=(2 if 1081 <= t4 <= 1087 else 0),
            )
        )
    # envelope-only MSM level (MSM4): header + masks only
    w = (
        BitWriter().uint(1074, 12).uint(55, 12).uint(1234, 30)
        .bit(0).uint(0, 3).pad(7).uint(0, 2).uint(0, 2).bit(0).uint(0, 3)
    )
    w.bin("0" * 10 + "1" + "0" * 53)  # sat mask: 1 sat
    w.bin("01" + "0" * 30)            # sig mask: 1 signal
    w.bin("1")                         # cell mask
    frames.append(encoder.frame(w.to_bytes()))
    # legacy GPS + GLONASS (zero-filled records)
    frames.append(encoder.encode_legacy(1004, 321, 3_600_000, nsat=7))
    frames.append(encoder.encode_legacy(1012, 99, 80_000_000, nsat=3))
    # legacy with real per-sat records, all eight types
    for i, t in enumerate((1001, 1002, 1003, 1004, 1009, 1010, 1011, 1012)):
        nsat = 1 + i % 3
        recs = []
        for k in range(nsat):
            rec = {
                "sat_id_raw": (i + 3 * k) % 32 + 1,
                "l1_code": (i + k) % 2,
                "l1_pr": (i * 9973 + k * 131) % (1 << 24),
                "l1_phr_diff": ((i * 104729 + k * 7919) % (1 << 20)) - (1 << 19),
                "l1_lock": (i + k) % 128,
                "l1_amb": (i * 3 + k) % 256,
                "l1_cnr": (i * 5 + k) % 256,
                "fcn": (i * 3 + k) % 21,
                "l2_code": (i + k + 1) % 2,
                "l2_pr": (i * 31337 + k * 271) % (1 << 24),
                "l2_phr_diff": ((i * 271 + k * 17) % (1 << 20)) - (1 << 19),
                "l2_lock": (i + k + 3) % 128,
                "l2_cnr": (i * 7 + k) % 256,
            }
            recs.append(rec)
        frames.append(encoder.encode_legacy(t, 100 + i, 3_600_000 + i, nsat, records=recs))
    # truncated legacy: nsat says 5, only ~2 records on the wire →
    # header decodes, records don't (both decoders: legacy null)
    wl = (
        BitWriter().uint(1002, 12).uint(77, 12).uint(12345, 30)
        .bit(0).uint(5, 5).bit(0).bin("000").pad(150)
    )
    frames.append(encoder.frame(wl.to_bytes()))
    # DF396 violation: nsat*nsig = 9*8 = 72 > 64 → envelope-only in
    # both decoders
    sats9 = [{"int_ms": j, "ext_info": 0, "mod1ms": j, "rough_rate": 0} for j in range(9)]
    cells36 = [
        {"fine_code": 0, "fine_phase": 0, "lock": 0, "half_cycle": 0, "cnr": 0, "fine_rate": 0}
        for _ in range(36)
    ]
    frames.append(
        encoder.encode_msm(
            1075, 5, 1000, list(range(9)), list(range(8)), sats9, cells36,
            cell_mask="10" * 36,
        )
    )
    # empty signal mask: nsat*nsig = 0 → cell_mask '' in both decoders
    sats2 = [{"int_ms": 1, "ext_info": 2, "mod1ms": 3, "rough_rate": 4} for _ in range(2)]
    frames.append(encoder.encode_msm(1075, 6, 2000, [3, 9], [], sats2, [], cell_mask=""))
    # station coordinates
    frames.append(encoder.encode_1005(900, -12345678, 87654321, 1, ant_height=None))
    frames.append(encoder.encode_1005(901, 2**37 - 1, -(2**37), 0, ant_height=65535))
    # text
    frames.append(encoder.encode_1029(44, 59000, 43200, "héllo wörld"))
    frames.append(encoder.encode_1029(44, 59000, 43200, ""))
    # unknown type
    frames.append(encoder.frame(BitWriter().uint(1019, 12).uint(0xABC, 12).to_bytes()))
    # CRC-corrupt
    good = frames[0]
    frames.append(good[:-1] + bytes([good[-1] ^ 0x5A]))
    # truncated-but-CRC-valid MSM header (payload shorter than 169 bits)
    frames.append(encoder.frame(BitWriter().uint(1075, 12).uint(1, 12).uint(5, 30).to_bytes()))
    # tiny garbage
    frames.append(b"\xd3\x00\x00" + crc24q(b"\xd3\x00\x00").to_bytes(3, "big"))
    return frames


def test_vectorized_matches_rowwise():
    frames = _fixture_frames()
    batch = decoded_record_batch(
        __import__("pyarrow").array(["MP"] * len(frames)),
        __import__("pyarrow").array([0] * len(frames), type="int64"),
        frames,
    )
    got = batch.to_pylist()
    for frame, vec in zip(frames, got):
        ref = _decode_one(frame)
        for key, want in ref.items():
            assert vec[key] == want, (
                f"type={ref['msg_type']} field={key}: vec={vec[key]!r} ref={want!r}"
            )


def test_crc_batch_matches_scalar():
    frames = _fixture_frames()
    m, lens = frames_matrix(frames)
    got = crc24q_batch(m, np.maximum(lens - 3, 0))
    for i, f in enumerate(frames):
        assert got[i] == crc24q(f[:-3])
    ok = frame_crc_ok_batch(m, lens)
    from ntripmonitor_spark.functions.crc24q import frame_crc_ok

    assert list(ok) == [frame_crc_ok(f) for f in frames]


def test_read_bits_against_bitreader():
    rng = np.random.default_rng(42)
    payload = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    m, _ = frames_matrix([payload])
    r = BitReader(payload)
    pos = 0
    for width in (1, 3, 7, 8, 12, 14, 15, 20, 24, 30, 38, 56):
        want_u = r.uint(width)
        got_u = read_uint(m, np.array([0]), np.array([pos]), width)[0]
        assert got_u == want_u, f"uint width={width} off={pos}"
        sign = 1 << (width - 1)
        want_s = want_u - (1 << width) if want_u & sign else want_u
        got_s = read_sint(m, np.array([0]), np.array([pos]), width)[0]
        assert got_s == want_s, f"sint width={width} off={pos}"
        pos += width


def test_read_mask_64():
    payload = bytes(range(1, 17))
    m, _ = frames_matrix([payload])
    r = BitReader(payload)
    r.pad(5)
    want = int(r.bin(64), 2)
    got = read_mask(m, np.array([0]), np.array([5]), 64)[0]
    assert int(got) == want
    assert popcount64(np.array([got]))[0] == bin(want).count("1")


def test_ragged_indices():
    rows, within = ragged_indices(np.array([2, 0, 3, 1]))
    assert list(rows) == [0, 0, 2, 2, 2, 3]
    assert list(within) == [0, 1, 0, 1, 2, 0]


def test_vectorized_encoder_matches_scalar():
    from ntripmonitor_spark.plans.rtcm import _encode_event
    from ntripmonitor_spark.sources.encoder_vec import encode_event_frames

    e = np.arange(0, 500, dtype=np.int64)
    u = (e * 37 + 5) % 1000
    base = 1_700_000_000_000_000
    ts_us = base + e * 61_000_000 + (e % 997) * 1234
    props = [f"p{i}" * (i % 4) for i in e]
    got = encode_event_frames(e, u, ts_us, props)
    for i in range(len(e)):
        want = _encode_event(int(e[i]), int(u[i]), int(ts_us[i]), props[i])
        assert got[i] == want, f"e={i}"


def test_scan_frames_batch_matches_scalar():
    from ntripmonitor_spark.sources.framing import scan_frames, scan_frames_batch

    frames = _fixture_frames()
    blobs = []
    for i, f in enumerate(frames):
        b = b"\xaa" * (i % 3)
        if i % 4 == 0 and len(f) > 6:
            b += f[:-1] + bytes([f[-1] ^ 0xFF])  # bad-CRC decoy
        b += f
        if i % 5 == 0:
            b += f[: len(f) // 2]  # truncated tail
        blobs.append(b)
    blobs.append(b"")            # empty
    blobs.append(b"\xaa\xbb")    # no preamble

    got_frames, got_idx = scan_frames_batch(blobs)
    want_frames, want_idx = [], []
    for bi, blob in enumerate(blobs):
        fs, _ = scan_frames(blob)
        want_frames.extend(fs)
        want_idx.extend([bi] * len(fs))
    assert got_frames == want_frames
    assert got_idx == want_idx


# ---------------------------------------------------------------------------
# Property-based round-trip + parity across every MSM level (SURVEY §5:
# hypothesis drives encode → scalar decode == vectorized decode ==
# original fields, over randomized masks/values/constellations).
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _msm_case(draw):
    base = draw(st.sampled_from((1070, 1080, 1090, 1100, 1110, 1120)))
    level = draw(st.integers(1, 7))
    t = base + level
    nsat = draw(st.integers(1, 4))
    nsig = draw(st.integers(1, 3))
    sat_slots = sorted(draw(st.sets(st.integers(0, 63), min_size=nsat, max_size=nsat)))
    sig_slots = sorted(draw(st.sets(st.integers(0, 31), min_size=nsig, max_size=nsig)))
    mask_bits = draw(st.lists(st.booleans(), min_size=nsat * nsig, max_size=nsat * nsig))
    cell_mask = "".join("1" if b else "0" for b in mask_bits)
    hi = level in (6, 7)
    sats = [
        {
            "int_ms": draw(st.integers(0, 255)),
            "ext_info": draw(st.integers(0, 15)),
            "mod1ms": draw(st.integers(0, 1023)),
            "rough_rate": draw(st.integers(-(1 << 13), (1 << 13) - 1)),
        }
        for _ in range(nsat)
    ]
    cells = [
        {
            "fine_code": draw(st.integers(-(1 << (19 if hi else 14)), (1 << (19 if hi else 14)) - 1)),
            "fine_phase": draw(st.integers(-(1 << (23 if hi else 21)), (1 << (23 if hi else 21)) - 1)),
            "lock": draw(st.integers(0, (1 << (10 if hi else 4)) - 1)),
            "half_cycle": draw(st.integers(0, 1)),
            "cnr": draw(st.integers(0, (1 << (10 if hi else 6)) - 1)),
            "fine_rate": draw(st.integers(-(1 << 14), (1 << 14) - 1)),
        }
        for _ in range(cell_mask.count("1"))
    ]
    epoch = draw(st.integers(0, (1 << 27) - 1))
    dow = draw(st.integers(0, 7))
    return t, sat_slots, sig_slots, cell_mask, sats, cells, epoch, dow


@given(_msm_case())
@settings(max_examples=120, deadline=None)
def test_msm_roundtrip_property_all_levels(case):
    t, sat_slots, sig_slots, cell_mask, sats, cells, epoch, dow = case
    level = t % 10
    fr = encoder.encode_msm(
        t, 42, epoch, sat_slots, sig_slots, sats, cells,
        cell_mask=cell_mask, glonass_dow=dow if 1081 <= t <= 1087 else 0,
    )
    d = _decode_one(fr)
    assert d["msg_type"] == t and d["crc_ok"]
    assert d["epoch_ms"] == epoch
    if 1081 <= t <= 1087:
        assert d["glonass_dow"] == dow
    assert d["cell_mask"] == cell_mask

    # satellite fields: level-present fields round-trip, absent are null
    for j, s in enumerate(d["sats"]):
        assert s["mod1ms"] == sats[j]["mod1ms"]
        assert s["int_ms"] == (sats[j]["int_ms"] if level >= 4 else None)
        assert s["ext_info"] == (sats[j]["ext_info"] if level in (5, 7) else None)
        assert s["rough_rate"] == (sats[j]["rough_rate"] if level in (5, 7) else None)

    present = {
        1: ("fine_code",),
        2: ("fine_phase", "lock", "half_cycle"),
        3: ("fine_code", "fine_phase", "lock", "half_cycle"),
        4: ("fine_code", "fine_phase", "lock", "half_cycle", "cnr"),
        5: ("fine_code", "fine_phase", "lock", "half_cycle", "cnr", "fine_rate"),
        6: ("fine_code", "fine_phase", "lock", "half_cycle", "cnr"),
        7: ("fine_code", "fine_phase", "lock", "half_cycle", "cnr", "fine_rate"),
    }[level]
    for k, c in enumerate(d["cells"]):
        for f in ("fine_code", "fine_phase", "lock", "half_cycle", "cnr", "fine_rate"):
            want = cells[k][f] if f in present else None
            if f == "half_cycle" and want is not None:
                want = bool(want)
            assert c[f] == want, (t, k, f)

    # vectorized decoder agrees field-for-field
    import pyarrow as pa

    row = decoded_record_batch(
        pa.array(["MP"]), pa.array([0], type=pa.int64()), [fr]
    ).to_pylist()[0]
    for key in ("msg_type", "epoch_ms", "glonass_dow", "sat_mask", "sig_mask",
                "cell_mask", "sats", "cells"):
        assert row[key] == d[key], key
