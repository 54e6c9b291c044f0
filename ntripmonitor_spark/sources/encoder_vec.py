"""Vectorized (NumPy) batch counterpart of sources/encoder.py for the
pipeline fixture generator (plans/rtcm.py).

The scalar ``BitWriter`` encoder stays as the readable golden-test
implementation; this module packs whole event batches at once: events
are grouped by frame shape (msg type × nsat × cell-mask variant), each
group's fixed bit layout is filled column-wise with ``put_bits``, bit
matrices are ``packbits``-ed to payload bytes, and CRC-24Q is appended
with the batch LUT kernel. Per-frame Python is reduced to the final
``tobytes`` slice + blob concatenation.

Layouts identical to sources/encoder.py (RTCM 10403 transcription,
src/rtcm3.py:316-391); parity is pinned by tests/test_rtcm_vec.py.
"""

from __future__ import annotations

import numpy as np

from ntripmonitor_spark.functions.bitvec import put_bits
from ntripmonitor_spark.functions.crc24q import crc24q_batch

_US_DAY = 86_400_000_000

_CELL_WIDTHS = {
    5: (("fine_code", 15, True), ("fine_phase", 22, True), ("lock", 4, False),
        ("half_cycle", 1, False), ("cnr", 6, False), ("fine_rate", 15, True)),
    7: (("fine_code", 20, True), ("fine_phase", 24, True), ("lock", 10, False),
        ("half_cycle", 1, False), ("cnr", 10, False), ("fine_rate", 15, True)),
}


def _wrap_frames(payload_bits: np.ndarray, plen: int) -> np.ndarray:
    """[N, pbits] 0/1 payload matrix → [N, 3+plen+3] complete frame
    byte matrix (envelope header + payload + CRC)."""
    n = len(payload_bits)
    payload = np.packbits(payload_bits, axis=1)
    total = 3 + plen + 3
    frames = np.zeros((n, total), dtype=np.uint8)
    frames[:, 0] = 0xD3
    frames[:, 1] = (plen >> 8) & 0x03
    frames[:, 2] = plen & 0xFF
    frames[:, 3 : 3 + plen] = payload[:, :plen]
    crc = crc24q_batch(frames, np.full(n, 3 + plen, dtype=np.int64))
    frames[:, 3 + plen] = (crc >> 16) & 0xFF
    frames[:, 3 + plen + 1] = (crc >> 8) & 0xFF
    frames[:, 3 + plen + 2] = crc & 0xFF
    return frames


def _encode_msm_group(t: int, nsat: int, drop_last: bool, e: np.ndarray, u: np.ndarray,
                      ts_us: np.ndarray) -> np.ndarray:
    """One fixed-shape MSM5/7 group → frame byte matrix. Field formulas
    mirror plans/rtcm.py:_encode_event exactly."""
    n = len(e)
    level = t % 10
    nsig = 2
    ncell_pos = nsat * nsig
    cell_positions = [c for c in range(ncell_pos) if not (drop_last and c == ncell_pos - 1)]
    ncells = len(cell_positions)
    cell_w = sum(w for _, w, _ in _CELL_WIDTHS[level])
    pbits_exact = 169 + ncell_pos + 36 * nsat + cell_w * ncells
    plen = (pbits_exact + 7) // 8
    bm = np.zeros((n, plen * 8), dtype=np.uint8)

    put_bits(bm, 0, 12, np.full(n, t))
    put_bits(bm, 12, 12, u % 4096)
    epoch_ms = (ts_us % _US_DAY) // 1000
    if 1081 <= t <= 1087:
        dow = (ts_us // _US_DAY + 4) % 7
        put_bits(bm, 24, 30, (dow << 27) | epoch_ms)
    else:
        put_bits(bm, 24, 30, epoch_ms)
    # flags/IODS/reserved already zero. Satellite mask: slot (e%50)+j.
    rows = np.arange(n)
    for j in range(nsat):
        bm[rows, 73 + (e % 50) + j] = 1
    bm[:, 137 + 1] = 1  # signal slots {1, 7}
    bm[:, 137 + 7] = 1
    for c in cell_positions:
        bm[:, 169 + c] = 1

    base = 169 + ncell_pos
    for j in range(nsat):
        put_bits(bm, base + j * 8, 8, (e + j) % 128)
        put_bits(bm, base + nsat * 8 + j * 4, 4, np.full(n, j % 16))
        put_bits(bm, base + nsat * 12 + j * 10, 10, (e * 31 + j * 7) % 1024)
        put_bits(bm, base + nsat * 22 + j * 14, 14, ((e * 13 + j * 101) % 16384) - 8192)

    cbase = base + nsat * 36
    hi = level == 7
    prev = 0
    for name, w, signed in _CELL_WIDTHS[level]:
        for k, c in enumerate(cell_positions):
            if name == "fine_code":
                v = ((e * 7919 + c * 131) % (1 << (20 if hi else 15))) - (1 << (19 if hi else 14))
            elif name == "fine_phase":
                v = ((e * 104729 + c * 7919) % (1 << (24 if hi else 22))) - (1 << (23 if hi else 21))
            elif name == "lock":
                v = (e + c) % (1024 if hi else 16)
            elif name == "half_cycle":
                v = (e + c) % 2
            elif name == "cnr":
                v = (e * 3 + c) % (1024 if hi else 64)
            else:  # fine_rate
                v = ((e * 17 + c * 29) % (1 << 15)) - (1 << 14)
            put_bits(bm, cbase + prev * ncells + k * w, w, v)
        prev += w
    return _wrap_frames(bm, plen)


def _encode_1006_group(e: np.ndarray, u: np.ndarray) -> np.ndarray:
    n = len(e)
    bm = np.zeros((n, 168), dtype=np.uint8)
    put_bits(bm, 0, 12, np.full(n, 1006))
    put_bits(bm, 12, 12, u % 4096)
    bm[:, 30] = 1  # GPS indicator
    put_bits(bm, 34, 38, ((e * 9973 + 123) % (1 << 38)) - (1 << 37))
    put_bits(bm, 74, 38, ((e * 31337 + 7) % (1 << 38)) - (1 << 37))
    put_bits(bm, 114, 38, ((e * 271 + 99) % (1 << 38)) - (1 << 37))
    put_bits(bm, 152, 16, (e * 13) % 65536)
    return _wrap_frames(bm, 21)


def _encode_1029_group(e: np.ndarray, u: np.ndarray, ts_us: np.ndarray,
                       texts: list[str]) -> list[bytes]:
    """Variable-length text frames: vector header pack + batch CRC over
    a padded matrix, per-row byte splice only for the UTF-8 payload."""
    n = len(e)
    data = [t.encode("utf-8") for t in texts]
    nb = np.fromiter((len(d) for d in data), dtype=np.int64, count=n)
    nc = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    hdr = np.zeros((n, 72), dtype=np.uint8)
    put_bits(hdr, 0, 12, np.full(n, 1029))
    put_bits(hdr, 12, 12, u % 4096)
    put_bits(hdr, 24, 16, ts_us // _US_DAY + 40587)
    put_bits(hdr, 40, 17, (ts_us // 1_000_000) % 86400)
    put_bits(hdr, 57, 7, nc)
    put_bits(hdr, 64, 8, nb)
    hdr_bytes = np.packbits(hdr, axis=1)

    plen = 9 + nb
    lens = 3 + plen + 3
    total = int(lens.max())
    m = np.zeros((n, total), dtype=np.uint8)
    m[:, 0] = 0xD3
    m[:, 1] = (plen >> 8) & 0x03
    m[:, 2] = plen & 0xFF
    m[:, 3:12] = hdr_bytes
    for i, d in enumerate(data):
        if d:
            m[i, 12 : 12 + len(d)] = np.frombuffer(d, dtype=np.uint8)
    crc = crc24q_batch(m, lens - 3)
    rows = np.arange(n)
    m[rows, lens - 3] = (crc >> 16) & 0xFF
    m[rows, lens - 2] = (crc >> 8) & 0xFF
    m[rows, lens - 1] = crc & 0xFF
    return [m[i, : lens[i]].tobytes() for i in range(n)]


def encode_event_frames(e: np.ndarray, u: np.ndarray, ts_us: np.ndarray,
                        props: list[str]) -> list[bytes]:
    """Batch version of plans/rtcm.py:_encode_event over whole arrays;
    returns frames in input order."""
    n = len(e)
    out: list[bytes | None] = [None] * n
    t = np.where(e % 7 == 0, 1029,
        np.where(e % 11 == 0, 1006,
        np.where(e % 5 == 0, 1087, np.where(e % 2 == 0, 1077, 1075))))

    idx = np.flatnonzero(t == 1029)
    if len(idx):
        for i, f in zip(idx, _encode_1029_group(e[idx], u[idx], ts_us[idx],
                                                [props[i] for i in idx])):
            out[i] = f
    idx = np.flatnonzero(t == 1006)
    if len(idx):
        frames = _encode_1006_group(e[idx], u[idx])
        for k, i in enumerate(idx):
            out[i] = frames[k].tobytes()
    for typ in (1075, 1077, 1087):
        sel = t == typ
        for nsat in (1, 2, 3):
            for drop in (False, True):
                g = np.flatnonzero(sel & (1 + e % 3 == nsat) & ((e % 4 == 1) == drop))
                if not len(g):
                    continue
                frames = _encode_msm_group(typ, nsat, drop, e[g], u[g], ts_us[g])
                for k, i in enumerate(g):
                    out[i] = frames[k].tobytes()
    return out  # type: ignore[return-value]


def encode_event_blobs(e: np.ndarray, u: np.ndarray, ts_us: np.ndarray,
                       props: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Frames + junk/decoy blob assembly as flat (data, offsets)
    buffers — the mapInArrow fixture fast path. Per event: 0xAA junk
    bytes (e%3), a CRC-corrupted decoy copy every 13th event, then the
    real frame; identical layout to the per-row assembly it replaces
    (plans/rtcm.py event_blobs), but the output binary column is built
    from these buffers with no per-row Python bytes objects."""
    n = len(e)
    frames = encode_event_frames(e, u, ts_us, props)
    flens = np.fromiter((len(f) for f in frames), dtype=np.int64, count=n)
    jl = (e % 3).astype(np.int64)
    dup = e % 13 == 0
    blens = jl + np.where(dup, flens, 0) + flens
    offs = np.zeros(n + 1, dtype=np.int64)
    offs[1:] = np.cumsum(blens)
    data = np.zeros(int(offs[-1]), dtype=np.uint8)
    starts = offs[:-1]
    data[starts[jl >= 1]] = 0xAA
    data[starts[jl == 2] + 1] = 0xAA
    fstart = starts + jl
    for i in np.flatnonzero(dup):
        fb = np.frombuffer(frames[i], dtype=np.uint8)
        s = int(fstart[i])
        data[s : s + flens[i]] = fb
        data[s + flens[i] - 1] ^= 0xFF  # corrupt the decoy's CRC tail
    fstart = fstart + np.where(dup, flens, 0)
    for i in range(n):
        s = int(fstart[i])
        data[s : s + flens[i]] = np.frombuffer(frames[i], dtype=np.uint8)
    return data, offs
