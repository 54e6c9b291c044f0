"""CRC-24Q (Qualcomm) — the RTCM v3 frame checksum.

Polynomial 0x1864CFB (1 + 24-bit), init 0, no reflection, no final
XOR. Table-driven like the reference (`src/crc.py:288-293`), but the
256-entry LUT is *generated* here (cf. the reference's generator,
`src/crc.py:296-324`) rather than transcribed, and a NumPy batch
variant is provided for the Arrow/pandas-UDF hot path.
"""

from __future__ import annotations

import numpy as np

POLY = 0x1864CFB


def _gen_lut() -> np.ndarray:
    lut = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        crc = i << 16
        for _ in range(8):
            crc <<= 1
            if crc & 0x1000000:
                crc ^= POLY
        lut[i] = crc & 0xFFFFFF
    return lut

LUT = _gen_lut()


def crc24q(data: bytes) -> int:
    """CRC-24Q of a byte string (frame minus its trailing 3 CRC bytes)."""
    crc = 0
    for byte in data:
        crc = ((crc << 8) ^ int(LUT[(byte ^ (crc >> 16)) & 0xFF])) & 0xFFFFFF
    return crc


def frame_crc_ok(frame: bytes) -> bool:
    """Validate a complete RTCM frame: CRC over all but the last 3
    bytes must equal the trailing 24-bit big-endian CRC
    (`src/ntripclient.py:534-536`)."""
    if len(frame) < 6:
        return False
    return crc24q(frame[:-3]) == int.from_bytes(frame[-3:], "big")


def append_crc(body: bytes) -> bytes:
    """Frame body (header+payload) + its 3-byte CRC trailer."""
    return body + crc24q(body).to_bytes(3, "big")


def crc24q_batch(m: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """CRC-24Q over the first ``lens[i]`` bytes of each row of a uint8
    matrix, all rows at once: one masked LUT step per byte *position*
    instead of one Python call per byte — the decode/encode hot path.
    """
    crc = np.zeros(len(lens), dtype=np.uint32)
    for pos in range(int(lens.max()) if len(lens) else 0):
        upd = ((crc << 8) ^ LUT[(m[:, pos].astype(np.uint32) ^ (crc >> 16)) & 0xFF]) & 0xFFFFFF
        crc = np.where(pos < lens, upd, crc)
    return crc


def frame_crc_ok_batch(m: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized ``frame_crc_ok``: computed CRC over frame[:-3] equals
    the trailing 24-bit big-endian checksum."""
    ok = lens >= 6
    body_lens = np.maximum(lens - 3, 0)
    crc = crc24q_batch(m, body_lens)
    rows = np.arange(len(lens))
    tail = np.maximum(lens - 3, 0)
    stored = (
        (m[rows, tail].astype(np.uint32) << 16)
        | (m[rows, np.maximum(lens - 2, 0)].astype(np.uint32) << 8)
        | m[rows, np.maximum(lens - 1, 0)].astype(np.uint32)
    )
    return ok & (crc == stored)
