"""Minimal big-endian bit reader/writer for RTCM payloads.

The whole payload is held as one Python int (``int.from_bytes``), so
every field read is shift+mask — no per-bit loops. Field layouts are
expressed as the same ``uint:N`` / ``int:N`` / ``bool`` / ``bin:N`` /
``pad:N`` mini-language the reference's bitstring formats use
(`src/rtcm3.py:316-391`), which keeps the decode tables
eyeball-comparable with the published RTCM 10403 layouts.
"""

from __future__ import annotations


class BitReader:
    __slots__ = ("_val", "_nbits", "pos")

    def __init__(self, payload: bytes):
        self._val = int.from_bytes(payload, "big")
        self._nbits = len(payload) * 8
        self.pos = 0

    @property
    def remaining(self) -> int:
        return self._nbits - self.pos

    def uint(self, n: int) -> int:
        if self.pos + n > self._nbits:
            raise EOFError(f"read past end: pos={self.pos} n={n} total={self._nbits}")
        shift = self._nbits - self.pos - n
        self.pos += n
        return (self._val >> shift) & ((1 << n) - 1)

    def sint(self, n: int) -> int:
        v = self.uint(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def bit(self) -> int:
        return self.uint(1)

    def bin(self, n: int) -> str:
        return format(self.uint(n), f"0{n}b")

    def pad(self, n: int) -> None:
        self.pos += n

    def bytes_rest(self) -> bytes:
        """Remaining whole bytes from the current (byte-aligned) position."""
        n = self.remaining // 8
        out = bytearray()
        for _ in range(n):
            out.append(self.uint(8))
        return bytes(out)


class BitWriter:
    __slots__ = ("_val", "_nbits")

    def __init__(self):
        self._val = 0
        self._nbits = 0

    def uint(self, value: int, n: int) -> "BitWriter":
        if not 0 <= value < (1 << n):
            raise ValueError(f"uint:{n} out of range: {value}")
        self._val = (self._val << n) | value
        self._nbits += n
        return self

    def sint(self, value: int, n: int) -> "BitWriter":
        lo, hi = -(1 << (n - 1)), (1 << (n - 1))
        if not lo <= value < hi:
            raise ValueError(f"int:{n} out of range: {value}")
        return self.uint(value & ((1 << n) - 1), n)

    def bit(self, value: int) -> "BitWriter":
        return self.uint(1 if value else 0, 1)

    def bin(self, bits: str) -> "BitWriter":
        for ch in bits:
            self.uint(1 if ch == "1" else 0, 1)
        return self

    def pad(self, n: int) -> "BitWriter":
        return self.uint(0, n)

    def raw_bytes(self, data: bytes) -> "BitWriter":
        for b in data:
            self.uint(b, 8)
        return self

    def to_bytes(self) -> bytes:
        """Zero-pad to a byte boundary and emit big-endian bytes."""
        pad = (-self._nbits) % 8
        val = self._val << pad
        nbytes = (self._nbits + pad) // 8
        return val.to_bytes(nbytes, "big")

    @property
    def nbits(self) -> int:
        return self._nbits
