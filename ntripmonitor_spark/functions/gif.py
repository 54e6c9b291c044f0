"""Minimal pure-Python GIF decoder (and a test-fixture encoder) for the
multimodal real frame-sampling path — animated GIF standing in for the
video modality, so all three modalities (PNG image, WAV audio, GIF
video) decode for real with zero extra dependencies.

Scope: GIF87a/GIF89a, global or local color tables, non-interlaced
frames, full LZW with growing code widths (to the 12-bit cap); frames
composite by paste-over at their (left, top) offsets (disposal modes
beyond paste-over are not needed for frame sampling). Implementation
of the public GIF specification; the reference repo has no media
surface (north-star extension).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return data[:6] in GIF_MAGICS


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dictionary: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    out: list[int] = []
    prev: tuple[int, ...] | None = None

    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                return out  # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            dictionary = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = dictionary[code]
        elif code < len(dictionary):
            entry = dictionary[code]
            dictionary.append(prev + (entry[0],))
        else:  # the KwKwK case
            entry = prev + (prev[0],)
            dictionary.append(entry)
        if prev is not None and len(dictionary) == (1 << width) and width < 12:
            width += 1
        out.extend(entry)
        prev = entry
    return out[:n_pixels]


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            break
        chunks.append(data[pos:pos + size])
        pos += size
    return b"".join(chunks), pos


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → uint8 array (n_frames, height, width, 3) RGB."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    transparent: int | None = None
    frames = []
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags, _delay, tidx = struct.unpack("<BHB", body[:4])
                transparent = tidx if (flags & 1) else None
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        if left + w > sw or top + h > sh:
            raise ValueError(
                f"frame rectangle {w}x{h}@({left},{top}) exceeds "
                f"logical screen {sw}x{sh}"
            )
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF unsupported")
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("image without a color table")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = np.array(_lzw_decode(min_code, lzw, w * h), dtype=np.int32)
        if len(idx) < w * h:  # pad truncated frame with index 0
            idx = np.pad(idx, (0, w * h - len(idx)))
        idx = idx.reshape(h, w)
        region = canvas[top:top + h, left:left + w]
        rgb = table[np.clip(idx, 0, len(table) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        transparent = None
    if not frames:
        raise ValueError("no image frames")
    return np.stack(frames)


def encode_gif(frames: np.ndarray, palette: np.ndarray) -> bytes:
    """Test-fixture encoder: (n, h, w) palette-index frames + (k, 3)
    palette → animated GIF. Emits literal LZW codes with a clear code
    before each (dictionary never grows — valid, just uncompressed)."""
    frames = np.asarray(frames, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    n, h, w = frames.shape
    k = len(palette)
    bits = max(2, int(k - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:k] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += table.tobytes()

    clear = 1 << bits
    eoi = clear + 1
    width = bits + 1
    for f in range(n):
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(bits)  # LZW min code size
        acc = 0
        nbits = 0
        codes = bytearray()
        for code in [clear] + [
            c for px in frames[f].reshape(-1) for c in (int(px), clear)
        ][:-1] + [eoi]:
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                codes.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            codes.append(acc & 0xFF)
        for i in range(0, len(codes), 255):
            chunk = codes[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
