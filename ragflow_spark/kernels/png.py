"""Vendored minimal PNG codec (pure python + stdlib zlib).

Implements the subset of the PNG spec (W3C PNG / RFC 2083) needed so
the real-codec image path runs even where PIL is not installed (r3
verdict item #7): 8-bit samples, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA), interlace method 0, all five scanline
filters (None/Sub/Up/Average/Paeth). Decode errors raise ValueError,
which decode_media degrades to an error-as-row.

Grayscale conversion uses PIL's exact convert("L") fixed-point
coefficients (L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16), so a
pillow-equipped production cluster and this vendored path produce
byte-identical pixels — differentially tested when PIL is available
(tests/test_png_codec.py).

The encoder (gray/RGB, selectable filter) exists for fixtures and
tests; production corpora arrive already encoded.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse per-scanline filtering; raw = height * (1 + width*bpp)."""
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError("png: decompressed size mismatch")
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        o = y * stride
        po = o - stride  # previous scanline offset
        if ftype == 0:  # None
            out[o : o + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                out[o + x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            if y == 0:
                out[o : o + stride] = line
            else:
                for x in range(stride):
                    out[o + x] = (line[x] + out[po + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                up = out[po + x] if y > 0 else 0
                out[o + x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                up = out[po + x] if y > 0 else 0
                ul = out[po + x - bpp] if (y > 0 and x >= bpp) else 0
                out[o + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (h, w, channels). Raises
    ValueError on anything outside the supported subset."""
    if bytes(data[:8]) != SIGNATURE:
        raise ValueError("png: bad signature")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = bytes(data[pos + 4 : pos + 8])
        body = bytes(data[pos + 8 : pos + 8 + length])
        if len(body) != length:
            raise ValueError("png: truncated chunk")
        pos += 12 + length  # length + type + body + crc (crc unchecked)
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("png: bad IHDR")
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise ValueError(f"png: unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"png: unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("png: unsupported compression/filter method")
            if interlace != 0:
                raise ValueError("png: interlaced images unsupported")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped
    if width is None or not idat or not seen_iend:
        raise ValueError("png: missing IHDR/IDAT/IEND")
    if width == 0 or height == 0:
        raise ValueError("png: zero dimension")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"png: idat decompress failed: {e}") from e
    ch = _CHANNELS[color_type]
    px = _unfilter(raw, width, height, ch)
    return np.frombuffer(bytes(px), dtype=np.uint8).reshape(height, width, ch)


def to_gray(img: np.ndarray) -> np.ndarray:
    """(h, w, ch) -> (h, w) uint8 with PIL's convert('L') arithmetic;
    alpha is ignored (PIL's L conversion of RGBA also drops alpha)."""
    ch = img.shape[2]
    if ch in (1, 2):  # gray / gray+alpha
        return img[:, :, 0].copy()
    v = img.astype(np.uint32)
    return (
        (v[:, :, 0] * 19595 + v[:, :, 1] * 38470 + v[:, :, 2] * 7471 + 0x8000)
        >> 16
    ).astype(np.uint8)


def decode_png_gray(data: bytes) -> np.ndarray:
    return to_gray(decode_png(data))


# ------------------------------------------------------------ encoder


def _filter_line(
    ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> bytes:
    cur = line.astype(np.int32)
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    up = prev.astype(np.int32)
    ul = np.zeros_like(up)
    ul[bpp:] = up[:-bpp]
    if ftype == 0:
        out = cur
    elif ftype == 1:
        out = cur - left
    elif ftype == 2:
        out = cur - up
    elif ftype == 3:
        out = cur - ((left + up) >> 1)
    elif ftype == 4:
        pred = np.array(
            [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, up, ul)],
            dtype=np.int32,
        )
        out = cur - pred
    else:
        raise ValueError(f"png: unknown filter type {ftype}")
    return (out & 0xFF).astype(np.uint8).tobytes()


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> PNG bytes, every scanline
    using filter_type (0-4) — the knob lets tests cover each unfilter
    branch."""
    if img.ndim == 2:
        color_type, ch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, ch = 2, 3
        flat = img
    else:
        raise ValueError("png encoder: expected (h,w) gray or (h,w,3) rgb")
    h, w = flat.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    prev = np.zeros(w * ch, dtype=np.uint8)
    lines = []
    for y in range(h):
        line = flat[y].reshape(-1)
        lines.append(bytes([filter_type]) + _filter_line(filter_type, line, prev, ch))
        prev = line
    idat = zlib.compress(b"".join(lines))
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
