"""Minimal pure-Python PNG codec (stdlib zlib only) — the real-decoder seam.

The container ships no image library, so the multimodal pipeline's decode
stage was an honest stub; this module implements enough of the public PNG
format (PNG spec / RFC 2083: IHDR, concatenated IDAT zlib stream, filter
types 0-4) that the ``decoder_available() == True`` branch of
``decode_and_featurize`` runs end-to-end in CI on real bytes. Supported:
8-bit greyscale (color type 0), RGB (2), greyscale+alpha (4), RGBA (6),
no interlacing. Anything else raises ValueError and the caller falls back
(or surfaces NotImplementedError under UPTON_SPARK_REQUIRE_DECODER).

``encode_png`` writes the same subset (filter 0 rows) so tests can
round-trip without fixture binaries.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# channels per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 array."""
    if not data.startswith(_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIGNATURE)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG shape (bit_depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace})"
        )
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("truncated pixel data")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_start + 1).copy()
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = row + prev
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth reference the pixel `channels` bytes left —
            # sequential along x, vectorized across channels
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(0, stride, channels):
                left = cur[x - channels : x] if x else np.zeros(channels, dtype=np.uint8)
                up = prev[x : x + channels]
                ul = prev[x - channels : x] if x else np.zeros(channels, dtype=np.uint8)
                seg = row[x : x + channels]
                if ftype == 1:
                    cur[x : x + channels] = seg + left
                elif ftype == 3:
                    cur[x : x + channels] = seg + (
                        (left.astype(np.uint16) + up.astype(np.uint16)) // 2
                    ).astype(np.uint8)
                else:
                    cur[x : x + channels] = seg + _paeth(left, up, ul)
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, channels)


def decode_png_grey(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w) float64 grid in [0, 1] (channel mean; alpha
    ignored) — the shape the feature stage consumes."""
    px = decode_png(data)
    color = px[:, :, :3] if px.shape[2] >= 3 else px[:, :, :1]
    return color.mean(axis=2) / 255.0


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) or (h, w, channels) uint8 → PNG bytes (filter 0 rows)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, channels = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
