"""Minimal pure-Python GIF codec (stdlib only) — the second image branch
of the real-decoder seam.

Implements enough of the public GIF89a specification (CompuServe 1990,
"GRAPHICS INTERCHANGE FORMAT Version 89a") that ``decode_and_featurize``'s
``decoder_available() == True`` branch runs on real GIF bytes: logical
screen descriptor, global/local color tables, extension-block skipping,
the FIRST image descriptor's LZW-compressed indexed data (variable code
width 3..12 bits, clear/EOI codes, LSB-first bit packing), and interlaced
row re-ordering (the 4-pass scheme). Animation beyond the first frame is
out of scope — the feature stage consumes one grid per asset (the video
path samples frames separately).

``encode_gif_grey`` writes the same subset with a 256-entry grey ramp
palette so tests round-trip without fixture binaries. It emits a CLEAR
code every 254 pixel codes, keeping the code width constant at 9 bits — a
standard spec-conformant encoding (any decoder must honor mid-stream
clears), chosen over dictionary building for implementation clarity; the
decoder handles both (its dictionary grows until the next clear).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start row, step)


def _read_color_table(data: bytes, pos: int, flags: int) -> tuple[np.ndarray | None, int]:
    """(table as (n,3) uint8 or None, new pos) from a descriptor's flags."""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        return table, pos + 3 * n
    return None, pos


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain (len byte + payload, 0-terminated)."""
    parts = []
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(data[pos : pos + n])
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    """GIF LZW: LSB-first variable-width codes; code width starts at
    min_code_size+1 and grows after the dictionary fills each power of two,
    capped at 12 bits; CLEAR resets, EOI terminates."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    prev: list[int] | None = None
    out: list[int] = []
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == end:
                return out
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                width = min_code_size + 1
                prev = None
                continue
            if code < len(table) and table[code]:
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + [prev[0]]
            else:
                raise ValueError(f"bad LZW code {code}")
            out.extend(entry)
            if len(out) >= max_pixels:
                return out[:max_pixels]
            if prev is not None:
                table.append(prev + [entry[0]])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → first frame as an (h, w, 3) uint8 RGB array."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct, pos = _read_color_table(data, pos, flags)
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label byte + sub-block chain
            pos += 1
            _, pos = _read_subblocks(data, pos)
        elif block == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            lct, pos = _read_color_table(data, pos, iflags)
            palette = lct if lct is not None else gct
            if palette is None:
                raise ValueError("GIF image without a color table")
            min_code_size = data[pos]
            pos += 1
            lzw, pos = _read_subblocks(data, pos)
            idx = _lzw_decode(lzw, min_code_size, w * h)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data truncated")
            grid = np.asarray(idx, dtype=np.int32).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
                ordered = np.empty_like(grid)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    rows = range(start, h, step)
                    for r in rows:
                        ordered[r] = grid[src]
                        src += 1
                grid = ordered
            if int(grid.max(initial=0)) >= len(palette):
                # loud, never wrong pixels: a corrupt stream or undersized
                # color table must not silently clamp to the last entry
                raise ValueError(
                    f"GIF pixel index {int(grid.max())} outside the "
                    f"{len(palette)}-entry color table"
                )
            return palette[grid]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def decode_gif_grey(data: bytes) -> np.ndarray:
    """GIF bytes → (h, w) float grid in [0, 1] (mean of RGB — the shared
    contract of the decode seam)."""
    rgb = decode_gif(data).astype(np.float64)
    return rgb.mean(axis=2) / 255.0


def encode_gif_grey(grid: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w) float grid in [0, 1] → GIF89a bytes with a 256-grey palette.
    Spec-conformant clear-code-reset LZW (see module docstring)."""
    g = np.clip(np.asarray(grid, dtype=np.float64), 0.0, 1.0)
    idx = np.round(g * 255).astype(np.uint8)
    h, w = idx.shape
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        idx = idx[rows]
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    palette = np.repeat(np.arange(256, dtype=np.uint8), 3)  # grey ramp
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    min_code_size = 8
    out.append(min_code_size)
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    acc = bits = 0
    body = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    for i, px in enumerate(idx.ravel()):
        if i and i % 254 == 0:
            emit(clear)  # keep the decoder's dictionary below 2^9
        emit(int(px))
    emit(end)
    if bits:
        body.append(acc & 0xFF)
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
