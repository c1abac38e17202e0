"""Vendored pure-stdlib PNG codec: round-trip, every filter type, and the
unsupported-shape guard (the real-decoder seam of operators.multimodal)."""

import struct
import zlib

import numpy as np
import pytest

from upton_spark.operators.png_codec import decode_png, decode_png_grey, encode_png


@pytest.mark.parametrize(
    "shape", [(5, 7), (5, 7, 3), (4, 4, 4), (1, 1), (16, 9, 2)]
)
def test_round_trip(shape):
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(px))
    want = px if px.ndim == 3 else px[:, :, None]
    assert out.shape == want.shape
    assert (out == want).all()


def test_grey_projection():
    g = decode_png_grey(encode_png(np.full((3, 3), 128, dtype=np.uint8)))
    assert g.shape == (3, 3)
    assert abs(g.mean() - 128 / 255) < 1e-9


def test_all_filter_types_reconstruct():
    """Hand-build a PNG whose five rows use filters 0..4 (the encoder only
    emits filter 0, so this exercises the decoder's Sub/Up/Average/Paeth
    reconstruction against an independent reference filterer)."""
    rng = np.random.default_rng(3)
    w, h, ch = 4, 5, 3
    base = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)

    def filt_row(y, ftype):
        row = base[y].astype(np.int16)
        prev = base[y - 1].astype(np.int16) if y else np.zeros(w * ch, np.int16)
        out = np.zeros(w * ch, np.int16)
        for x in range(w * ch):
            left = row[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                out[x] = row[x]
            elif ftype == 1:
                out[x] = row[x] - left
            elif ftype == 2:
                out[x] = row[x] - up
            elif ftype == 3:
                out[x] = row[x] - (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out[x] = row[x] - pred
        return (out % 256).astype(np.uint8)

    raw = b"".join(
        bytes([ftype]) + filt_row(y, ftype).tobytes() for y, ftype in enumerate(range(5))
    )

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(data).reshape(h, w * ch)
    assert (out == base).all()


def test_unsupported_shapes_raise():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(np.zeros((2, 2), dtype=np.uint8))
    # flip bit depth to 16 in IHDR (offset: 8 sig + 8 hdr + 8 w/h)
    bad = bytearray(good)
    bad[8 + 8 + 8] = 16
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
