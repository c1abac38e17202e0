"""Vendored baseline JPEG codec (operators/jpeg_codec.py, ITU-T T.81):
encode/decode round trips, 4:2:0 interleaved MCUs, restart markers, error
paths, and the decode_and_featurize(decoder='real') e2e on jpeg bytes —
the VERDICT-r4 #5 done-bar (decoder_available('jpeg') is True and the
dominant web image format takes a real decoder branch)."""

from __future__ import annotations

import numpy as np
import pytest

from upton_spark.operators.jpeg_codec import (
    decode_jpeg,
    decode_jpeg_grey,
    encode_jpeg_grey,
    encode_jpeg_rgb420,
    jpeg_decoded_dimensions,
)


def _grid(h: int, w: int, seed: int = 7) -> np.ndarray:
    return np.random.RandomState(seed).rand(h, w)


@pytest.mark.parametrize("hw", [(8, 8), (5, 11), (16, 16), (23, 37), (1, 1)])
def test_grey_round_trip_fine_quant(hw):
    """quant=1 bounds per-pixel round-trip error at ~1/255 (DCT+quantize
    rounding only)."""
    g = _grid(*hw)
    out = decode_jpeg_grey(encode_jpeg_grey(g, quant=1))
    assert out.shape == hw
    assert np.abs(out - np.round(g * 255) / 255).max() <= 1.5 / 255


def test_grey_round_trip_coarse_quant_bounded():
    """quant=8: error stays within the q-step IDCT bound (no drift)."""
    g = _grid(24, 24, seed=3)
    out = decode_jpeg_grey(encode_jpeg_grey(g, quant=8))
    assert np.abs(out - g).max() <= 12 / 255


def test_restart_markers_round_trip():
    g = _grid(32, 40, seed=5)
    data = encode_jpeg_grey(g, quant=1, restart_interval=3)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data  # RSTn actually written
    out = decode_jpeg_grey(data)
    assert np.abs(out - np.round(g * 255) / 255).max() <= 1.5 / 255


def test_color_420_luma_round_trip():
    """3-component 4:2:0 (the dominant web layout): interleaved MCUs and
    subsampled chroma blocks decode; the luma plane matches the encoder's
    Y conversion."""
    rng = np.random.RandomState(11)
    rgb = (rng.rand(19, 26, 3) * 255).astype(np.uint8)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    out = decode_jpeg(encode_jpeg_rgb420(rgb, quant=1)).astype(np.float64)
    assert out.shape == (19, 26)
    assert np.abs(out - y).max() <= 2.0


def test_error_paths():
    g = _grid(16, 16)
    data = encode_jpeg_grey(g, quant=1)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) * 2 // 3])  # truncated scan
    # progressive (SOF2) is explicitly unsupported, not silently wrong
    prog = bytearray(data)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))


def test_decoded_dimensions_catch_corrupt_scan():
    """Unlike the SOF header walk, full decode rejects a payload whose
    header is intact but whose entropy scan is cut."""
    data = encode_jpeg_grey(_grid(12, 20), quant=1)
    assert jpeg_decoded_dimensions(data) == (20, 12)
    with pytest.raises(ValueError):
        jpeg_decoded_dimensions(data[:-8])


def test_decode_and_featurize_real_jpeg_end_to_end(spark):
    """decoder_available('jpeg') is True and real baseline-jpeg bytes flow
    through decode_and_featurize(decoder='real') with features matching
    the source pixels."""
    from upton_spark.operators import multimodal

    assert multimodal.decoder_available("jpeg")
    rows, want = [], {}
    for i in range(6):
        h, w = 8 + i, 10 + 2 * i
        g = _grid(h, w, seed=i)
        rows.append(
            (i, f"http://m/j{i}.jpg", encode_jpeg_grey(g, quant=1),
             ("image", "jpeg", w, h, None))
        )
        want[i] = np.round(g * 255) / 255
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA)
    feats = {
        r["asset_id"]: r
        for r in multimodal.decode_and_featurize(
            media, resize_to=(8, 8), decoder="real"
        ).collect()
    }
    assert set(feats) == set(want)
    for i, g in want.items():
        ys = (np.arange(8) * g.shape[0]) // 8
        xs = (np.arange(8) * g.shape[1]) // 8
        expected = g[np.ix_(ys, xs)]
        assert abs(feats[i]["mean_intensity"] - expected.mean()) < 0.01
        got = np.array(feats[i]["feature"]).reshape(8, 8)
        assert np.abs(got - expected).max() < 0.02
