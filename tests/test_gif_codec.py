"""Vendored pure-stdlib GIF codec (GIF89a spec): encode/decode roundtrip
(plain + interlaced), LZW clear-code handling, error paths, and the
decode_and_featurize(decoder="real") end-to-end branch on real GIF bytes —
the second real image-decoder branch after PNG (VERDICT-r3 item 5)."""

from __future__ import annotations

import numpy as np
import pytest

from upton_spark.operators.gif_codec import (
    decode_gif,
    decode_gif_grey,
    encode_gif_grey,
)


def _grid(h, w, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w)).astype(np.float64) / 255.0


def test_roundtrip_exact():
    g = _grid(13, 17)
    out = decode_gif_grey(encode_gif_grey(g))
    assert out.shape == (13, 17)
    np.testing.assert_allclose(out, g, atol=1e-12)


def test_roundtrip_interlaced():
    """Interlaced row re-ordering (the 4-pass scheme) restores display
    order exactly."""
    g = _grid(11, 7, seed=9)
    data = encode_gif_grey(g, interlace=True)
    out = decode_gif_grey(data)
    np.testing.assert_allclose(out, g, atol=1e-12)
    # and the interlaced bytes differ from the sequential encoding
    assert data != encode_gif_grey(g, interlace=False)


def test_large_image_spans_subblocks_and_clears():
    """>254 pixels exercises the mid-stream CLEAR codes; >255 compressed
    bytes exercises the sub-block chaining."""
    g = _grid(40, 40, seed=1)
    out = decode_gif_grey(encode_gif_grey(g))
    np.testing.assert_allclose(out, g, atol=1e-12)


def test_rgb_palette_decode():
    """decode_gif returns palette RGB; the grey ramp maps index i to
    (i, i, i)."""
    g = np.full((2, 3), 100 / 255.0)
    rgb = decode_gif(encode_gif_grey(g))
    assert rgb.shape == (2, 3, 3)
    assert (rgb == 100).all()


def test_bad_inputs_raise():
    with pytest.raises(ValueError, match="bad signature"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    g = _grid(6, 6)
    data = encode_gif_grey(g)
    # chop mid-palette and mid-pixel-data: loud errors, never wrong pixels
    with pytest.raises((ValueError, IndexError)):
        decode_gif(data[: len(data) // 2])
    with pytest.raises((ValueError, IndexError)):
        decode_gif(data[: len(data) - 12])


def test_real_gif_decode_end_to_end(spark):
    """decoder_available('gif') is True via the vendored codec: a media
    table of real GIF bytes flows through decode_and_featurize('real') and
    the features match a local numpy replay of decode+resize."""
    from upton_spark.operators import multimodal

    assert multimodal.decoder_available("gif")
    grids = {i: _grid(10 + i, 12, seed=i) for i in range(4)}
    rows = [
        (
            i,
            f"http://media.example.org/image/{i}.gif",
            encode_gif_grey(grids[i]),
            ("image", "gif", 12, 10 + i, None),
        )
        for i in range(4)
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA)
    out = {
        r["asset_id"]: r
        for r in multimodal.decode_and_featurize(
            media, resize_to=(4, 4), decoder="real"
        ).collect()
    }
    for i, g in grids.items():
        ys = (np.arange(4) * g.shape[0]) // 4
        xs = (np.arange(4) * g.shape[1]) // 4
        expect = g[np.ix_(ys, xs)]
        assert out[i]["mean_intensity"] == pytest.approx(expect.mean(), abs=1e-6)
        assert out[i]["feature"] == pytest.approx(
            expect.ravel().astype(np.float32).tolist(), abs=1e-6
        )
