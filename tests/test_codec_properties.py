"""Property-based codec round trips (hypothesis): random shapes,
including the degenerate ones fixed-seed tests never pick (1x1
images, single-sample audio, single-pixel GIF palettes, odd BMP row
padding widths). Each property is the exact contract the pipeline
relies on: decode(encode(x)) == x for lossless formats, within
quantization bounds for JPEG, for EVERY shape — not just the shapes
a test author thought of."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from news_clustering_and_summarization_spark.functions import (
    bmp,
    gif,
    jpeg,
    png,
    wav,
)

_DIM = st.integers(min_value=1, max_value=40)


def _img(w, h, seed, colors=256):
    rng = np.random.RandomState(seed)
    return rng.randint(0, colors, size=(h, w, 3)).astype(np.uint8)


@settings(max_examples=25, deadline=None)
@given(w=_DIM, h=_DIM, seed=st.integers(0, 2**16))
def test_bmp_roundtrip_any_shape(w, h, seed):
    img = _img(w, h, seed)
    assert np.array_equal(bmp.decode_bmp(bmp.encode_bmp(img)), img)


@settings(max_examples=25, deadline=None)
@given(w=_DIM, h=_DIM, seed=st.integers(0, 2**16),
       filt=st.integers(0, 4))
def test_png_roundtrip_any_shape_any_filter(w, h, seed, filt):
    img = _img(w, h, seed)
    out = png.decode_png(png.encode_png(img, row_filter=filt))
    assert np.array_equal(out, img)


@settings(max_examples=20, deadline=None)
@given(w=_DIM, h=_DIM, seed=st.integers(0, 2**16),
       interlace=st.booleans())
def test_gif_roundtrip_any_shape(w, h, seed, interlace):
    # <= 6 distinct colors keeps the palette small while the LZW
    # stream still exercises dictionary growth
    pal = _img(6, 1, seed)[0]
    idx = np.random.RandomState(seed + 1).randint(0, 6, (h, w))
    img = pal[idx]
    out = gif.decode_gif(gif.encode_gif(img, interlace=interlace))
    assert np.array_equal(out, img)


@settings(max_examples=20, deadline=None)
@given(w=st.integers(8, 48), h=st.integers(8, 48),
       seed=st.integers(0, 2**16), sub=st.sampled_from(["444", "420"]))
def test_jpeg_quality100_bounded_any_shape(w, h, seed, sub):
    # quality 100 quantizes every coefficient by 1-2; error stays
    # small and bounded for any shape, including non-multiple-of-MCU.
    # The noise is GRAYSCALE (r=g=b) so chroma is constant: per-pixel
    # COLOR noise under 4:2:0 is destroyed by the 2x2 box average
    # itself — that loss is the subsampling's spec, not the codec's.
    rng = np.random.RandomState(seed)
    g = rng.randint(0, 2, size=(h, w)).astype(np.uint8) * 200 + 20
    img = np.repeat(g[:, :, None], 3, axis=2)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100,
                                            subsample=sub))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 24


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 3000), ch=st.integers(1, 4),
       seed=st.integers(0, 2**16),
       bits=st.sampled_from([8, 16, 24, 32, -32]))
def test_wav_roundtrip_any_shape(n, ch, seed, bits):
    rng = np.random.RandomState(seed)
    x = (rng.rand(n, ch) * 2 - 1) * 0.95
    out, rate = wav.decode_wav(wav.encode_wav(x, 44100, bits=bits))
    assert rate == 44100 and out.shape == (n, ch)
    tol = {8: 1 / 120.0, 16: 1 / 3e4, 24: 1 / 7e6, 32: 1e-6,
           -32: 1e-6}[bits]
    assert np.abs(out - x).max() < tol


@settings(max_examples=15, deadline=None)
@given(k=st.integers(1, 6), w=st.integers(1, 24),
       h=st.integers(1, 24), seed=st.integers(0, 2**16))
def test_gif_animation_roundtrip_any_count(k, w, h, seed):
    pal = _img(4, 1, seed)[0]
    rng = np.random.RandomState(seed + 2)
    frames = [pal[rng.randint(0, 4, (h, w))] for _ in range(k)]
    got = gif.decode_gif_frames(gif.encode_gif(frames))
    assert len(got) == k
    # disposal=1 full-frame opaque: each composed frame IS its input
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)
