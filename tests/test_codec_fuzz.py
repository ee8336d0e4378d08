"""Corruption-robustness sweep over every real codec: a 100 TB
decode job meets bit rot, truncation and mislabeled files, and the
quarantine contract says every such asset must surface as a clean
ValueError / NotImplementedError (-> ok=False row), never a crash,
hang, or silent garbage exception (IndexError, struct.error,
OverflowError, zlib.error...).

Deterministic fuzz, three mutation families per format:
truncations at byte boundaries, single-byte flips spread across the
file (headers AND payload), and random tails appended to valid
prefixes. A decode that *succeeds* on a corrupted input is fine —
flipping a pixel byte usually still parses — the contract is about
the failure MODE, not failure certainty."""

from __future__ import annotations

import numpy as np
import pytest

from news_clustering_and_summarization_spark.functions import (
    avi,
    bmp,
    gif,
    jpeg,
    png,
    wav,
)

_RNG = np.random.RandomState(20260816)


def _img() -> np.ndarray:
    return _RNG.randint(0, 256, (24, 32, 3)).astype(np.uint8)


_SAMPLES = {
    "bmp": (bmp.decode_bmp, bmp.encode_bmp(_img())),
    "png": (png.decode_png, png.encode_png(_img(), row_filter=4)),
    "jpeg": (jpeg.decode_jpeg, jpeg.encode_jpeg(_img(), quality=85)),
    "gif": (gif.decode_gif, gif.encode_gif(
        (_RNG.randint(0, 6, (24, 32))[:, :, None]
         * np.array([[[40, 20, 9]]])).astype(np.uint8))),
    "wav": (lambda b: wav.decode_wav(b)[0],
            wav.encode_wav(_RNG.rand(1500) * 0.5, 8000, bits=16)),
    "avi": (lambda b: avi.parse_avi(b)[1],
            avi.encode_avi(
                [jpeg.encode_jpeg(_img(), quality=80)] * 2, 32, 24)),
}

_ALLOWED = (ValueError, NotImplementedError)


def _try(decode, data: bytes, what: str) -> None:
    try:
        decode(data)
    except _ALLOWED:
        pass
    except Exception as e:  # noqa: BLE001 - the point of the test
        raise AssertionError(
            f"{what}: leaked {type(e).__name__}: {e}"
        ) from e


@pytest.mark.parametrize("fmt", sorted(_SAMPLES))
def test_truncations_quarantine_cleanly(fmt):
    decode, good = _SAMPLES[fmt]
    cuts = sorted({1, 2, 3} | {
        int(x) for x in np.linspace(4, len(good) - 1, 40)
    })
    for n in cuts:
        _try(decode, good[:n], f"{fmt} truncated to {n}")


@pytest.mark.parametrize("fmt", sorted(_SAMPLES))
def test_byte_flips_quarantine_cleanly(fmt):
    decode, good = _SAMPLES[fmt]
    for i in range(120):
        pos = int(_RNG.randint(0, len(good)))
        val = int(_RNG.randint(1, 256))
        bad = bytearray(good)
        bad[pos] ^= val
        _try(decode, bytes(bad), f"{fmt} flip @{pos}^{val:02x}")


@pytest.mark.parametrize("fmt", sorted(_SAMPLES))
def test_garbage_tails_quarantine_cleanly(fmt):
    decode, good = _SAMPLES[fmt]
    for i in range(20):
        cut = int(_RNG.randint(8, len(good)))
        tail = _RNG.randint(0, 256, int(_RNG.randint(1, 200))) \
            .astype(np.uint8).tobytes()
        _try(decode, good[:cut] + tail, f"{fmt} tail @{cut}")


def test_cross_format_magic_mislabels():
    """Every sample fed to every OTHER decoder: wrong-magic inputs
    must quarantine (or legitimately raise NotImplementedError via a
    shared container magic, e.g. WAV bytes offered to the AVI
    parser)."""
    for src, (_, data) in _SAMPLES.items():
        for dst, (decode, _) in _SAMPLES.items():
            if src == dst:
                continue
            _try(decode, data, f"{src} bytes into {dst} decoder")
