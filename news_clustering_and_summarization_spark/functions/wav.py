"""Dependency-free WAV (RIFF/WAVE) decode — the real-bytes audio
path behind the multimodal seam.

Images got real decoders in r10/r11 (bmp.py, png.py, jpeg.py); the
AUDIO modality was still fake-only. PCM WAV is the uncompressed
interchange format every audio pipeline can produce, and its layout
is pure struct parsing — so the audio leg of decode_media can run on
genuine bytes with zero codec dependencies. Compressed audio
(MP3/AAC/Opus/FLAC) remains the documented NotImplementedError seam:
those are entropy coders and filter banks, a codec library's job.

Scope (checked, raised-on otherwise):
- RIFF/WAVE with a ``fmt `` chunk of format 1 (integer PCM, 8/16/
  24/32-bit) or 3 (IEEE float32/float64);
- any channel count; chunk order free; odd-size chunks padded per
  RIFF; unknown chunks skipped;
- WAVE_FORMAT_EXTENSIBLE and compressed format tags raise
  NotImplementedError (different decode systems, not parameters).

Output contract: (n_samples, n_channels) float32 in [-1, 1] plus
the sample rate. ``encode_wav`` (PCM 8/16/24/32 and float32) is the
test-side inverse; like png/jpeg, the HEADER the encoder writes is
what the decoder parses, so round trips pin layout and sample
scaling against each other while the fixed-point scaling rules are
additionally pinned by hand-built byte fixtures in the tests.

Decode runs inside mapInPandas executors (operators/multimodal.py)
— per-asset cost parallelizes across the corpus, never the driver.
"""

from __future__ import annotations

import struct

import numpy as np

RIFF = b"RIFF"
WAVE = b"WAVE"


def _chunks(payload: bytes):
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos: pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        data = payload[pos + 8: pos + 8 + size]
        if len(data) < size:
            raise ValueError("truncated WAV: chunk shorter than its length")
        yield cid, data
        pos += 8 + size + (size & 1)  # RIFF pads odd chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes to ((n_samples, n_channels) float32 in
    [-1, 1], sample_rate)."""
    if len(payload) < 12 or payload[:4] != RIFF:
        raise ValueError("not a RIFF stream")
    if payload[8:12] != WAVE:
        raise ValueError("RIFF stream is not WAVE")
    fmt = None
    data = None
    for cid, body in _chunks(payload):
        if cid == b"fmt " and fmt is None:
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data" and data is None:
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _align, bits = fmt
    if channels == 0 or rate == 0:
        raise ValueError("invalid WAV: zero channels or sample rate")
    if tag == 0xFFFE:
        raise NotImplementedError("WAVE_FORMAT_EXTENSIBLE unsupported")
    if tag not in (1, 3):
        raise NotImplementedError(
            f"compressed WAV format tag {tag} unsupported (PCM/float only)"
        )
    if tag == 3:
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4")
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"float WAV with {bits} bits")
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8)
        raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
        as32 = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        as32 = np.where(as32 >= 1 << 23, as32 - (1 << 24), as32)
        x = as32.astype(np.float32) / float(1 << 23)
    elif bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / float(
            1 << 31
        )
    else:
        raise ValueError(f"PCM WAV with {bits} bits")
    n = len(x) - len(x) % channels
    return (
        np.ascontiguousarray(x[:n].reshape(-1, channels)
                             .astype(np.float32)),
        int(rate),
    )


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """Encode (n_samples,) or (n_samples, n_channels) float samples
    in [-1, 1] as PCM (8/16/24/32) or, with bits=-32, float32 WAV."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("need (n,) or (n, channels) samples")
    ch = s.shape[1]
    if bits == -32:
        tag, width = 3, 4
        body = s.astype("<f4").tobytes()
    elif bits == 8:
        tag, width = 1, 1
        body = (
            np.clip(np.rint(s * 128.0 + 128.0), 0, 255)
            .astype(np.uint8).tobytes()
        )
    elif bits == 16:
        tag, width = 1, 2
        body = (
            np.clip(np.rint(s * 32768.0), -32768, 32767)
            .astype("<i2").tobytes()
        )
    elif bits == 24:
        tag, width = 1, 3
        v = np.clip(
            np.rint(s * float(1 << 23)), -(1 << 23), (1 << 23) - 1
        ).astype(np.int64)
        v = np.where(v < 0, v + (1 << 24), v).ravel()
        out = np.empty((v.size, 3), dtype=np.uint8)
        out[:, 0] = v & 0xFF
        out[:, 1] = (v >> 8) & 0xFF
        out[:, 2] = (v >> 16) & 0xFF
        body = out.tobytes()
    elif bits == 32:
        tag, width = 1, 4
        v = np.clip(s * float(1 << 31), -(1 << 31), (1 << 31) - 1)
        body = v.astype("<i4").tobytes()
    else:
        raise ValueError("bits must be 8/16/24/32 or -32 (float)")
    nbits = 32 if bits == -32 else bits
    fmt = struct.pack(
        "<HHIIHH", tag, ch, sample_rate, sample_rate * ch * width,
        ch * width, nbits,
    )
    chunks = b"".join(
        cid + struct.pack("<I", len(d)) + d + (b"\x00" if len(d) & 1 else b"")
        for cid, d in ((b"fmt ", fmt), (b"data", body))
    )
    return RIFF + struct.pack("<I", 4 + len(chunks)) + WAVE + chunks
