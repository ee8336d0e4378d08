"""Dependency-free BMP decode (pure NumPy).

Closes the last stub in the multimodal story (r09 verdict item 4):
`decode_media` previously raised unless ``fake=True`` because no
image libraries ship in this container. Windows BMP (BI_RGB,
uncompressed 24/32-bit) needs no codec library — the pixel data is
raw bytes behind two fixed-layout little-endian headers — so a real
decode path can be pure NumPy with zero new dependencies.

Scope (documented, checked, raised-on otherwise):
- BITMAPINFOHEADER (40 bytes) or any of its supersets (52/56/108/124
  — the fields this decoder reads are a common prefix);
- 24-bit BGR and 32-bit BGRA, ``BI_RGB`` (no compression) only;
- bottom-up (positive height, the overwhelmingly common layout) and
  top-down (negative height) row orders;
- single plane, as the format requires.

The reference has no media path at all (SURVEY §2: extensions brief,
not parity), so the contract here is the engine's own: decode real
bytes into (H, W, 3) uint8 RGB, feed the SAME (asset_id, cell,
value) pixel-grid relation the fake codec produces, and keep every
oracled surface byte-identical (oracles stay on the fake codec,
which DuckDB can replay; real bytes can't be replayed in SQL).

Also provides ``encode_bmp`` (the inverse, same subset) so tests can
build genuine BMP payloads without fixtures or image libraries.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, size, res1, res2, offset
_INFO_PREFIX = struct.Struct("<IiiHHI")  # hdrsize, w, h, planes, bpp, comp
BI_RGB = 0


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a BMP payload to an (H, W, 3) uint8 RGB array.

    Raises ``ValueError`` with a precise reason for anything outside
    the supported subset — callers (decode_media) surface that as a
    per-asset ``ok=False`` row rather than failing the batch."""
    if len(payload) < _FILE_HEADER.size + _INFO_PREFIX.size:
        raise ValueError("truncated BMP: shorter than the two headers")
    magic, _fsize, _r1, _r2, px_off = _FILE_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP payload (magic {magic!r})")
    hdr_size, width, height, planes, bpp, comp = _INFO_PREFIX.unpack_from(
        payload, _FILE_HEADER.size
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if planes != 1:
        raise ValueError(f"invalid plane count {planes}")
    if comp != BI_RGB:
        raise ValueError(f"unsupported compression {comp} (BI_RGB only)")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported bit depth {bpp} (24/32 only)")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    bytes_pp = bpp // 8
    # each row pads to a 4-byte boundary
    stride = (width * bytes_pp + 3) & ~3
    need = px_off + stride * height
    if len(payload) < need:
        raise ValueError(
            f"truncated BMP: need {need} bytes, have {len(payload)}"
        )
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * height,
                        offset=px_off)
    rows = raw.reshape(height, stride)[:, : width * bytes_pp]
    px = rows.reshape(height, width, bytes_pp)
    rgb = px[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
    if not top_down:
        rgb = rgb[::-1]  # bottom-up storage -> natural row order
    return np.ascontiguousarray(rgb)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up). The test-side inverse of ``decode_bmp``."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("need (H, W, 3) uint8")
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR
    px_off = _FILE_HEADER.size + 40
    body = rows.tobytes()
    head = _FILE_HEADER.pack(b"BM", px_off + len(body), 0, 0, px_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, BI_RGB, len(body), 2835, 2835, 0, 0
    )
    return head + info + body


def luma_grid(rgb: np.ndarray, cells_per_side: int = 8) -> np.ndarray:
    """Integer mean-luma per cell of an ``n x n`` grid over the image
    — the real-codec counterpart of multimodal.fake_pixels' token
    grid. Exact integer arithmetic end to end: luma is the Rec.601
    integer form ``299*R + 587*G + 114*B`` (scaled by 1000 — kept
    scaled, comparisons downstream are scale-invariant) summed per
    cell, then floor-divided by the cell's pixel count. Edge cells
    absorb the remainder pixels, so any W,H >= n works."""
    h, w = rgb.shape[:2]
    n = cells_per_side
    if h < n or w < n:
        raise ValueError(f"image {w}x{h} smaller than the {n}x{n} grid")
    px = rgb.astype(np.int64)
    luma = px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114
    y_edges = [(h * i) // n for i in range(n + 1)]
    x_edges = [(w * i) // n for i in range(n + 1)]
    out = np.empty((n, n), dtype=np.int64)
    for i in range(n):
        for j in range(n):
            block = luma[y_edges[i]: y_edges[i + 1],
                         x_edges[j]: x_edges[j + 1]]
            out[i, j] = int(block.sum()) // block.size
    return out
