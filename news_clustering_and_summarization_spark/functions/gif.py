"""Dependency-free GIF decode (pure Python/NumPy): GIF87a/GIF89a,
LZW, interlace, local palettes, transparency, animation composition.

Completes the raster set next to bmp/png/jpeg: GIF's compression is
LZW over palette indices — a dictionary coder a stdlib-free decoder
can implement honestly (no entropy tables, no transforms). Animated
GIFs compose to a frame LIST, so the multimodal layer treats a
multi-frame GIF like MJPEG-AVI video: real frames, n_frames from
the file, features averaged over sampled frames, and
``extract_frames`` can emit the composed frames as standalone
images.

Scope (checked, raised-on otherwise):
- global and local color tables, any LZW minimum code size;
- interlaced images (the 4-pass row shuffle);
- GIF89a graphic-control extensions: transparency and disposal
  methods 0/1 (leave), 2 (restore to background), 3 (restore to
  previous); frame rectangles composed onto the logical screen;
- unknown extensions skipped by sub-block walking (the GIF spec's
  own forward-compat mechanism);
- malformed structure, bad LZW codes, palette overruns ->
  ValueError (the caller's quarantine row).

Output contract: ``decode_gif_frames`` -> list of (H, W, 3) uint8
RGB composed frames (transparent pixels inherit the composed
canvas; fully-transparent never-drawn pixels are black);
``decode_gif`` -> the first composed frame, matching the sibling
codecs' single-image contract. ``encode_gif`` (round-trip inverse:
palette build <= 256 colors, real LZW compressor with dictionary
growth + code-size bumps, optional interlace/animation) writes the
same wire format it reads; the tests additionally pin the LZW bit
order with a hand-computed byte fixture so encoder and decoder
can't share a mirrored bug.

Performance shape: LZW decode is a per-code Python loop (like
png.py's Paeth rows and jpeg.py's Huffman loop — bounded by the
asset's byte budget); palette lookup, interlace deshuffle and
composition are vectorized. Runs inside mapInPandas executors.
"""

from __future__ import annotations

import struct

import numpy as np

MAGICS = (b"GIF87a", b"GIF89a")


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns
    (data, position after the block terminator)."""
    out = bytearray()
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF: unterminated sub-blocks")
        size = payload[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise ValueError("truncated GIF: sub-block overruns data")
        out += payload[pos: pos + size]
        pos += size


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """LZW decompress to exactly ``n_pixels`` palette indices."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"invalid LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    got = 0
    # bit reader state (LSB-first within bytes, per GIF spec)
    acc = 0
    nbits = 0
    di = 0
    nd = len(data)

    def reset():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = reset()
    prev: bytes | None = None
    while got < n_pixels:
        while nbits < width:
            if di >= nd:
                raise ValueError("truncated GIF: LZW data exhausted")
            acc |= data[di] << nbits
            nbits += 8
            di += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("invalid first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code beyond dictionary")
        take = min(len(entry), n_pixels - got)
        out[got: got + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        got += take
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if got < n_pixels:
        raise ValueError("GIF image data ended before the frame filled")
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out.reshape(-1)


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode all frames, composed onto the logical screen."""
    if len(payload) < 13 or payload[:6] not in MAGICS:
        raise ValueError("not a GIF stream")
    width, height, packed, bg_idx, _ = struct.unpack_from(
        "<HHBBB", payload, 6
    )
    if width == 0 or height == 0:
        raise ValueError("invalid GIF dimensions")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(
            payload[pos: pos + 3 * n], dtype=np.uint8
        ).reshape(-1, 3)
        if len(gct) < n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    bg_fill = canvas[0, 0].copy() if gct is not None else np.zeros(3, np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    n_bytes = len(payload)
    while pos < n_bytes:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n_bytes:
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:
                flags = data[0]
                disposal = (flags >> 2) & 7
                transparent = data[3] if flags & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > n_bytes:
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if left + fw > width or top + fh > height or fw == 0 or fh == 0:
            raise ValueError("GIF frame rectangle outside logical screen")
        pal = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 7)
            pal = np.frombuffer(
                payload[pos: pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            if len(pal) < n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any color table")
        if pos >= n_bytes:
            raise ValueError("truncated GIF before image data")
        min_code = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = _lzw_decode(data, min_code, fw * fh)
        if fpacked & 0x40:
            idx = _deinterlace(idx, fw, fh)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("GIF palette index out of range")
        rect = pal[idx].reshape(fh, fw, 3)
        before = canvas[top: top + fh, left: left + fw].copy()
        region = canvas[top: top + fh, left: left + fw]
        if transparent is not None:
            mask = (idx.reshape(fh, fw) != transparent)[:, :, None]
            region[...] = np.where(mask, rect, region)
        else:
            region[...] = rect
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            canvas[top: top + fh, left: left + fw] = bg_fill
        elif disposal == 3:  # restore to previous
            canvas[top: top + fh, left: left + fw] = before
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF stream has no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First composed frame as (H, W, 3) uint8 — the sibling codecs'
    single-image contract."""
    return decode_gif_frames(payload)[0]


# -- encoder (test-side inverse) ---------------------------------------

class _LzwWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    w = _LzwWriter()
    w.put(clear, width)
    cur = b""
    for b in indices.tobytes():
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        w.put(table[cur], width)
        if next_code == (1 << 12):
            # dictionary full: reset instead of assigning code 4096
            # (the decoder, one assignment behind, has just appended
            # code 4095 and reads this CLEAR at width 12)
            w.put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        else:
            table[nxt] = next_code
            next_code += 1
            # sync with the decoder, which appends one entry per
            # code AFTER the first and bumps width when its table
            # length hits 1<<width; the encoder runs one assignment
            # ahead, so its bump point is next_code == (1<<width)+1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        cur = bytes([b])
    if cur:
        w.put(table[cur], width)
    w.put(end, width)
    return w.done()


def _blocks_of(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    interlace: bool = False,
    transparent_masks: list[np.ndarray] | None = None,
    disposals: list[int] | None = None,
) -> bytes:
    """Encode one (H, W, 3) frame or a list of same-size frames as
    GIF89a. All frames share one palette built from their distinct
    colors (<= 255, plus a reserved transparency slot when masks are
    given); raises if the palette doesn't fit — the test-side
    encoder quantizes nothing."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0
    )
    reserve = 1 if transparent_masks else 0
    if len(colors) + reserve > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    pal_size = 2
    while pal_size < len(colors) + reserve:
        pal_size *= 2
    pal = np.zeros((pal_size, 3), dtype=np.uint8)
    pal[reserve: reserve + len(colors)] = colors  # slot 0 = transparent
    lut = {tuple(c): i + reserve for i, c in enumerate(colors)}
    size_field = pal_size.bit_length() - 2  # 2 << field == pal_size
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, reserve, 0)
    out += pal.tobytes()
    min_code = max(2, pal_size.bit_length() - 1)
    for fi, f in enumerate(frames):
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share the logical screen")
        mask = transparent_masks[fi] if transparent_masks else None
        disp = (disposals[fi] if disposals else 1) if len(frames) > 1 else 0
        flags = (disp & 7) << 2 | (1 if mask is not None else 0)
        out += b"\x21\xf9" + bytes([4, flags, 0, 0, 0, 0])
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
        )
        idx = np.array(
            [lut[tuple(c)] for c in f.reshape(-1, 3)], dtype=np.uint8
        )
        if mask is not None:
            idx = np.where(mask.reshape(-1), 0, idx).astype(np.uint8)
        if interlace:
            rows = idx.reshape(h, w)
            order = [y for start, step in _INTERLACE_PASSES
                     for y in range(start, h, step)]
            idx = rows[order].reshape(-1)
        out.append(min_code)
        out += _blocks_of(_lzw_encode(idx, min_code))
    out.append(0x3B)
    return bytes(out)
