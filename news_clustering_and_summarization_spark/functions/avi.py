"""Dependency-free MJPEG-AVI container parse — the real-bytes VIDEO
path behind the multimodal seam.

With jpeg.py in place (r11), the one video format a codec-free
container can honestly handle is Motion JPEG in an AVI wrapper:
every frame is an independent baseline JPEG, and AVI itself is plain
RIFF chunk walking. That upgrades the video modality from
"bookkeeping over fake metadata" to real frames: parse the
container, pull the per-frame JPEG payloads, and the existing image
machinery (decode_image, luma features, phash) runs on each frame
unchanged. Inter-frame codecs (H.264/VP9/AV1 in mp4/webm/mkv)
remain the documented NotImplementedError seam — motion
compensation is a codec library's job.

Parse contract: ``parse_avi`` -> (meta dict, [frame bytes]) where
meta carries width/height/total_frames/us_per_frame from the
``avih`` main header and frames are the ``..dc``/``..db`` chunk
payloads of the FIRST video stream in ``movi`` order (nested
``rec `` lists flattened; ``idx1`` ignored — offsets are redundant
with a sequential walk). Malformed structure -> ValueError
(quarantine); a non-MJPEG fourcc -> NotImplementedError.

``encode_avi`` is the test-side inverse (RIFF writer: hdrl with
avih + one vids/MJPG strl, movi of 00dc chunks, idx1) so round
trips exercise the walker against spec-layout bytes; frame payloads
come from jpeg.encode_jpeg, so an encoded clip is a REAL MJPEG AVI.

Decode runs inside mapInPandas executors (operators/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np  # noqa: F401  (kept: parity with sibling codecs)

RIFF = b"RIFF"
AVI = b"AVI "


def _walk(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size, is_list, list_type)."""
    while pos + 8 <= end:
        cid = payload[pos: pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("truncated AVI: chunk overruns its parent")
        if cid in (b"LIST", b"RIFF"):
            if size < 4:
                raise ValueError("truncated AVI: LIST without a type")
            yield cid, body + 4, size - 4, True, payload[body: body + 4]
        else:
            yield cid, body, size, False, None
        pos = body + size + (size & 1)


def parse_avi(payload: bytes) -> tuple[dict, list[bytes]]:
    """Parse an MJPEG AVI; returns (meta, frame payloads)."""
    if len(payload) < 12 or payload[:4] != RIFF:
        raise ValueError("not a RIFF stream")
    if payload[8:12] != AVI:
        raise ValueError("RIFF stream is not AVI")
    meta: dict = {}
    frames: list[bytes] = []
    vid_stream: int | None = None
    stream_no = 0

    def scan(pos, end, in_movi=False):
        nonlocal vid_stream, stream_no
        for cid, body, size, is_list, ltype in _walk(payload, pos, end):
            if is_list:
                scan(body, body + size,
                     in_movi or ltype in (b"movi", b"rec "))
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("truncated avih header")
                (us_pf, _mbps, _pad, _flags, total, _init, _streams,
                 _buf, w, h) = struct.unpack_from("<10I", payload, body)
                meta.update(
                    us_per_frame=us_pf, total_frames=total,
                    width=w, height=h,
                )
            elif cid == b"strh":
                fcc_type = payload[body: body + 4]
                handler = payload[body + 4: body + 8]
                if fcc_type == b"vids":
                    if handler not in (b"MJPG", b"mjpg", b"\x00" * 4):
                        raise NotImplementedError(
                            f"AVI video codec {handler!r} unsupported "
                            "(MJPG only)"
                        )
                    if vid_stream is None:
                        vid_stream = stream_no
                stream_no += 1
            elif in_movi and len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                try:
                    sno = int(cid[:2])
                except ValueError:
                    continue
                if vid_stream is None or sno == vid_stream:
                    frames.append(payload[body: body + size])

    scan(12, len(payload))
    if "width" not in meta:
        raise ValueError("AVI missing avih main header")
    return meta, frames


def encode_avi(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Wrap JPEG frame payloads as a minimal spec-layout MJPEG AVI."""
    if fps <= 0:
        raise ValueError("fps must be positive")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    max_size = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<10I16x", 1_000_000 // fps, max_size * fps, 0, 0x10,
        len(frames), 0, 1, max_size, width, height,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII4h", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), max_size, 0xFFFFFFFF, 0,
                      0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh)
                                   + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to movi list type)
    off = 4
    idx = bytearray()
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = hdrl + movi + chunk(b"idx1", bytes(idx))
    return RIFF + struct.pack("<I", 4 + len(body)) + AVI + body
