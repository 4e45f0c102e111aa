"""Dependency-free MJPEG-AVI container codec (stdlib only).

The reference's video path shells out to ffmpeg; this sandbox has none, so
ops/multimodal stubbed video behind ``fake=True``. An MJPEG AVI, however,
is just a RIFF chunk tree whose ``00dc`` chunks are ordinary JPEG frames —
fully parseable with stdlib byte arithmetic, and the frames decode with
ops/jpegcodec. That makes real (if single-codec) video support possible:
structure validation, metadata extraction, and every-Nth-frame sampling.

- ``encode_mjpeg_avi(frames, width, height, fps)``: minimal writer —
  RIFF(AVI ) → LIST(hdrl){avih, LIST(strl){strh 'vids'/'MJPG', strf
  BITMAPINFOHEADER}} → LIST(movi){00dc…}. ``frames`` are pre-encoded JPEG
  byte strings (use jpegcodec.encode_jpeg).
- ``avi_info(content)``: ``(width, height, n_frames, fps, 'avi',
  corrupt)`` or None when the payload has no RIFF/AVI magic. Corruption =
  truncated/overrunning chunks, missing avih/movi, or zero frames.
- ``avi_frames(content)``: list of (frame_idx, jpeg_bytes) from the movi
  list (``00dc``/``00db`` chunks).

All fields little-endian per the RIFF spec. The Spark caller
(ops/multimodal.sample_video_frames) runs this inside Arrow-batched
``mapInPandas`` — one input row fans out to one row per sampled frame.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_mjpeg_avi(
    frames: list[bytes], width: int, height: int, fps: int = 30
) -> bytes:
    """Write a minimal MJPEG AVI from pre-encoded JPEG frames."""
    if not frames:
        raise ValueError("need at least one frame")
    us_per_frame = max(1, 1_000_000 // max(1, fps))
    max_frame = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, max_frame * fps, 0, 0x10,      # AVIF_HASINDEX unset; 0x10=flags
        len(frames), 0, 1, max_frame, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, max(1, fps), 0,
                      len(frames), max_frame, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(content: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len); raise on overrun."""
    i = start
    while i < end:
        if i + 8 > end:
            raise ValueError("truncated AVI chunk header")
        fourcc = content[i:i + 4]
        ln = struct.unpack("<I", content[i + 4:i + 8])[0]
        if i + 8 + ln > end:
            raise ValueError("AVI chunk overruns container")
        yield fourcc, i + 8, ln
        i += 8 + ln + (ln % 2)


def _parse(content: bytes):
    """(width, height, n_frames, fps, frames list) — raises on corruption."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        return None
    riff_len = struct.unpack("<I", content[4:8])[0]
    end = 8 + riff_len
    if end > len(content):
        raise ValueError("RIFF size overruns payload")
    w = h = n_frames = 0
    fps = 0.0
    frames: list[bytes] = []
    for fourcc, ps, ln in _walk(content, 12, end):
        if fourcc != b"LIST":
            continue
        kind = content[ps:ps + 4]
        if kind == b"hdrl":
            for f2, p2, l2 in _walk(content, ps + 4, ps + ln):
                if f2 == b"avih" and l2 >= 40:
                    vals = struct.unpack("<10I", content[p2:p2 + 40])
                    us_per_frame, n_frames, w, h = vals[0], vals[4], vals[8], vals[9]
                    fps = 1_000_000 / us_per_frame if us_per_frame else 0.0
        elif kind == b"movi":
            for f2, p2, l2 in _walk(content, ps + 4, ps + ln):
                if f2 in (b"00dc", b"00db"):
                    frames.append(content[p2:p2 + l2])
    return w, h, n_frames, fps, frames


def avi_info(content: bytes):
    """(width, height, n_frames, fps, 'avi', corrupt) or None if not AVI."""
    if content is None:
        return None
    content = bytes(content)
    if len(content) < 12 or content[:4] != b"RIFF":
        return None
    try:
        parsed = _parse(content)
    except ValueError:
        return (0, 0, 0, 0.0, "avi", True)
    if parsed is None:
        return None
    w, h, n_frames, fps, frames = parsed
    ok = w > 0 and h > 0 and len(frames) > 0 and n_frames == len(frames)
    return (w, h, len(frames), fps, "avi", not ok)


def avi_frames(content: bytes) -> list[tuple[int, bytes]]:
    """All (frame_idx, jpeg_bytes) in stream order; raises on corruption."""
    parsed = _parse(bytes(content))
    if parsed is None:
        raise ValueError("not an AVI payload")
    return list(enumerate(parsed[4]))
