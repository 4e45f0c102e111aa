"""Metadata-level container probes: WebP, MP4 (ISO-BMFF), FLAC, MP3.

The reference's media ingest reads per-file METADATA — dimensions, frame
counts, durations, sample rates — not decoded samples
(/root/reference/app.py:221-273 builds metadata rows per file;
dataset_checker.py:26-62 checks structural validity). Full pixel/sample
decode of VP8, H.264 or MDCT audio is codec work that genuinely needs
ffmpeg/libav; the container STRUCTURE, however, is parseable with the
stdlib — and structure validation + metadata extraction is exactly what
the reference's checks consume. These probes therefore do a full
structural walk (chunk/box/frame chains verified against payload bounds)
and extract the metadata the pipeline needs, flagging truncation or
malformed structure as corrupt, PIL-verify style.

Each probe returns None when the payload lacks that container's magic,
so ops/multimodal can chain them after the full codecs. Lossless WebP
(VP8L) has since been upgraded to a full pixel decode — ops/vp8lcodec
wraps webp_dims and only falls back to the structure probe for lossy VP8 —
and FLAC to a full sample decode (ops/flaccodec wraps flac_info the same
way); MP4 and MP3 remain structure probes.
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------- WebP


def webp_dims(content: bytes):
    """(width, height, n_channels, 'webp', corrupt) or None if not WebP.

    Walks the RIFF chunk chain; reads dimensions from VP8 (lossy key
    frame), VP8L (lossless) or VP8X (extended canvas). corrupt =
    truncated chunks, bad VP8/VP8L signature bytes, or no image chunk."""
    content = bytes(content) if content else b""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        return None
    riff_end = min(len(content), 8 + struct.unpack_from("<I", content, 4)[0])
    w = h = 0
    nc = 3
    ok = False
    truncated = 8 + struct.unpack_from("<I", content, 4)[0] > len(content)
    i = 12
    while i + 8 <= riff_end:
        fourcc = content[i:i + 4]
        size = struct.unpack_from("<I", content, i + 4)[0]
        data_start = i + 8
        if data_start + size > riff_end:
            truncated = True
            break
        d = content[data_start:data_start + size]
        if fourcc == b"VP8 " and size >= 10:
            if d[3:6] != b"\x9d\x01\x2a":
                truncated = True
                break
            w = struct.unpack_from("<H", d, 6)[0] & 0x3FFF
            h = struct.unpack_from("<H", d, 8)[0] & 0x3FFF
            ok = True
        elif fourcc == b"VP8L" and size >= 5:
            if d[0] != 0x2F:
                truncated = True
                break
            bits = struct.unpack_from("<I", d, 1)[0]
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            if (bits >> 28) & 1:
                nc = 4
            ok = True
        elif fourcc == b"VP8X" and size >= 10:
            if d[0] & 0x10:
                nc = 4
            w = int.from_bytes(d[4:7], "little") + 1
            h = int.from_bytes(d[7:10], "little") + 1
            ok = True
        i = data_start + size + (size & 1)          # chunks are 2-byte aligned
    good = ok and not truncated and w > 0 and h > 0
    return (w, h, nc, "webp", not good)


# ---------------------------------------------------------------- ISO-BMFF


def _boxes(content: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for ISO-BMFF boxes in
    [start, end); raises ValueError on structural corruption."""
    i = start
    while i < end:
        if i + 8 > end:
            raise ValueError("truncated box header")
        size = struct.unpack_from(">I", content, i)[0]
        typ = content[i + 4:i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", content, i + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError("box overruns payload")
        yield typ, i + hdr, i + size
        i += size


def _find_box(content: bytes, start: int, end: int, path: list[bytes]):
    """First box at the given nesting path; (payload_start, payload_end)
    or None."""
    for typ, s, e in _boxes(content, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return s, e
            return _find_box(content, s, e, path[1:])
    return None


def mp4_info(content: bytes):
    """(width, height, n_frames, fps, 'mp4', corrupt) or None when the
    payload is not ISO-BMFF (no ftyp first box).

    Full top-level + moov box-tree walk (sizes verified against bounds);
    dims from the first trak's tkhd (16.16 fixed point), frame count from
    that trak's stsz sample_count, fps from its mdhd timescale/duration."""
    content = bytes(content) if content else b""
    if len(content) < 12 or content[4:8] != b"ftyp":
        return None
    w = h = n_frames = 0
    fps = 0.0
    ok = False
    try:
        moov = _find_box(content, 0, len(content), [b"moov"])
        if moov is not None:
            for typ, s, e in _boxes(content, moov[0], moov[1]):
                if typ != b"trak":
                    continue
                tk = _find_box(content, s, e, [b"tkhd"])
                if tk is None:
                    continue
                ver = content[tk[0]]
                # tkhd: ver/flags, times (4/8 each x2), id, rsvd, duration
                # (4/8), rsvd(8), layer/alt/volume/rsvd(8), matrix(36), w, h
                off = tk[0] + 4 + (8 + 8 + 4 + 4 + 8 if ver else 4 + 4 + 4 + 4 + 4)
                off += 8 + 8 + 36
                if off + 8 > tk[1]:
                    raise ValueError("truncated tkhd")
                tw = struct.unpack_from(">I", content, off)[0] / 65536.0
                th = struct.unpack_from(">I", content, off + 4)[0] / 65536.0
                if tw <= 0 or th <= 0:
                    continue                      # audio/hint track
                w, h = int(round(tw)), int(round(th))
                stsz = _find_box(content, s, e, [b"mdia", b"minf", b"stbl", b"stsz"])
                if stsz is not None and stsz[0] + 12 <= stsz[1]:
                    n_frames = struct.unpack_from(">I", content, stsz[0] + 8)[0]
                mdhd = _find_box(content, s, e, [b"mdia", b"mdhd"])
                if mdhd is not None:
                    mver = content[mdhd[0]]
                    if mver:
                        ts = struct.unpack_from(">I", content, mdhd[0] + 4 + 16)[0]
                        dur = struct.unpack_from(">Q", content, mdhd[0] + 4 + 20)[0]
                    else:
                        ts = struct.unpack_from(">I", content, mdhd[0] + 4 + 8)[0]
                        dur = struct.unpack_from(">I", content, mdhd[0] + 4 + 12)[0]
                    if ts and dur:
                        fps = n_frames * ts / dur
                ok = True
                break
    except (ValueError, struct.error):
        ok = False
    good = ok and w > 0 and h > 0
    return (w, h, n_frames, round(fps, 4), "mp4", not good)


# --------------------------------------------------------------------- FLAC


def flac_info(content: bytes):
    """(sample_rate, n_samples, duration_sec, corrupt) or None if the
    payload has no fLaC magic. Parses the mandatory STREAMINFO block and
    walks the metadata-block chain to verify structure."""
    content = bytes(content) if content else b""
    if len(content) < 4 or content[:4] != b"fLaC":
        return None
    if len(content) < 8 + 34 or (content[4] & 0x7F) != 0:
        return (0, 0, 0.0, True)                 # first block must be STREAMINFO
    si_len = int.from_bytes(content[5:8], "big")
    if si_len < 34 or 8 + si_len > len(content):
        return (0, 0, 0.0, True)
    si = content[8:8 + 34]
    packed = int.from_bytes(si[10:18], "big")
    sample_rate = packed >> 44
    n_samples = packed & ((1 << 36) - 1)
    # walk remaining metadata blocks to the audio frames
    i = 8 + si_len
    last = bool(content[4] & 0x80)
    ok = sample_rate > 0
    while not last and ok:
        if i + 4 > len(content):
            ok = False
            break
        last = bool(content[i] & 0x80)
        blen = int.from_bytes(content[i + 1:i + 4], "big")
        i += 4 + blen
        if i > len(content):
            ok = False
    if ok and n_samples > 0 and i >= len(content):
        ok = False                               # no audio frames after metadata
    dur = (n_samples / sample_rate) if sample_rate else 0.0
    return (sample_rate, n_samples, round(dur, 6), not ok)


# ---------------------------------------------------------------------- MP3

_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]
_MP3_BITRATES_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def _mp3_frame(content: bytes, i: int):
    """Parse a Layer-III frame header at i; (frame_len, samples, rate) or
    None if not a valid frame."""
    if i + 4 > len(content):
        return None
    b1, b2 = content[i], content[i + 1]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    version = (b2 >> 3) & 3                      # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (b2 >> 1) & 3                        # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = content[i + 2] >> 4
    sr_idx = (content[i + 2] >> 2) & 3
    padding = (content[i + 2] >> 1) & 1
    if sr_idx == 3 or br_idx in (0, 15):
        return None
    rate = _MP3_RATES[version][sr_idx]
    if version == 3:
        bitrate = _MP3_BITRATES_V1L3[br_idx] * 1000
        samples = 1152
        flen = 144 * bitrate // rate + padding
    else:
        bitrate = _MP3_BITRATES_V2L3[br_idx] * 1000
        samples = 576
        flen = 72 * bitrate // rate + padding
    return (flen, samples, rate)


def mp3_info(content: bytes):
    """(sample_rate, n_samples, duration_sec, corrupt) or None when the
    payload is not MP3 (no ID3 tag and no immediate valid Layer-III sync —
    MP3 has no strong magic, so detection is deliberately strict). Walks
    the whole frame chain; corrupt = a frame overruns the payload."""
    content = bytes(content) if content else b""
    i = 0
    had_id3 = False
    if content[:3] == b"ID3" and len(content) >= 10:
        tag = (content[6] << 21) | (content[7] << 14) | (content[8] << 7) | content[9]
        i = 10 + tag
        had_id3 = True
    first = _mp3_frame(content, i)
    if first is None:
        return (0, 0, 0.0, True) if had_id3 else None
    n_samples = 0
    rate = first[2]
    ok = True
    while i < len(content):
        if content[i:i + 3] == b"TAG":           # ID3v1 trailer
            i += 128
            continue
        fr = _mp3_frame(content, i)
        if fr is None:
            ok = i == len(content)
            break
        flen, samples, frate = fr
        if i + flen > len(content) or frate != rate:
            ok = False
            break
        n_samples += samples
        i += flen
    dur = n_samples / rate if rate else 0.0
    return (rate, n_samples, round(dur, 6), not ok)
