"""Dependency-free baseline JPEG (ITU-T T.81) codec: stdlib + numpy only.

The reference validates real image files through PIL (``verify()`` +
corruption check, /root/reference/dataset_checker.py:26-62) and ingests
image folders (/root/reference/app.py:221-273). This sandbox has no
PIL/cv2/ffmpeg, so ops/multimodal covers PNM and PNG with stdlib code;
this module un-stubs the remaining (and most common) image format.

Scope — baseline sequential DCT JPEG:

- ``decode_jpeg(content)``: full pixel decode of baseline (SOF0) scans,
  grayscale or YCbCr, component sampling factors 1 or 2 (covers 4:4:4,
  4:2:2, 4:2:0), arbitrary DQT/DHT tables (canonical reconstruction from
  BITS/HUFFVAL), restart markers, byte stuffing. Progressive (SOF2),
  arithmetic coding and 12-bit precision raise ``ValueError`` — they are
  structurally detected, not silently mis-decoded.
- ``encode_jpeg(pixels, quality)``: baseline 4:4:4 (or single-component
  grayscale) encoder — Annex-K quantisation tables scaled by the libjpeg
  quality formula, flat canonical huffman tables generated in code (every
  DC symbol at length 4, every AC symbol at length 8 — a valid, complete-
  enough canonical code that trades compression for table simplicity),
  level shift + orthonormal 8x8 DCT + zigzag + DC-differential / AC
  run-length entropy coding with byte stuffing.
- ``jpeg_dims(content)``: cheap structure walk (no entropy decode) →
  ``(width, height, channels, "jpeg", corrupt)`` or None when the payload
  has no JPEG magic. ``corrupt`` mirrors PIL-verify semantics: truncated
  or malformed segment structure, missing SOF, or missing EOI.

Per-element work is numpy matmuls over 8x8 blocks batched per image; the
Spark-side callers (ops/multimodal.decode_image_batch / resize_images)
run this inside Arrow-batched ``mapInPandas``, so the driver never sees
pixel data and each task decodes only its partition's files.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------- constants

SOI, EOI, SOS, DQT, DHT, DRI, APP0, COM = (
    0xD8, 0xD9, 0xDA, 0xDB, 0xC4, 0xDD, 0xE0, 0xFE,
)
SOF_BASELINE = (0xC0, 0xC1)  # sequential DCT (C1 = extended sequential, huffman)
SOF_UNSUPPORTED = (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
_SOF_ALL = SOF_BASELINE + SOF_UNSUPPORTED

# Annex K quantisation tables (the standard's example tables; every
# mainstream encoder ships them).
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)


def _zigzag_order() -> list[tuple[int, int]]:
    """The 64 (row, col) pairs in JPEG zigzag scan order, generated rather
    than transcribed: anti-diagonal d = r+c; odd diagonals walk top→bottom,
    even ones bottom→top."""
    out = []
    for d in range(15):
        rs = range(max(0, d - 7), min(d, 7) + 1)
        for r in (rs if d % 2 == 1 else reversed(list(rs))):
            out.append((r, d - r))
    return out


ZIGZAG = _zigzag_order()
_ZZ_ROWS = np.array([r for r, _ in ZIGZAG])
_ZZ_COLS = np.array([c for _, c in ZIGZAG])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix T: forward = T @ B @ T.T, inverse =
    T.T @ F @ T (matches the T.81 FDCT/IDCT definition)."""
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    t = np.cos((2 * n + 1) * k * np.pi / 16.0)
    t[0, :] *= np.sqrt(1.0 / 8.0)
    t[1:, :] *= np.sqrt(2.0 / 8.0)
    return t


_DCT = _dct_matrix()

# Flat canonical huffman tables (encoder side). JPEG huffman tables are
# arbitrary per-file (declared in DHT); using uniform code lengths keeps
# this encoder free of the 162-entry Annex-K table transcription while
# remaining a perfectly valid canonical code (Kraft sum 12/16 resp.
# 162/256 <= 1). ~30-40% larger files than Annex K tables; correctness and
# interop (any spec decoder reads the DHT) are unaffected.
_DC_SYMBOLS = list(range(12))                      # magnitude categories 0..11
_AC_SYMBOLS = sorted(
    {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)
_DC_BITS = [0] * 16
_DC_BITS[3] = len(_DC_SYMBOLS)                      # all DC codes length 4
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMBOLS)                      # all AC codes length 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


# --------------------------------------------------------------- bit I/O

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:            # byte stuffing inside entropy data
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Reads the UNSTUFFED entropy byte stream bit by bit."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG stream")


def _receive_extend(reader: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    x = reader.read_bits(size)
    return x if x >= (1 << (size - 1)) else x - (1 << size) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category size, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


# --------------------------------------------------------------- encoder

def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane padded by edge replication -> (n, 8, 8) blocks in
    raster order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_plane(writer: _BitWriter, plane: np.ndarray, quant: np.ndarray) -> None:
    blocks = _blocks(plane.astype(np.float64) - 128.0)
    coeffs = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    qcoef = np.round(coeffs / quant).astype(np.int64)
    zz = qcoef[:, _ZZ_ROWS, _ZZ_COLS]           # (n, 64) zigzag order
    prev_dc = 0
    for row in zz:
        diff = int(row[0]) - prev_dc
        prev_dc = int(row[0])
        size, bits = _magnitude(diff)
        code, length = _DC_CODES[size]
        writer.write(code, length)
        if size:
            writer.write(bits, size)
        run = 0
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = _AC_CODES[0xF0]   # ZRL
                writer.write(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = _AC_CODES[(run << 4) | size]
            writer.write(code, length)
            writer.write(bits, size)
            run = 0
        if last < 63:
            code, length = _AC_CODES[0x00]       # EOB
            writer.write(code, length)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dht_payload(tc: int, th: int, bits: list[int], symbols: list[int]) -> bytes:
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as a
    baseline 4:4:4 JFIF JPEG. Deterministic; stdlib+numpy only."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg expects (H,W) gray or (H,W,3) RGB")
    h, w, nc = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    px = px.astype(np.float64)

    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    planes = (
        [px[:, :, 0]] if nc == 1
        else [p for p in np.moveaxis(_rgb_to_ycbcr(px), -1, 0)]
    )

    out = bytearray(b"\xff\xd8")                        # SOI
    out += _seg(APP0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_y = qy[_ZZ_ROWS, _ZZ_COLS]
    out += _seg(DQT, bytes([0x00]) + bytes(int(v) for v in zz_y))
    if nc == 3:
        zz_c = qc[_ZZ_ROWS, _ZZ_COLS]
        out += _seg(DQT, bytes([0x01]) + bytes(int(v) for v in zz_c))
    # SOF0: precision 8, dims, components (id, h|v = 0x11, quant table id)
    comps = b"".join(
        bytes([i + 1, 0x11, 0 if i == 0 else 1]) for i in range(nc)
    )
    out += _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + bytes([nc]) + comps)
    out += _seg(DHT, _dht_payload(0, 0, _DC_BITS, _DC_SYMBOLS))
    out += _seg(DHT, _dht_payload(1, 0, _AC_BITS, _AC_SYMBOLS))
    if nc == 3:
        out += _seg(DHT, _dht_payload(0, 1, _DC_BITS, _DC_SYMBOLS))
        out += _seg(DHT, _dht_payload(1, 1, _AC_BITS, _AC_SYMBOLS))
    # SOS: per component -> (dc table | ac table) nibble pair
    sos = bytes([nc]) + b"".join(
        bytes([i + 1, 0x00 if i == 0 else 0x11]) for i in range(nc)
    ) + bytes([0, 63, 0])
    out += _seg(SOS, sos)

    # 4:4:4 interleaved MCUs would require per-MCU interleaving of the three
    # components; with h=v=1 for all components the MCU is one block of
    # each, encoded in component order within each MCU.
    writer = _BitWriter()
    if nc == 1:
        _encode_plane(writer, planes[0], qy)
    else:
        # interleave per MCU: precompute each plane's zigzag rows, then walk
        blocks = []
        for idx, plane in enumerate(planes):
            q = qy if idx == 0 else qc
            b = _blocks(plane - 128.0)
            cf = np.einsum("ij,njk,lk->nil", _DCT, b, _DCT)
            blocks.append(np.round(cf / q).astype(np.int64)[:, _ZZ_ROWS, _ZZ_COLS])
        n_mcu = blocks[0].shape[0]
        prev = [0, 0, 0]
        for m in range(n_mcu):
            for ci in range(3):
                row = blocks[ci][m]
                diff = int(row[0]) - prev[ci]
                prev[ci] = int(row[0])
                size, bits = _magnitude(diff)
                code, length = _DC_CODES[size]
                writer.write(code, length)
                if size:
                    writer.write(bits, size)
                run = 0
                nz = np.nonzero(row[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(row[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = _AC_CODES[0xF0]
                        writer.write(code, length)
                        run -= 16
                    size, bits = _magnitude(v)
                    code, length = _AC_CODES[(run << 4) | size]
                    writer.write(code, length)
                    writer.write(bits, size)
                    run = 0
                if last < 63:
                    code, length = _AC_CODES[0x00]
                    writer.write(code, length)
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder

def _walk_segments(content: bytes):
    """Yield (marker, payload_start, payload_len, entropy_start) tuples;
    raises ValueError on structural corruption."""
    n = len(content)
    if n < 4 or content[0] != 0xFF or content[1] != SOI:
        raise ValueError("no JPEG SOI")
    i = 2
    while i < n:
        if content[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        while i < n and content[i] == 0xFF:            # fill bytes allowed
            i += 1
        if i >= n:
            raise ValueError("truncated at marker")
        marker = content[i]
        i += 1
        if marker == EOI:
            yield (marker, i, 0, None)
            return
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:   # RSTn / TEM: bare
            continue
        if i + 2 > n:
            raise ValueError("truncated segment length")
        seg_len = int.from_bytes(content[i:i + 2], "big")
        if seg_len < 2 or i + seg_len > n:
            raise ValueError("segment overruns payload")
        yield (marker, i + 2, seg_len - 2, i + seg_len)
        i += seg_len
        if marker == SOS:
            # entropy data: scan until a non-RST, non-stuffed marker
            while i < n - 1:
                if content[i] == 0xFF and content[i + 1] not in (0x00,) \
                        and not (0xD0 <= content[i + 1] <= 0xD7):
                    break
                i += 1
            else:
                raise ValueError("entropy stream ran off the end (no EOI)")
    raise ValueError("no EOI marker")


def jpeg_dims(content: bytes):
    """(width, height, channels, 'jpeg', corrupt) or None when the payload
    has no JPEG magic. Structure-only walk — no entropy decode."""
    if content is None:
        return None
    content = bytes(content)
    if len(content) < 2 or content[:2] != b"\xff\xd8":
        return None
    w = h = nc = 0
    ok = False
    try:
        for marker, start, ln, _ in _walk_segments(content):
            if marker in _SOF_ALL and ln >= 6:
                h = int.from_bytes(content[start + 1:start + 3], "big")
                w = int.from_bytes(content[start + 3:start + 5], "big")
                nc = content[start + 5]
            if marker == EOI:
                ok = w > 0 and h > 0 and nc > 0
    except ValueError:
        ok = False
    return (w, h, nc, "jpeg", not ok)


def _unstuff(data: bytes) -> tuple[bytes, list[int]]:
    """Remove byte stuffing; return (clean bytes, restart positions in the
    CLEAN stream)."""
    out = bytearray()
    restarts = []
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == 0xFF and i + 1 < n:
            nxt = data[i + 1]
            if nxt == 0x00:
                out.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                restarts.append(len(out))
                i += 2
                continue
            break                                       # next marker: done
        out.append(b)
        i += 1
    return bytes(out), restarts


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (H, W) uint8 gray or (H, W, 3) uint8 RGB.

    Raises ValueError on corrupt/truncated files and on structurally-valid
    but unsupported coding modes (progressive, arithmetic, 12-bit)."""
    content = bytes(content)
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    entropy = None
    restart_interval = 0

    for marker, start, ln, after in _walk_segments(content):
        seg = content[start:start + ln]
        if marker == DQT:
            j = 0
            while j < ln:
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    vals = np.frombuffer(seg[j:j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                else:
                    vals = np.frombuffer(seg[j:j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                t = np.zeros((8, 8), dtype=np.int64)
                t[_ZZ_ROWS, _ZZ_COLS] = vals
                quant[tq] = t
        elif marker == DHT:
            j = 0
            while j < ln:
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                nsym = sum(bits)
                symbols = list(seg[j + 17:j + 17 + nsym])
                j += 17 + nsym
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = symbols[k]
                        code += 1
                        k += 1
                    code <<= 1
                (huff_dc if tc == 0 else huff_ac)[th] = table
        elif marker == DRI:
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker in SOF_UNSUPPORTED:
            raise ValueError(
                f"unsupported JPEG coding mode (SOF{marker - 0xC0}); only "
                "baseline sequential is implemented"
            )
        elif marker in SOF_BASELINE:
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == SOS:
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tables >> 4, tables & 0x0F)
            scan = sel
            entropy, restarts = _unstuff(content[after:])
            _ = restarts  # positions recorded; reader resets at RST below
    if frame is None or scan is None or entropy is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if set(scan) != {c["id"] for c in comps}:
        # legal but rare: multiple single-component (non-interleaved) scans;
        # refuse cleanly rather than mis-decode the first scan as the image
        raise ValueError("non-interleaved JPEG scans are not supported")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension JPEG")
    for c in comps:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise ValueError(f"unsupported sampling factors {c['h']}x{c['v']}")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        planes.append(np.zeros((bh * 8, bw * 8), dtype=np.float64))

    reader = _BitReader(entropy)
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            # restart: byte-align and reset DC predictors (RST markers were
            # stripped by _unstuff, so only the predictor/bit state resets)
            if reader.bit:
                reader.bit = 0
                reader.pos += 1
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            dc_t = huff_dc.get(scan[c["id"]][0])
            ac_t = huff_ac.get(scan[c["id"]][1])
            q = quant.get(c["tq"])
            if dc_t is None or ac_t is None or q is None:
                raise ValueError("JPEG scan references undeclared table")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    size = _huff_decode(reader, dc_t)
                    pred[ci] += _receive_extend(reader, size)
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(reader, ac_t)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break                      # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _receive_extend(reader, s)
                        k += 1
                    block = np.zeros((8, 8), dtype=np.float64)
                    block[_ZZ_ROWS, _ZZ_COLS] = zz * q[_ZZ_ROWS, _ZZ_COLS]
                    px = _DCT.T @ block @ _DCT + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = px

    # upsample subsampled planes by replication, crop to (h, w)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    if len(comps) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise ValueError(f"unsupported JPEG component count {len(comps)}")
