"""Dependency-free baseline JPEG (ITU-T T.81) codec: stdlib + numpy only.

The reference validates real image files through PIL (``verify()`` +
corruption check, /root/reference/dataset_checker.py:26-62) and ingests
image folders (/root/reference/app.py:221-273). This sandbox has no
PIL/cv2/ffmpeg, so ops/multimodal covers PNM and PNG with stdlib code;
this module un-stubs the remaining (and most common) image format.

Scope — huffman-coded DCT JPEG, sequential AND progressive:

- ``decode_jpeg(content)``: full pixel decode of baseline/extended
  sequential (SOF0/SOF1) and progressive (SOF2) scans, grayscale or
  YCbCr, component sampling factors 1 or 2 (covers 4:4:4, 4:2:2, 4:2:0),
  arbitrary DQT/DHT tables (canonical reconstruction from BITS/HUFFVAL),
  restart markers, byte stuffing. Multi-scan files — progressive
  spectral-selection / successive-approximation scripts (T.81 G.1.2,
  incl. EOB runs and AC refinement) and sequential non-interleaved
  per-component scans — accumulate into coefficient grids dequantized +
  IDCT'd once at the end. Arithmetic coding, lossless modes and 12-bit
  precision raise ``ValueError`` — structurally detected, never
  silently mis-decoded.
- ``encode_jpeg(pixels, quality)``: baseline 4:4:4 (or single-component
  grayscale) encoder — Annex-K quantisation tables scaled by the libjpeg
  quality formula, flat canonical huffman tables generated in code (every
  DC symbol at length 4, every AC symbol at length 8 — a valid, complete-
  enough canonical code that trades compression for table simplicity),
  level shift + orthonormal 8x8 DCT + zigzag + DC-differential / AC
  run-length entropy coding with byte stuffing.
- ``encode_jpeg_progressive(pixels, quality)``: SOF2 encoder with a
  4-stage scan script (interleaved DC first Al=1 → DC refinement →
  per-component AC first Ss=1..63 Al=1 → AC refinement), sharing the
  baseline encoder's quantisation — so progressive decode output is
  bit-identical to the baseline decode of the same image/quality, which
  the tests assert.
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
SOF_PROGRESSIVE = (0xC2,)    # progressive DCT, huffman
SOF_UNSUPPORTED = (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
_SOF_ALL = SOF_BASELINE + SOF_PROGRESSIVE + SOF_UNSUPPORTED

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
        prev_dc = _emit_block_seq(writer, row, prev_dc)


def _emit_block_seq(writer: _BitWriter, row: np.ndarray, prev_dc: int) -> int:
    """Emit one zigzag coefficient row (sequential DC-diff + AC RLE);
    returns the new DC predictor."""
    diff = int(row[0]) - prev_dc
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
    return int(row[0])


def _encode_jpeg_420(px: np.ndarray, quality: int) -> bytes:
    """Baseline 4:2:0 encoder: Y at 2x2 sampling, chroma 2x2-mean
    downsampled; MCU = four Y blocks + one Cb + one Cr (T.81 A.2.3)."""
    h, w = px.shape[:2]
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    ycc = _rgb_to_ycbcr(px)
    mcux, mcuy = -(-w // 16), -(-h // 16)
    pad = ((0, mcuy * 16 - h), (0, mcux * 16 - w))
    ypad = np.pad(ycc[..., 0], pad, mode="edge")
    cbd = np.pad(ycc[..., 1], pad, mode="edge").reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    crd = np.pad(ycc[..., 2], pad, mode="edge").reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))

    def grid(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
        b = _blocks(plane - 128.0)
        cf = np.einsum("ij,njk,lk->nil", _DCT, b, _DCT)
        zz = np.round(cf / q).astype(np.int64)[:, _ZZ_ROWS, _ZZ_COLS]
        return zz.reshape(plane.shape[0] // 8, plane.shape[1] // 8, 64)

    gy, gcb, gcr = grid(ypad, qy), grid(cbd, qc), grid(crd, qc)

    out = bytearray(b"\xff\xd8")
    out += _seg(APP0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(DQT, bytes([0x00]) + bytes(int(v) for v in qy[_ZZ_ROWS, _ZZ_COLS]))
    out += _seg(DQT, bytes([0x01]) + bytes(int(v) for v in qc[_ZZ_ROWS, _ZZ_COLS]))
    comps = bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + bytes([3]) + comps)
    out += _seg(DHT, _dht_payload(0, 0, _DC_BITS, _DC_SYMBOLS))
    out += _seg(DHT, _dht_payload(1, 0, _AC_BITS, _AC_SYMBOLS))
    out += _seg(DHT, _dht_payload(0, 1, _DC_BITS, _DC_SYMBOLS))
    out += _seg(DHT, _dht_payload(1, 1, _AC_BITS, _AC_SYMBOLS))
    out += _seg(SOS, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    writer = _BitWriter()
    preds = [0, 0, 0]
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for by in range(2):
            for bx in range(2):
                preds[0] = _emit_block_seq(writer, gy[2 * my + by, 2 * mx + bx], preds[0])
        preds[1] = _emit_block_seq(writer, gcb[my, mx], preds[1])
        preds[2] = _emit_block_seq(writer, gcr[my, mx], preds[2])
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"
    return bytes(out)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dht_payload(tc: int, th: int, bits: list[int], symbols: list[int]) -> bytes:
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as a
    baseline JFIF JPEG. ``subsampling``: "444" (default) or "420"
    (2x2-mean-downsampled chroma, Y sampling factors 2x2 — the layout
    virtually every camera/web JPEG uses). Deterministic; stdlib+numpy
    only."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg expects (H,W) gray or (H,W,3) RGB")
    h, w, nc = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    px = px.astype(np.float64)
    if subsampling == "420" and nc == 3:
        return _encode_jpeg_420(px, quality)

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
                prev[ci] = _emit_block_seq(writer, blocks[ci][m], prev[ci])
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as a
    progressive (SOF2) 4:4:4 JFIF JPEG with a 4-stage scan script that
    exercises every progressive scan type: interleaved DC first (Al=1),
    DC refinement, per-component AC spectral-selection first scans (Ss=1,
    Se=63, Al=1), and per-component AC refinement scans (Ah=1, Al=0).
    Same flat canonical huffman tables and Annex-K quantisation as the
    baseline encoder; deterministic, stdlib+numpy only."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg_progressive expects (H,W) gray or (H,W,3) RGB")
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
    zzs = []
    for idx, plane in enumerate(planes):
        q = qy if idx == 0 else qc
        b = _blocks(plane - 128.0)
        cf = np.einsum("ij,njk,lk->nil", _DCT, b, _DCT)
        zzs.append(np.round(cf / q).astype(np.int64)[:, _ZZ_ROWS, _ZZ_COLS])

    out = bytearray(b"\xff\xd8")
    out += _seg(APP0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(DQT, bytes([0x00]) + bytes(int(v) for v in qy[_ZZ_ROWS, _ZZ_COLS]))
    if nc == 3:
        out += _seg(DQT, bytes([0x01]) + bytes(int(v) for v in qc[_ZZ_ROWS, _ZZ_COLS]))
    comps = b"".join(bytes([i + 1, 0x11, 0 if i == 0 else 1]) for i in range(nc))
    out += _seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + bytes([nc]) + comps)
    out += _seg(DHT, _dht_payload(0, 0, _DC_BITS, _DC_SYMBOLS))
    out += _seg(DHT, _dht_payload(1, 0, _AC_BITS, _AC_SYMBOLS))
    if nc == 3:
        out += _seg(DHT, _dht_payload(0, 1, _DC_BITS, _DC_SYMBOLS))
        out += _seg(DHT, _dht_payload(1, 1, _AC_BITS, _AC_SYMBOLS))

    def sos(comp_sel, ss, se, ah, al):
        payload = bytes([len(comp_sel)]) + b"".join(
            bytes([cid, (td << 4) | ta]) for cid, td, ta in comp_sel
        ) + bytes([ss, se, (ah << 4) | al])
        return _seg(SOS, payload)

    def scan(header: bytes, emit) -> None:
        writer = _BitWriter()
        emit(writer)
        writer.flush()
        out.extend(header)
        out.extend(writer.buf)

    # DC table selector: comp 0 -> table 0, others -> table 1 (matches DHTs)
    all_sel = [(i + 1, 0 if i == 0 else 1, 0) for i in range(nc)]

    def dc_first(writer, al=1):
        preds = [0] * nc
        for m in range(zzs[0].shape[0]):
            for ci in range(nc):
                v = int(zzs[ci][m, 0]) >> al           # arithmetic shift (T.81 G.1.2.1)
                diff = v - preds[ci]
                preds[ci] = v
                size, bits = _magnitude(diff)
                code, length = _DC_CODES[size]
                writer.write(code, length)
                if size:
                    writer.write(bits, size)

    def dc_refine(writer, al=0):
        for m in range(zzs[0].shape[0]):
            for ci in range(nc):
                writer.write((int(zzs[ci][m, 0]) >> al) & 1, 1)

    def ac_first(writer, ci, al=1):
        for row in zzs[ci]:
            t = np.where(row >= 0, row >> al, -((-row) >> al))  # toward-zero shift
            nz = np.nonzero(t[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            run = 0
            for k in range(1, last + 1):
                v = int(t[k])
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
                code, length = _AC_CODES[0x00]          # EOB (run of 1)
                writer.write(code, length)

    def ac_refine(writer, ci, al=0):
        # T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine bit ordering: ZRL and
        # run/1 symbols first, then the buffered correction bits the decoder
        # will consume while walking to that symbol's position.
        for row in zzs[ci]:
            absv = np.abs(row) >> al
            newly = np.nonzero(absv[1:] == 1)[0]
            eobpos = newly[-1] + 1 if len(newly) else 0
            r, pending = 0, []
            for k in range(1, 64):
                t = int(absv[k])
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobpos:
                    code, length = _AC_CODES[0xF0]
                    writer.write(code, length)
                    r -= 16
                    for b in pending:
                        writer.write(b, 1)
                    pending = []
                if t > 1:
                    pending.append(t & 1)
                    continue
                code, length = _AC_CODES[(r << 4) | 1]
                writer.write(code, length)
                writer.write(1 if row[k] > 0 else 0, 1)
                for b in pending:
                    writer.write(b, 1)
                pending = []
                r = 0
            if r > 0 or pending:
                code, length = _AC_CODES[0x00]          # EOB covering the tail
                writer.write(code, length)
                for b in pending:
                    writer.write(b, 1)

    scan(sos(all_sel, 0, 0, 0, 1), lambda wr: dc_first(wr, 1))
    scan(sos(all_sel, 0, 0, 1, 0), lambda wr: dc_refine(wr, 0))
    for ci in range(nc):
        sel = [(ci + 1, 0, 0 if ci == 0 else 1)]
        scan(sos(sel, 1, 63, 0, 1), lambda wr, c=ci: ac_first(wr, c, 1))
    for ci in range(nc):
        sel = [(ci + 1, 0, 0 if ci == 0 else 1)]
        scan(sos(sel, 1, 63, 1, 0), lambda wr, c=ci: ac_refine(wr, c, 0))
    out += b"\xff\xd9"
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


class _Restarter:
    """Per-scan restart handling: on each DRI boundary, resync the reader to
    the recorded post-RST position (falling back to byte alignment) and
    reset DC predictors + the progressive EOB run."""

    def __init__(self, reader: _BitReader, restarts: list[int], interval: int):
        self.reader, self.restarts, self.interval = reader, restarts, interval
        self.idx = 0

    def at(self, unit: int, pred: list[int], state: dict) -> None:
        if not self.interval or unit == 0 or unit % self.interval:
            return
        if self.idx < len(self.restarts):
            self.reader.pos, self.reader.bit = self.restarts[self.idx], 0
        elif self.reader.bit:
            self.reader.bit = 0
            self.reader.pos += 1
        self.idx += 1
        for i in range(len(pred)):
            pred[i] = 0
        state["eobrun"] = 0


def _decode_block_seq(reader, dc_t, ac_t, pred: int, zz: np.ndarray) -> int:
    """Sequential full-block decode into zigzag array; returns new DC pred."""
    size = _huff_decode(reader, dc_t)
    pred += _receive_extend(reader, size)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break                                      # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _receive_extend(reader, s)
        k += 1
    return pred


def _decode_ac_first(reader, ac_t, zz: np.ndarray, ss: int, se: int, al: int,
                     state: dict) -> None:
    """Progressive AC initial scan for one block (T.81 G.1.2.2)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past spectral band end")
        zz[k] = _receive_extend(reader, s) << al
        k += 1


def _decode_ac_refine(reader, ac_t, zz: np.ndarray, ss: int, se: int, al: int,
                      state: dict) -> None:
    """Progressive AC refinement scan for one block (T.81 G.1.2.3): one
    correction bit per already-nonzero coefficient, run/sign codes for
    newly-nonzero ones. Two's-complement arithmetic makes the ±2^al
    adjustments sign-correct without tracking magnitudes separately."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_t)
            r, s = rs >> 4, rs & 0x0F
            s_val = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients below
            else:
                if s != 1:
                    raise ValueError("invalid refinement magnitude")
                s_val = p1 if reader.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s_val:
                if k > se:
                    raise ValueError("refinement run past spectral band end")
                zz[k] = s_val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if zz[k] != 0 and reader.read_bit() and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to (H, W)
    uint8 gray or (H, W, 3) uint8 RGB. Multiple scans — progressive
    spectral-selection/successive-approximation scripts and sequential
    non-interleaved per-component scans — accumulate into per-component
    coefficient grids that are dequantized + IDCT'd once at the end.

    Raises ValueError on corrupt/truncated files and on structurally-valid
    but unsupported coding modes (arithmetic, lossless, 12-bit)."""
    content = bytes(content)
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    coefs: list[np.ndarray] = []
    saw_scan = False
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
                "huffman sequential and progressive DCT are implemented"
            )
        elif marker in SOF_BASELINE + SOF_PROGRESSIVE:
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
            if w == 0 or h == 0:
                raise ValueError("zero-dimension JPEG")
            for c in comps:
                if c["h"] not in (1, 2) or c["v"] not in (1, 2):
                    raise ValueError(f"unsupported sampling factors {c['h']}x{c['v']}")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                # non-interleaved (single-component scan) block-grid dims:
                # ceil(ceil(dim * sampling / max_sampling) / 8) per T.81 A.2.2
                cw = -(-(w * c["h"]) // hmax)
                ch = -(-(h * c["v"]) // vmax)
                c["nbw"] = -(-cw // 8)
                c["nbh"] = -(-ch // 8)
                coefs.append(np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64))
            frame = {
                "w": w, "h": h, "comps": comps, "hmax": hmax, "vmax": vmax,
                "mcux": mcux, "mcuy": mcuy,
                "progressive": marker in SOF_PROGRESSIVE,
            }
        elif marker == SOS:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sc = []
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next((i for i, cm in enumerate(frame["comps"]) if cm["id"] == cid), None)
                if ci is None:
                    raise ValueError("JPEG scan references unknown component")
                sc.append((ci, tables >> 4, tables & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0
            entropy, restarts = _unstuff(content[after:])
            reader = _BitReader(entropy)
            _decode_scan(reader, restarts, restart_interval, frame, coefs, sc,
                         huff_dc, huff_ac, ss, se, ah, al)
            saw_scan = True

    if frame is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    full = []
    for ci, c in enumerate(comps):
        q = quant.get(c["tq"])
        if q is None:
            raise ValueError("JPEG scan references undeclared table")
        grid = coefs[ci]
        bh, bw = grid.shape[:2]
        zz = grid.reshape(-1, 64).astype(np.float64) * q[_ZZ_ROWS, _ZZ_COLS]
        blocks = np.zeros((zz.shape[0], 8, 8))
        blocks[:, _ZZ_ROWS, _ZZ_COLS] = zz
        px = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT) + 128.0
        plane = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(comps) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    if len(comps) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise ValueError(f"unsupported JPEG component count {len(comps)}")


def _decode_scan(reader, restarts, restart_interval, frame, coefs, sc,
                 huff_dc, huff_ac, ss, se, ah, al) -> None:
    """Decode one entropy-coded scan into the coefficient grids.

    Covers: sequential interleaved (the baseline single-scan case),
    sequential non-interleaved per-component scans, and the four
    progressive scan types (DC/AC × first/refinement)."""
    comps = frame["comps"]
    progressive = frame["progressive"]
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    pred = [0] * len(sc)
    state = {"eobrun": 0}
    rst = _Restarter(reader, restarts, restart_interval)

    if ss == 0 and progressive and se != 0:
        raise ValueError("invalid progressive scan (DC scan with Se > 0)")
    if ss > 0 and len(sc) != 1:
        raise ValueError("progressive AC scan must be single-component")

    def tables(ci_pos: int):
        _, td, ta = sc[ci_pos]
        dc_t = huff_dc.get(td)
        ac_t = huff_ac.get(ta)
        return dc_t, ac_t

    if ss == 0 and not (progressive and ah > 0):
        need_ac = not progressive
        for pos, (ci, td, ta) in enumerate(sc):
            dc_t, ac_t = huff_dc.get(td), huff_ac.get(ta)
            if dc_t is None or (need_ac and ac_t is None):
                raise ValueError("JPEG scan references undeclared table")

    if len(sc) > 1:
        # interleaved MCU traversal (sequential full blocks, or DC-only
        # progressive first/refinement scans)
        for m in range(mcux * mcuy):
            rst.at(m, pred, state)
            my, mx = divmod(m, mcux)
            for pos, (ci, _td, _ta) in enumerate(sc):
                c = comps[ci]
                dc_t, ac_t = tables(pos)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                        if not progressive:
                            pred[pos] = _decode_block_seq(reader, dc_t, ac_t, pred[pos], zz)
                        elif ah == 0:
                            size = _huff_decode(reader, dc_t)
                            pred[pos] += _receive_extend(reader, size)
                            zz[0] = pred[pos] << al
                        else:
                            if reader.read_bit():
                                zz[0] |= 1 << al
        return

    # single-component scan: raster over that component's own block grid
    ci, _td, _ta = sc[0]
    c = comps[ci]
    dc_t, ac_t = tables(0)
    if ss > 0 and ac_t is None:
        raise ValueError("JPEG scan references undeclared table")
    n_blocks = c["nbh"] * c["nbw"]
    for b in range(n_blocks):
        rst.at(b, pred, state)
        by, bx = divmod(b, c["nbw"])
        zz = coefs[ci][by, bx]
        if not progressive:
            pred[0] = _decode_block_seq(reader, dc_t, ac_t, pred[0], zz)
        elif ss == 0:
            if ah == 0:
                size = _huff_decode(reader, dc_t)
                pred[0] += _receive_extend(reader, size)
                zz[0] = pred[0] << al
            else:
                if reader.read_bit():
                    zz[0] |= 1 << al
        elif ah == 0:
            _decode_ac_first(reader, ac_t, zz, ss, se, al, state)
        else:
            _decode_ac_refine(reader, ac_t, zz, ss, se, al, state)
