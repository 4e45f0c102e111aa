"""Dependency-free FLAC codec (stdlib + numpy).

The reference's audio ingest accepts whatever its audio stack can open
(/root/reference/app.py:252-273 — per-file metadata loop with try/except)
and treats undecodable payloads as corrupt. The sandbox has no
ffmpeg/soundfile, but FLAC is a fully public spec (RFC 9639) decodable
with integer arithmetic alone, so — like ops/jpegcodec for JPEG and
ops/vp8lcodec for lossless WebP — this module decodes FLAC SAMPLES for
real:

- frame headers with CRC-8 verification, UTF-8-style coded frame/sample
  numbers, all block-size / sample-rate / sample-size code forms;
- CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC (orders 1-32)
  subframes, wasted-bits handling;
- Rice-partitioned residuals (4- and 5-bit parameter methods, escape
  partitions);
- left/side, right/side and mid/side stereo decorrelation;
- frame CRC-16 verification.

MDCT codecs (MP3 samples) genuinely stay probe-only (ops/containerprobe)
— a psychoacoustic filterbank is ffmpeg territory.

The in-kind encoder writes real FLAC streams (CONSTANT / VERBATIM /
FIXED 0-2 subframes with single-partition Rice coding, independent or
left-side / mid-side stereo) so tests and fixtures don't need libFLAC.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}

_BLOCKSIZE_CODES = {1: 192}
for _n in range(2, 6):
    _BLOCKSIZE_CODES[_n] = 576 << (_n - 2)
for _n in range(8, 16):
    _BLOCKSIZE_CODES[_n] = 256 << (_n - 8)

_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 (spec §9.2)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial 0x8005, init 0 (spec §9.3)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _MsbReader:
    """MSB-first bit reader (FLAC convention, opposite of VP8L)."""

    def __init__(self, data: bytes, bit_pos: int = 0):
        self._d = data
        self.pos = bit_pos

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        d, p = self._d, self.pos
        if (p + n - 1) >> 3 >= len(d):
            raise ValueError("FLAC: bitstream truncated")
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        d, p = self._d, self.pos
        n = 0
        while True:
            if p >> 3 >= len(d):
                raise ValueError("FLAC: bitstream truncated in unary run")
            if (d[p >> 3] >> (7 - (p & 7))) & 1:
                self.pos = p + 1
                return n
            n += 1
            p += 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _MsbWriter:
    def __init__(self):
        self._bytes = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, n: int) -> None:
        self._acc = (self._acc << n) | (value & ((1 << n) - 1))
        self._n += n
        while self._n >= 8:
            self._bytes.append((self._acc >> (self._n - 8)) & 0xFF)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def getvalue(self) -> bytes:
        assert self._n == 0
        return bytes(self._bytes)


def _read_coded_number(br: _MsbReader) -> int:
    """The UTF-8-style variable-length frame/sample number (spec §9.1.5):
    same prefix scheme as UTF-8 but extended to 7-byte / 36-bit values."""
    first = br.read(8)
    if first < 0x80:
        return first
    n_cont = 0
    mask = 0x40
    while first & mask:
        n_cont += 1
        mask >>= 1
    if n_cont < 1 or n_cont > 6:
        raise ValueError("FLAC: bad coded-number prefix")
    value = first & (mask - 1)
    for _ in range(n_cont):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("FLAC: bad coded-number continuation")
        value = (value << 6) | (b & 0x3F)
    return value


def _write_coded_number(bw: _MsbWriter, value: int) -> None:
    if value < 0x80:
        bw.write(value, 8)
        return
    # k continuation bytes carry 6k bits; the lead byte carries 6-k more.
    k = 1
    while value >= (1 << (6 + 5 * k)) and k < 6:
        k += 1
    bw.write(((0xFF << (7 - k)) & 0xFF) | (value >> (6 * k)), 8)
    for i in range(k - 1, -1, -1):
        bw.write(0x80 | ((value >> (6 * i)) & 0x3F), 8)


def _decode_residual(br: _MsbReader, blocksize: int, order: int):
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    param_bits = 4 + method
    escape = (1 << param_bits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts:
        raise ValueError("FLAC: block size not divisible by partition count")
    residual = []
    for p in range(n_parts):
        count = (blocksize >> part_order) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC: predictor order exceeds partition size")
        param = br.read(param_bits)
        if param == escape:
            bits = br.read(5)
            if bits == 0:
                residual.extend([0] * count)
            else:
                for _ in range(count):
                    residual.append(br.read_signed(bits))
        else:
            for _ in range(count):
                q = br.read_unary()
                u = (q << param) | br.read(param) if param else q
                residual.append((u >> 1) ^ -(u & 1))      # zigzag unmap
    return residual


def _decode_subframe(br: _MsbReader, blocksize: int, bps: int):
    if br.read(1):
        raise ValueError("FLAC: subframe header padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff_bps = bps - wasted
    if eff_bps <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")

    if stype == 0:                                        # CONSTANT
        samples = [br.read_signed(eff_bps)] * blocksize
    elif stype == 1:                                      # VERBATIM
        samples = [br.read_signed(eff_bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:                                # FIXED
        order = stype & 7
        samples = [br.read_signed(eff_bps) for _ in range(order)]
        residual = _decode_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in residual:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + pred)
    elif stype >= 32:                                     # LPC
        order = (stype & 31) + 1
        samples = [br.read_signed(eff_bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        residual = _decode_residual(br, blocksize, order)
        for r in residual:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs)) >> shift
            samples.append(r + pred)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")

    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _parse_streaminfo(content: bytes):
    if len(content) < 4 or content[:4] != b"fLaC":
        return None
    if len(content) < 8 + 34 or (content[4] & 0x7F) != 0:
        raise ValueError("FLAC: first metadata block must be STREAMINFO")
    si_len = int.from_bytes(content[5:8], "big")
    if si_len < 34 or 8 + si_len > len(content):
        raise ValueError("FLAC: truncated STREAMINFO")
    si = content[8:8 + 34]
    packed = int.from_bytes(si[10:18], "big")
    sample_rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    n_samples = packed & ((1 << 36) - 1)
    # walk to the first audio frame
    i = 8 + si_len
    last = bool(content[4] & 0x80)
    while not last:
        if i + 4 > len(content):
            raise ValueError("FLAC: truncated metadata chain")
        last = bool(content[i] & 0x80)
        i += 4 + int.from_bytes(content[i + 1:i + 4], "big")
        if i > len(content):
            raise ValueError("FLAC: metadata block overruns payload")
    return sample_rate, channels, bps, n_samples, i


def flac_samples(content: bytes):
    """Decode a FLAC stream to (samples: np.int32 (n, channels),
    sample_rate, bits_per_sample). Verifies every frame's CRC-8 header
    and CRC-16 frame checksum; raises ValueError on any malformed
    structure. Returns None when the payload has no fLaC magic."""
    content = bytes(content) if content else b""
    parsed = _parse_streaminfo(content)
    if parsed is None:
        return None
    si_rate, si_channels, si_bps, si_total, frame_start = parsed

    out = []
    pos = frame_start
    while pos < len(content):
        frame, pos = _decode_frame(content, pos, si_rate, si_bps)
        if out and frame.shape[1] != out[0].shape[1]:
            raise ValueError("FLAC: channel count changes between frames")
        out.append(frame)
    if not out:
        raise ValueError("FLAC: no audio frames")
    samples = np.concatenate(out, axis=0)
    if samples.shape[1] != si_channels:
        raise ValueError("FLAC: channel count disagrees with STREAMINFO")
    if si_total and len(samples) != si_total:
        raise ValueError("FLAC: decoded sample count disagrees with STREAMINFO")
    return samples, si_rate, si_bps


def _decode_frame(content: bytes, pos: int, si_rate: int, si_bps: int):
    br = _MsbReader(content, pos * 8)
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError("FLAC: bad frame sync code")
    if br.read(1):
        raise ValueError("FLAC: reserved bit set in frame header")
    br.read(1)                                            # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise ValueError("FLAC: reserved bit set in frame header")
    _read_coded_number(br)
    if bs_code == 0:
        raise ValueError("FLAC: reserved block size code")
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_CODES[bs_code]
    if sr_code == 0:
        sample_rate = si_rate
    elif sr_code in _SAMPLE_RATE_CODES:
        sample_rate = _SAMPLE_RATE_CODES[sr_code]
    elif sr_code == 12:
        sample_rate = br.read(8) * 1000
    elif sr_code == 13:
        sample_rate = br.read(16)
    elif sr_code == 14:
        sample_rate = br.read(16) * 10
    else:
        raise ValueError("FLAC: invalid sample rate code")
    if ss_code == 0:
        bps = si_bps
    elif ss_code in _SAMPLE_SIZE_CODES:
        bps = _SAMPLE_SIZE_CODES[ss_code]
    else:
        raise ValueError("FLAC: reserved sample size code")
    header_end = (br.pos + 7) // 8
    if header_end >= len(content):
        raise ValueError("FLAC: truncated frame header")
    if _crc8(content[pos:header_end]) != content[header_end]:
        raise ValueError("FLAC: frame header CRC-8 mismatch")
    br.pos = (header_end + 1) * 8

    if ch_code <= 7:
        channels = [
            _decode_subframe(br, blocksize, bps) for _ in range(ch_code + 1)
        ]
    elif ch_code in (8, 9, 10):
        # stereo decorrelation: the side channel carries one extra bit
        first_extra = 1 if ch_code == 9 else 0
        second_extra = 1 if ch_code in (8, 10) else 0
        c0 = _decode_subframe(br, blocksize, bps + first_extra)
        c1 = _decode_subframe(br, blocksize, bps + second_extra)
        if ch_code == 8:                                  # left/side
            channels = [c0, [l - s for l, s in zip(c0, c1)]]
        elif ch_code == 9:                                # right/side
            channels = [[r + s for s, r in zip(c0, c1)], c1]
        else:                                             # mid/side
            left, right = [], []
            for m, s in zip(c0, c1):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            channels = [left, right]
    else:
        raise ValueError("FLAC: reserved channel assignment")

    br.align()
    frame_end = br.pos // 8
    if frame_end + 2 > len(content):
        raise ValueError("FLAC: truncated frame footer")
    if _crc16(content[pos:frame_end]) != int.from_bytes(
            content[frame_end:frame_end + 2], "big"):
        raise ValueError("FLAC: frame CRC-16 mismatch")
    if sample_rate < 0:
        raise ValueError("FLAC: bad sample rate")
    frame = np.array(channels, dtype=np.int64).T.astype(np.int32)
    return frame, frame_end + 2


def flac_real_info(content: bytes):
    """Drop-in upgrade of containerprobe.flac_info: same (sample_rate,
    n_samples, duration_sec, corrupt) contract, but the audio frames are
    FULLY sample-decoded with CRC verification, so corrupt means what a
    real decoder failing means. Returns None when not FLAC."""
    content = bytes(content) if content else b""
    if len(content) < 4 or content[:4] != b"fLaC":
        return None
    try:
        samples, sample_rate, _bps = flac_samples(content)
    except ValueError:
        from ultragendataset_datachecker_spark.ops.containerprobe import flac_info

        probed = flac_info(content)
        return (probed[0], probed[1], probed[2], True)
    n = len(samples)
    dur = (n / sample_rate) if sample_rate else 0.0
    return (sample_rate, n, round(dur, 6), sample_rate == 0)


# ---------------------------------------------------------------- encoder


def _encode_residual(bw: _MsbWriter, residual) -> None:
    """Single-partition 4-bit Rice coding (partition order 0), parameter
    chosen from the mean magnitude."""
    bw.write(0, 2)                                        # method: rice 4-bit
    bw.write(0, 4)                                        # partition order 0
    zig = [(abs(r) << 1) - (r < 0) if r else 0 for r in residual]
    mean = (sum(zig) // max(1, len(zig))) + 1
    param = 0
    while (1 << (param + 1)) < mean and param < 14:
        param += 1
    bw.write(param, 4)
    for u in zig:
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _encode_subframe(bw: _MsbWriter, samples, bps: int, mode: str) -> None:
    if mode == "constant" and len(set(samples)) > 1:
        mode = "verbatim"                                 # can't be constant
    if mode == "constant":
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)                                    # no wasted bits
        bw.write_signed(samples[0], bps)
        return
    if mode == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(s, bps)
        return
    order = int(mode[len("fixed"):])                      # "fixed0".."fixed2"
    bw.write(0, 1)
    bw.write(8 | order, 6)
    bw.write(0, 1)
    for s in samples[:order]:
        bw.write_signed(s, bps)
    coefs = _FIXED_COEFS[order]
    residual = [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]
    _encode_residual(bw, residual)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 44100,
    bps: int = 16,
    block_size: int = 4096,
    subframe: str = "fixed2",
    stereo_mode: str = "independent",
) -> bytes:
    """Encode int samples ((n,) mono or (n, channels)) as a real FLAC
    stream: STREAMINFO + fixed-blocking frames, CONSTANT / VERBATIM /
    FIXED 0-2 subframes (single-partition Rice residuals), optional
    left-side / mid-side stereo. MD5 is left unset (all zeros), which the
    spec allows."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, channels = a.shape
    if not 1 <= channels <= 8:
        raise ValueError("FLAC encoder: 1-8 channels")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if a.min() < lo or a.max() > hi:
        raise ValueError("FLAC encoder: samples exceed bits-per-sample range")
    if stereo_mode != "independent" and channels != 2:
        raise ValueError("FLAC encoder: stereo modes need 2 channels")
    if subframe not in ("constant", "verbatim", "fixed0", "fixed1", "fixed2"):
        raise ValueError(f"FLAC encoder: unsupported subframe {subframe}")

    frames = bytearray()
    frame_no = 0
    for start in range(0, n, block_size):
        block = a[start:start + block_size]
        bs = len(block)
        bw = _MsbWriter()
        bw.write(0x3FFE, 14)                              # sync
        bw.write(0, 1)                                    # reserved
        bw.write(0, 1)                                    # fixed blocking
        bw.write(7, 4)                                    # block size: 16-bit field
        bw.write(0, 4)                                    # sample rate: STREAMINFO
        if stereo_mode == "independent":
            bw.write(channels - 1, 4)
        elif stereo_mode == "left_side":
            bw.write(8, 4)
        elif stereo_mode == "mid_side":
            bw.write(10, 4)
        else:
            raise ValueError(f"FLAC encoder: unknown stereo mode {stereo_mode}")
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)                                    # reserved
        _write_coded_number(bw, frame_no)
        bw.write(bs - 1, 16)
        bw.align()
        header = bw.getvalue()
        bw = _MsbWriter()
        for b in header:
            bw.write(b, 8)
        bw.write(_crc8(header), 8)

        mode = subframe if bs > 2 else "verbatim"         # fixed needs warmup
        if stereo_mode == "independent":
            for ch in range(channels):
                _encode_subframe(bw, block[:, ch].tolist(), bps, mode)
        else:
            left = block[:, 0].astype(np.int64)
            right = block[:, 1].astype(np.int64)
            side = (left - right).tolist()
            if stereo_mode == "left_side":
                _encode_subframe(bw, left.tolist(), bps, mode)
                _encode_subframe(bw, side, bps + 1, mode)
            else:                                         # mid/side
                mid = ((left + right) >> 1).tolist()
                _encode_subframe(bw, mid, bps, mode)
                _encode_subframe(bw, side, bps + 1, mode)
        bw.align()
        body = bw.getvalue()
        frames += body + struct.pack(">H", _crc16(body))
        frame_no += 1

    si = _MsbWriter()
    si.write(block_size, 16)                              # min block size
    si.write(block_size, 16)                              # max block size
    si.write(0, 24)                                       # min frame size unknown
    si.write(0, 24)                                       # max frame size unknown
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    streaminfo = si.getvalue() + b"\x00" * 16             # MD5 unset
    header = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return header + bytes(frames)
