"""FLAC codec tests.

Round-trips pin the encoder<->decoder pair; the hand-assembled frames
exercise decoder paths the in-repo encoder never emits (LPC subframes,
the 5-bit Rice method, escape partitions, multi-partition residuals,
wasted bits, right/side stereo, inline sample-rate/block-size fields),
written bit-by-bit from the public spec (RFC 9639) so a shared
encoder/decoder bug can't self-certify."""

import numpy as np
import pytest

from ultragendataset_datachecker_spark.ops import multimodal as mm
from ultragendataset_datachecker_spark.ops.flaccodec import (
    _MsbReader,
    _MsbWriter,
    _crc8,
    _crc16,
    _read_coded_number,
    _write_coded_number,
    encode_flac,
    flac_real_info,
    flac_samples,
)

# --------------------------------------------------------- encoder pair


def test_coded_number_roundtrip_and_utf8_compat():
    for v in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1, 1 << 35):
        bw = _MsbWriter()
        _write_coded_number(bw, v)
        bw.align()
        assert _read_coded_number(_MsbReader(bw.getvalue())) == v
    # values in the Unicode range must match real UTF-8 byte sequences
    for cp in (0x80, 0x7FF, 0x800, 0xFFFF, 0x10000):
        bw = _MsbWriter()
        _write_coded_number(bw, cp)
        bw.align()
        assert bw.getvalue() == chr(cp).encode("utf-8")


def test_mono_roundtrip_all_subframe_modes():
    rng = np.random.default_rng(3)
    mono = rng.integers(-5000, 5000, size=2000).astype(np.int64)
    for sub in ("verbatim", "fixed0", "fixed1", "fixed2", "constant"):
        dec, sr, bps = flac_samples(
            encode_flac(mono, sample_rate=8000, bps=16, block_size=512, subframe=sub))
        assert (sr, bps) == (8000, 16)
        assert np.array_equal(dec[:, 0], mono), sub
    const = np.full(777, -42, dtype=np.int64)
    dec, _, _ = flac_samples(encode_flac(const, subframe="constant", block_size=256))
    assert np.array_equal(dec[:, 0], const)


def test_stereo_roundtrip_all_decorrelation_modes():
    rng = np.random.default_rng(4)
    stereo = rng.integers(-30000, 30000, size=(3000, 2)).astype(np.int64)
    for mode in ("independent", "left_side", "mid_side"):
        dec, _, _ = flac_samples(
            encode_flac(stereo, block_size=1024, subframe="fixed2", stereo_mode=mode))
        assert np.array_equal(dec, stereo), mode


def test_bit_depths_and_partial_final_block():
    rng = np.random.default_rng(5)
    for bps in (8, 12, 16, 24):
        lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
        x = rng.integers(lo, hi + 1, size=1111).astype(np.int64)  # 1111 % 512 != 0
        dec, _, got_bps = flac_samples(encode_flac(x, bps=bps, block_size=512))
        assert got_bps == bps
        assert np.array_equal(dec[:, 0], x)


# ------------------------------------------------ hand-built bitstreams


def _streaminfo(sample_rate, channels, bps, n_samples, block_size=4096):
    si = _MsbWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_samples, 36)
    si.align()
    body = si.getvalue() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame_header(bw, bs_code, sr_code, ch_code, ss_code, frame_no=0,
                  bs_field=None, sr_field=None):
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(0, 1)                      # fixed blocking
    bw.write(bs_code, 4)
    bw.write(sr_code, 4)
    bw.write(ch_code, 4)
    bw.write(ss_code, 3)
    bw.write(0, 1)
    _write_coded_number(bw, frame_no)
    if bs_field is not None:
        code_bits = 8 if bs_code == 6 else 16
        bw.write(bs_field, code_bits)
    if sr_field is not None:
        bw.write(sr_field, 8 if sr_code == 12 else 16)


def _finish_frame(header_writer, body_fn):
    """CRC-8 the header, run body_fn(writer), align, CRC-16 the frame."""
    header_writer.align()
    header = header_writer.getvalue()
    bw = _MsbWriter()
    for b in header:
        bw.write(b, 8)
    bw.write(_crc8(header), 8)
    body_fn(bw)
    bw.align()
    body = bw.getvalue()
    return body + _crc16(body).to_bytes(2, "big")


def test_hand_frame_lpc_rice2_multipartition():
    # 8 samples, LPC order 1, precision 4, shift 1, coef 2 -> pred = prev.
    # Residual: rice2 (5-bit params), partition order 1 -> 2 partitions
    # (3 + 4 samples).
    samples = [100, 103, 99, 98, 104, 104, 90, 100]
    residual = [samples[i] - samples[i - 1] for i in range(1, 8)]

    hw = _MsbWriter()
    _frame_header(hw, bs_code=6, sr_code=0, ch_code=0, ss_code=4, bs_field=7)

    def body(bw):
        bw.write(0, 1)
        bw.write(0b100000, 6)           # LPC, order 1
        bw.write(0, 1)                  # no wasted bits
        bw.write_signed(samples[0], 16)  # warmup
        bw.write(3, 4)                  # precision 4 (field = precision-1)
        bw.write_signed(1, 5)           # shift 1
        bw.write_signed(2, 4)           # coefficient 2 -> (2*prev)>>1
        bw.write(1, 2)                  # residual method: rice2
        bw.write(1, 4)                  # partition order 1
        for part, vals in ((0, residual[:3]), (1, residual[3:])):
            bw.write(4, 5)              # rice parameter 4
            for r in vals:
                u = (abs(r) << 1) - (r < 0) if r else 0
                bw.write_unary(u >> 4)
                bw.write(u & 15, 4)

    payload = _streaminfo(8000, 1, 16, 8, block_size=8) + _finish_frame(hw, body)
    dec, sr, bps = flac_samples(payload)
    assert (sr, bps) == (8000, 16)
    assert dec[:, 0].tolist() == samples


def test_hand_frame_escape_partitions_and_wasted_bits():
    # VERBATIM subframe with 2 wasted bits: stored at 14 bits, output <<2.
    samples = [4, -8, 12, 0]            # all multiples of 4
    hw = _MsbWriter()
    _frame_header(hw, bs_code=6, sr_code=13, ch_code=0, ss_code=4,
                  bs_field=3, sr_field=12345)

    def body(bw):
        bw.write(0, 1)
        bw.write(1, 6)                  # VERBATIM
        bw.write(1, 1)                  # wasted bits present
        bw.write(0b01, 2)               # unary 1 -> wasted = 2
        for s in samples:
            bw.write_signed(s >> 2, 14)

    payload = _streaminfo(12345, 1, 16, 4, block_size=4) + _finish_frame(hw, body)
    dec, sr, _ = flac_samples(payload)
    assert sr == 12345                  # inline 16-bit sample rate field
    assert dec[:, 0].tolist() == samples

    # FIXED order 0 with escape partitions: raw 6-bit residuals + a
    # zero-width partition (all zeros).
    vals = [5, -3, 17, -30, 0, 0, 0, 0]
    hw = _MsbWriter()
    _frame_header(hw, bs_code=6, sr_code=0, ch_code=0, ss_code=4, bs_field=7)

    def body2(bw):
        bw.write(0, 1)
        bw.write(0b001000, 6)           # FIXED order 0
        bw.write(0, 1)
        bw.write(0, 2)                  # rice 4-bit method
        bw.write(1, 4)                  # partition order 1 -> 2 partitions
        bw.write(15, 4)                 # partition 0: escape
        bw.write(6, 5)                  # 6-bit verbatim residuals
        for r in vals[:4]:
            bw.write_signed(r, 6)
        bw.write(15, 4)                 # partition 1: escape
        bw.write(0, 5)                  # zero-width -> all zeros

    payload = _streaminfo(8000, 1, 16, 8, block_size=8) + _finish_frame(hw, body2)
    dec, _, _ = flac_samples(payload)
    assert dec[:, 0].tolist() == vals


def test_hand_frame_right_side_stereo():
    left = [10, 20, 30]
    right = [7, 25, -4]
    side = [l - r for l, r in zip(left, right)]
    hw = _MsbWriter()
    _frame_header(hw, bs_code=6, sr_code=12, ch_code=9, ss_code=4,
                  bs_field=2, sr_field=32)    # 32 kHz via the 8-bit field

    def body(bw):
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)   # side (bps+1)
        for s in side:
            bw.write_signed(s, 17)
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)   # right (bps)
        for r in right:
            bw.write_signed(r, 16)

    payload = _streaminfo(32000, 2, 16, 3, block_size=3) + _finish_frame(hw, body)
    dec, sr, _ = flac_samples(payload)
    assert sr == 32000
    assert dec[:, 0].tolist() == left
    assert dec[:, 1].tolist() == right


def test_malformed_frames_raise():
    good = encode_flac(np.arange(-500, 500, dtype=np.int64), block_size=256)
    # CRC-16 bitflip in the last frame body
    bad = bytearray(good)
    bad[-5] ^= 0x01
    with pytest.raises(ValueError):
        flac_samples(bytes(bad))
    # header CRC-8 bitflip (channel bits of the first frame)
    first_frame = good.index(b"\xff\xf8")
    bad = bytearray(good)
    bad[first_frame + 3] ^= 0x10
    with pytest.raises(ValueError):
        flac_samples(bytes(bad))
    with pytest.raises(ValueError):
        flac_samples(good[: len(good) - 7])               # truncated
    assert flac_samples(b"not flac") is None
    info = flac_real_info(bytes(bad))
    assert info is not None and info[3] is True


# ------------------------------------------------------ pipeline wiring


def test_decode_audio_batch_flac_real(spark):
    from tests.test_ops import _media_df

    rng = np.random.default_rng(6)
    x = rng.integers(-20000, 20000, size=(4410, 2)).astype(np.int64)
    payload = encode_flac(x, sample_rate=44100, block_size=1024)
    corrupted = bytearray(payload)
    corrupted[-3] ^= 0xFF
    feats = mm.decode_audio_batch(
        _media_df(spark, [payload, bytes(corrupted)], kind="audio")
    ).orderBy("media_id").collect()
    assert (feats[0]["sample_rate"], feats[0]["n_samples"], feats[0]["corrupt"]) == \
        (44100, 4410, False)
    assert feats[1]["corrupt"] is True


# ----------------------------------------------------- property testing


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=600),
    channels=st.integers(min_value=1, max_value=3),
    bps=st.sampled_from([8, 12, 16, 24]),
    block_size=st.sampled_from([64, 192, 256]),
    subframe=st.sampled_from(["verbatim", "fixed0", "fixed1", "fixed2"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_property_roundtrip_any_shape(n, channels, bps, block_size, subframe, seed):
    rng = np.random.default_rng(seed)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    x = rng.integers(lo, hi + 1, size=(n, channels)).astype(np.int64)
    # pin the extremes so the bounds themselves round-trip
    x[0, 0], x[-1, -1] = lo, hi
    dec, sr, got_bps = flac_samples(
        encode_flac(x, bps=bps, block_size=block_size, subframe=subframe))
    assert got_bps == bps
    assert np.array_equal(dec, x)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=500),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    mode=st.sampled_from(["left_side", "mid_side"]),
)
def test_property_stereo_decorrelation(n, seed, mode):
    rng = np.random.default_rng(seed)
    x = rng.integers(-(1 << 15), 1 << 15, size=(n, 2)).astype(np.int64)
    dec, _, _ = flac_samples(
        encode_flac(x, block_size=128, subframe="fixed1", stereo_mode=mode))
    assert np.array_equal(dec, x)
