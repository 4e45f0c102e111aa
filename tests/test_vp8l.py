"""VP8L (lossless WebP) codec tests.

Round-trips pin the encoder<->decoder pair; the hand-assembled bitstreams
exercise decoder paths the in-repo encoder never emits (LZ77 backward
references, the color cache, meta-prefix groups, code-length-code repeat
symbols 17/18), built symbol-by-symbol from the public spec (RFC 9649 §3)
so a shared encoder/decoder bug can't self-certify."""

import numpy as np
import pytest

from ultragendataset_datachecker_spark.ops import multimodal as mm
from ultragendataset_datachecker_spark.ops.vp8lcodec import (
    _DIST_MAP,
    _BitWriter,
    decode_vp8l,
    encode_vp8l,
    encode_webp_lossless,
    webp_lossless_pixels,
    webp_real_dims,
)

# --------------------------------------------------------- encoder pair


def _rand(shape, seed=11):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


def test_roundtrip_plain_rgba_rgb_gray():
    img = _rand((13, 7, 4))
    out, alpha = decode_vp8l(encode_vp8l(img))
    assert np.array_equal(out, img) and alpha

    rgb = _rand((9, 11, 3), seed=2)
    out, alpha = decode_vp8l(encode_vp8l(rgb))
    assert np.array_equal(out[:, :, :3], rgb) and (out[:, :, 3] == 255).all()
    assert not alpha

    gray = _rand((5, 6), seed=3)
    out, _ = decode_vp8l(encode_vp8l(gray))
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray) and np.array_equal(out[:, :, 2], gray)


def test_roundtrip_every_transform():
    img = _rand((12, 10, 4), seed=4)
    assert np.array_equal(decode_vp8l(encode_vp8l(img, subtract_green=True))[0], img)
    for mode in range(14):
        enc = encode_vp8l(img, predictor_mode=mode)
        assert np.array_equal(decode_vp8l(enc)[0], img), f"predictor mode {mode}"
    assert np.array_equal(
        decode_vp8l(encode_vp8l(img, color_transform=(37, 200, 13)))[0], img)
    combo = encode_vp8l(img, subtract_green=True, predictor_mode=11,
                        color_transform=(5, 250, 99))
    assert np.array_equal(decode_vp8l(combo)[0], img)


def test_roundtrip_palette_all_bundling_widths():
    rng = np.random.default_rng(8)
    # 2/4 colors -> 8/4 px per byte, 5/16 -> 2, 17+ -> unpacked.
    for n_colors in (2, 3, 4, 5, 16, 17, 200):
        pal = rng.integers(0, 256, size=(n_colors, 4), dtype=np.uint8)
        img = pal[rng.integers(0, n_colors, size=(10, 13))]
        assert np.array_equal(decode_vp8l(encode_vp8l(img, palette=True))[0], img), n_colors
    # width not a multiple of the packing factor
    pal = np.array([[1, 2, 3, 255], [9, 8, 7, 255]], dtype=np.uint8)
    img = pal[rng.integers(0, 2, size=(3, 11))]
    assert np.array_equal(decode_vp8l(encode_vp8l(img, palette=True))[0], img)


def test_constant_color_degenerate_codes():
    img = np.full((6, 6, 4), 42, dtype=np.uint8)
    assert np.array_equal(decode_vp8l(encode_vp8l(img))[0], img)


# ------------------------------------------------ hand-built bitstreams


def _header(bw, w, h, alpha=0):
    bw.write_bits(0x2F, 8)
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(alpha, 1)
    bw.write_bits(0, 3)


def _simple_code_1(bw, symbol):
    """simple prefix code, one symbol (zero-bit reads)."""
    bw.write_bits(1, 1)
    bw.write_bits(0, 1)                 # num_symbols = 1
    is_8bit = 0 if symbol <= 1 else 1
    bw.write_bits(is_8bit, 1)
    bw.write_bits(symbol, 8 if is_8bit else 1)


def _simple_code_2(bw, sym0, sym1):
    bw.write_bits(1, 1)
    bw.write_bits(1, 1)                 # num_symbols = 2
    is_8bit = 0 if sym0 <= 1 else 1
    bw.write_bits(is_8bit, 1)
    bw.write_bits(sym0, 8 if is_8bit else 1)
    bw.write_bits(sym1, 8)


def _green_code_two_syms(bw, sym_a, sym_b):
    """Normal prefix code over the 280-symbol green alphabet with exactly
    two length-1 symbols, spelled out with 17/18 zero-run repeats — the
    repeat path the in-repo encoder never produces. Canonical codes:
    min(sym) -> 0, max(sym) -> 1."""
    lo, hi = min(sym_a, sym_b), max(sym_a, sym_b)
    bw.write_bits(0, 1)                 # normal code
    # code-length code: symbols {1, 17, 18} at lengths {1, 2, 2}
    # order = [17, 18, 0, 1, ...] -> need first 4 entries
    bw.write_bits(0, 4)                 # num_code_lengths = 4
    for length in (2, 2, 0, 1):         # sym17=2, sym18=2, sym0=0, sym1=1
        bw.write_bits(length, 3)
    bw.write_bits(0, 1)                 # no explicit max_symbol
    # canonical cl codes: sym1 (len 1) -> 0; sym17 -> 10; sym18 -> 11

    def emit_cl(sym):
        if sym == 1:
            bw.write_code(0, 1)
        elif sym == 17:
            bw.write_code(0b10, 2)
        else:
            bw.write_code(0b11, 2)

    def emit_zeros(n):
        while n:
            if n < 3:
                raise AssertionError("pick symbols with gaps >= 3")
            if n <= 10:
                emit_cl(17)
                bw.write_bits(n - 3, 3)
                return
            take = min(n, 138)
            if n - take in (1, 2):      # don't strand a sub-3 remainder
                take = n - 3
            emit_cl(18)
            bw.write_bits(take - 11, 7)
            n -= take
            if n and n <= 10:
                emit_cl(17)
                bw.write_bits(n - 3, 3)
                return

    if lo:
        emit_zeros(lo)
    emit_cl(1)
    emit_zeros(hi - lo - 1)
    emit_cl(1)
    if hi < 279:
        emit_zeros(280 - hi - 1)


def test_hand_stream_lz77_backref():
    # 4x1 image: one literal (r=7, g=0, b=9, a=255), then a length-3
    # backref at distance code 2 -> neighborhood (1, 0) -> dist 1.
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write_bits(0, 1)                 # no transforms
    bw.write_bits(0, 1)                 # no color cache
    bw.write_bits(0, 1)                 # no meta-prefix
    _green_code_two_syms(bw, 0, 258)    # literal g=0 and length-prefix 2
    _simple_code_1(bw, 7)               # red
    _simple_code_1(bw, 9)               # blue
    _simple_code_1(bw, 255)             # alpha
    _simple_code_1(bw, 1)               # distance prefix 1 -> dist_code 2
    bw.write_code(0, 1)                 # green sym 0 (literal); r/b/a: 0 bits
    bw.write_code(1, 1)                 # green sym 258: length prefix 2 -> 3
    # distance: zero-bit code
    out, _ = decode_vp8l(bw.getvalue())
    assert out.shape == (1, 4, 4)
    assert (out == np.array([7, 0, 9, 255], dtype=np.uint8)).all()


def test_distance_map_head_pins_spec_table():
    assert _DIST_MAP[:12] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    ]
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[-3:] == [(4, 8), (-4, 8), (8, 4)]


def _normal_code(bw, lengths_by_sym, alphabet_size):
    """Write a normal prefix-code definition: a flat (repeat-free where
    short, 17/18-runs where long) code-length stream under a fixed
    4-symbol code-length code {1,2,17,18} all at length 2."""
    bw.write_bits(0, 1)                 # normal code
    bw.write_bits(1, 4)                 # num_code_lengths = 5
    for length in (2, 2, 0, 2, 2):      # order 17,18,0,1,2 -> {17,18,1,2}
        bw.write_bits(length, 3)
    bw.write_bits(0, 1)                 # no explicit max_symbol
    codes = {1: 0b00, 2: 0b01, 17: 0b10, 18: 0b11}

    def zeros(n):
        while n:
            if n < 3:
                # spell out single zeros via... not expressible here;
                # the fixtures below always leave gaps of >= 3.
                raise AssertionError("fixture gap < 3")
            if n <= 10:
                bw.write_code(codes[17], 2)
                bw.write_bits(n - 3, 3)
                return
            take = min(n, 138)
            if 0 < n - take < 3:
                take = n - 3
            bw.write_code(codes[18], 2)
            bw.write_bits(take - 11, 7)
            n -= take

    pos = 0
    for sym in sorted(lengths_by_sym):
        if sym > pos:
            zeros(sym - pos)
        bw.write_code(codes[lengths_by_sym[sym]], 2)
        pos = sym + 1
    if pos < alphabet_size:
        zeros(alphabet_size - pos)


def test_hand_stream_color_cache():
    # 3x1 image: literal A (g=8), literal B (g=16), cache hit replaying A.
    cache_bits = 4
    a_argb = (255 << 24) | (1 << 16) | (8 << 8) | 3
    b_argb = (255 << 24) | (1 << 16) | (16 << 8) | 3
    key = lambda px: ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    assert key(a_argb) != key(b_argb)
    cache_sym = 256 + 24 + key(a_argb)
    alphabet = 256 + 24 + (1 << cache_bits)
    trailing = alphabet - cache_sym - 1
    assert cache_sym - 17 >= 3 and (trailing == 0 or trailing >= 3)  # gap rule

    bw = _BitWriter()
    _header(bw, 3, 1)
    bw.write_bits(0, 1)                 # no transforms
    bw.write_bits(1, 1)                 # color cache
    bw.write_bits(cache_bits, 4)
    bw.write_bits(0, 1)                 # no meta-prefix
    # green: sym8 len1, sym16 len2, cache_sym len2 (complete Kraft)
    _normal_code(bw, {8: 1, 16: 2, cache_sym: 2}, alphabet)
    _simple_code_1(bw, 1)               # red
    _simple_code_1(bw, 3)               # blue
    _simple_code_1(bw, 255)             # alpha
    _simple_code_1(bw, 0)               # distance (unused)
    # canonical green codes: sym8 -> 0; sym16 -> 10; cache_sym -> 11
    bw.write_code(0, 1)                 # literal A (g=8)
    bw.write_code(0b10, 2)              # literal B (g=16)
    bw.write_code(0b11, 2)              # cache hit -> A
    out, _ = decode_vp8l(bw.getvalue())
    assert out.shape == (1, 3, 4)
    assert tuple(out[0, 0]) == (1, 8, 3, 255)
    assert tuple(out[0, 1]) == (1, 16, 3, 255)
    assert tuple(out[0, 2]) == (1, 8, 3, 255)   # replayed from the cache


def test_hand_stream_meta_prefix_groups():
    # 6x1 image, meta tile bits 2 (4px tiles -> 2 tiles): group 0 paints
    # green 50, group 1 paints green 200 — all via zero-bit codes.
    bw = _BitWriter()
    _header(bw, 6, 1)
    bw.write_bits(0, 1)                 # no transforms
    bw.write_bits(0, 1)                 # no color cache
    bw.write_bits(1, 1)                 # meta-prefix present
    bw.write_bits(0, 3)                 # huffman_bits = 2
    # entropy image (2x1, is_level0=False): green channel = group index
    bw.write_bits(0, 1)                 # entropy image: no color cache
    _simple_code_2(bw, 0, 1)            # green: syms {0,1}, 1 bit each
    _simple_code_1(bw, 0)               # red
    _simple_code_1(bw, 0)               # blue
    _simple_code_1(bw, 0)               # alpha
    _simple_code_1(bw, 0)               # distance
    bw.write_code(0, 1)                 # tile 0 -> group 0
    bw.write_code(1, 1)                 # tile 1 -> group 1
    # group 0 codes: all single-symbol (zero bits per pixel)
    for sym in (50, 10, 20, 255, 0):    # green, red, blue, alpha, dist
        _simple_code_1(bw, sym)
    # group 1 codes
    for sym in (200, 30, 40, 128, 0):
        _simple_code_1(bw, sym)
    out, _ = decode_vp8l(bw.getvalue())
    assert out.shape == (1, 6, 4)
    for x in range(4):
        assert tuple(out[0, x]) == (10, 50, 20, 255)
    for x in range(4, 6):
        assert tuple(out[0, x]) == (30, 200, 40, 128)


def test_malformed_streams_raise():
    img = _rand((5, 5, 4), seed=9)
    enc = encode_vp8l(img)
    with pytest.raises(ValueError):
        decode_vp8l(enc[: len(enc) // 2])          # truncated entropy data
    with pytest.raises(ValueError):
        decode_vp8l(b"\x2e" + enc[1:])             # bad signature
    bad_version = bytearray(enc)
    bad_version[4] |= 0xE0                         # version != 0
    with pytest.raises(ValueError):
        decode_vp8l(bytes(bad_version))
    # over-subscribed prefix code: three symbols at length 1
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write_bits(0, 1); bw.write_bits(0, 1); bw.write_bits(0, 1)
    _normal_code(bw, {8: 1, 16: 1, 32: 1}, 280)
    with pytest.raises(ValueError):
        decode_vp8l(bw.getvalue())
    # backref before any pixel: green len-prefix with nothing decoded
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write_bits(0, 1); bw.write_bits(0, 1); bw.write_bits(0, 1)
    _normal_code(bw, {8: 1, 258: 2, 259: 2}, 280)
    _simple_code_1(bw, 1); _simple_code_1(bw, 3)
    _simple_code_1(bw, 255); _simple_code_1(bw, 1)
    bw.write_code(0b10, 2)              # sym 258: length 3 backref first
    with pytest.raises(ValueError):
        decode_vp8l(bw.getvalue())


# ------------------------------------------------------ pipeline wiring


def test_webp_real_dims_contract():
    img = _rand((7, 9, 4), seed=5)
    payload = encode_webp_lossless(img)
    assert webp_real_dims(payload) == (9, 7, 4, "webp", False)
    opaque = img.copy()
    opaque[:, :, 3] = 255
    assert webp_real_dims(encode_webp_lossless(opaque))[2:] == (3, "webp", False)
    assert webp_real_dims(b"RIFF\x04\x00\x00\x00WAVE") is None
    # flip one byte inside the entropy data -> still 'webp', corrupt=True
    corrupted = bytearray(payload)
    corrupted[-4] ^= 0xFF
    verdict = webp_real_dims(bytes(corrupted))
    assert verdict is not None and verdict[3] == "webp"
    # (a bitflip may still decode to a valid stream of the same length;
    # a hard truncation may not)
    assert webp_real_dims(payload[: len(payload) - 6])[4] is True


def test_decode_image_batch_and_resize_webp(spark):
    from tests.test_ops import _media_df

    img = _rand((16, 12, 3), seed=6)
    payload = encode_webp_lossless(img)
    feats = mm.decode_image_batch(_media_df(spark, [payload])).collect()[0]
    assert (feats["width"], feats["height"], feats["format"], feats["corrupt"]) == \
        (12, 16, "webp", False)

    resized = mm.resize_images(_media_df(spark, [payload]), 6, 8).collect()[0]
    out = webp_lossless_pixels(bytes(resized["content"]))
    assert out.shape == (8, 6, 4)
    # nearest-neighbor: every output pixel is some input pixel
    ys = (np.arange(8) * 16 // 8)
    xs = (np.arange(6) * 12 // 6)
    assert np.array_equal(out[:, :, :3], img[ys][:, xs])


# ----------------------------------------------------- property testing


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    channels=st.sampled_from([1, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    subtract_green=st.booleans(),
    predictor=st.one_of(st.none(), st.integers(min_value=0, max_value=13)),
)
def test_property_roundtrip_any_shape(w, h, channels, seed, subtract_green, predictor):
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    enc = encode_vp8l(img, subtract_green=subtract_green, predictor_mode=predictor)
    out, _ = decode_vp8l(enc)
    if channels == 1:
        assert np.array_equal(out[:, :, 0], img)
    elif channels == 3:
        assert np.array_equal(out[:, :, :3], img) and (out[:, :, 3] == 255).all()
    else:
        assert np.array_equal(out, img)
