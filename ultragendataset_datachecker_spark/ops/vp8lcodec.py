"""Dependency-free VP8L (lossless WebP) codec (stdlib + numpy).

The reference validates images of any PIL-readable format per sample
(/root/reference/dataset_checker.py:26-62 — PIL verify + corruption check;
/root/reference/app.py:221-273 — folder ingest), and PIL reads lossless
WebP via libwebp. The sandbox has no PIL/libwebp, so this module decodes
the VP8L payload for real from the public WebP Lossless Bitstream
Specification (RFC 9649 §3, same text as the Google spec), the way
ops/jpegcodec does for JPEG and ops/legacycodecs for BMP/GIF/TIFF:

- full entropy decode: simple + normal prefix codes (code-length codes
  with 16/17/18 repeats, the 19-symbol reordered code-length-code),
  meta-prefix (entropy image), color cache, LZ77 backward references
  with the 120-entry 2D distance neighborhood;
- all four inverse transforms: PREDICTOR (14 modes), COLOR,
  SUBTRACT_GREEN, COLOR_INDEXING (with packed pixel bundling).

Lossy WebP (VP8 key frames) stays a structure probe
(ops/containerprobe.webp_dims) — a VP8 intra decoder genuinely is
ffmpeg/libwebp territory.

An in-kind encoder lives here too (literal-only streams, optional
SUBTRACT_GREEN / single-mode PREDICTOR / single-element COLOR /
COLOR_INDEXING transforms): it exists so tests and the resize stage can
build real bit-exact VP8L payloads without libwebp, mirroring
encode_png/encode_pnm.
"""

from __future__ import annotations

import struct

import numpy as np

# Order in which the 19 code-length-code lengths appear in the stream
# (spec "kCodeLengthCodeOrder").
_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40
_MAX_CACHE_BITS = 11


def _distance_neighborhood():
    """The 120 (dx, dy) pairs the first distance codes map to.

    Spec: every (dx, dy) with dx in [-7, 8], dy in [0, 8] (dy = 0 only
    with dx >= 1) and dx^2 + dy^2 <= 80 — exactly 120 pairs — ordered by
    squared distance, then |dx|, positive dx before negative. The mapped
    linear distance is dy * xsize + dx (clamped to >= 1)."""
    pairs = [
        (dx, dy)
        for dy in range(0, 9)
        for dx in range(-7, 9)
        if (dy > 0 or dx >= 1) and dx * dx + dy * dy <= 80
    ]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    assert len(pairs) == 120
    return pairs


_DIST_MAP = _distance_neighborhood()


class _BitReader:
    """LSB-first bit reader (VP8L convention: bits come out of each byte
    least-significant first; prefix-code bits are then consumed one at a
    time, most-significant code bit first)."""

    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0          # bit position

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self._pos >> 3
            if byte >= len(self._d):
                raise ValueError("VP8L: bitstream truncated")
            v |= ((self._d[byte] >> (self._pos & 7)) & 1) << i
            self._pos += 1
        return v


class _BitWriter:
    """LSB-first bit writer matching _BitReader."""

    def __init__(self):
        self._bytes = bytearray()
        self._acc = 0
        self._n = 0

    def write_bits(self, value: int, n: int) -> None:
        self._acc |= (value & ((1 << n) - 1)) << self._n
        self._n += n
        while self._n >= 8:
            self._bytes.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Write a prefix code MSB-first (the decode-side bit order)."""
        for i in range(length - 1, -1, -1):
            self.write_bits((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        out = bytes(self._bytes)
        if self._n:
            out += bytes([self._acc & 0xFF])
        return out


# ------------------------------------------------------------ prefix codes


class _PrefixCode:
    """Canonical prefix decoder: codes assigned in (length, symbol) order,
    read one bit at a time MSB-first. A single-symbol code consumes zero
    bits (spec: both the 1-symbol simple code and a normal code with one
    used symbol are degenerate)."""

    def __init__(self, lengths):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("VP8L: prefix code with no symbols")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = None
            return
        self.single = None
        used.sort()
        table = {}
        code = 0
        prev_len = used[0][0]
        # Kraft check: the code must be complete, or decoding desyncs.
        kraft = 0
        for length, sym in used:
            code <<= length - prev_len
            prev_len = length
            table[(length, code)] = sym
            kraft += 1 << (15 - length) if length <= 15 else 0
            code += 1
        if kraft != (1 << 15):
            raise ValueError("VP8L: over/under-subscribed prefix code")
        self.table = table
        self.max_len = used[-1][0]

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bits(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


def _read_code_lengths(br: _BitReader, cl_code: _PrefixCode, alphabet_size: int):
    lengths = [0] * alphabet_size
    if br.read_bits(1):                       # explicit max_symbol
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_code_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev_code_len = s
        else:
            if s == 16:
                repeat, fill = 3 + br.read_bits(2), prev_code_len
            elif s == 17:
                repeat, fill = 3 + br.read_bits(3), 0
            else:
                repeat, fill = 11 + br.read_bits(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L: code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bits(1):                       # simple code: 1 or 2 symbols
        num_symbols = br.read_bits(1) + 1
        first_is_8bit = br.read_bits(1)
        sym0 = br.read_bits(8 if first_is_8bit else 1)
        if num_symbols == 2:
            sym1 = br.read_bits(8)
            if sym0 == sym1 or sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("VP8L: bad simple prefix code symbols")
            lengths = [0] * alphabet_size
            lengths[sym0] = lengths[sym1] = 1
            return _PrefixCode(lengths)
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: bad simple prefix code symbol")
        return _single_code(sym0)             # degenerate: zero-bit reads
    num_code_lengths = 4 + br.read_bits(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read_bits(3)
    cl_code = _PrefixCode(cl_lengths)
    return _PrefixCode(_read_code_lengths(br, cl_code, alphabet_size))


def _single_code(symbol: int) -> _PrefixCode:
    code = _PrefixCode.__new__(_PrefixCode)
    code.single = symbol
    code.table = None
    return code


def _prefix_decode(br: _BitReader, prefix_sym: int) -> int:
    """LZ77 length/distance value from its prefix symbol (spec 'prefix
    coding'): symbols 0-3 are 1-4; after that (2 + (s&1)) << extra + 1
    plus extra bits."""
    if prefix_sym < 4:
        return prefix_sym + 1
    extra = (prefix_sym - 2) >> 1
    offset = (2 + (prefix_sym & 1)) << extra
    return offset + br.read_bits(extra) + 1


def _cache_key(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


# ---------------------------------------------------------------- decoder


def _div_round_up(a: int, shift: int) -> int:
    return (a + (1 << shift) - 1) >> shift


def _read_entropy_coded_image(br: _BitReader, w: int, h: int, is_level0: bool):
    """One spatially/entropy-coded ARGB image as a flat uint32 list.

    is_level0 adds the meta-prefix (entropy image) layer; sub-images
    (transform data, entropy image, palette) never have one but do carry
    their own color-cache bit."""
    cache_bits = 0
    if br.read_bits(1):
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= _MAX_CACHE_BITS:
            raise ValueError("VP8L: bad color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read_bits(1):
        meta_bits = br.read_bits(3) + 2
        mw, mh = _div_round_up(w, meta_bits), _div_round_up(h, meta_bits)
        entropy_img = _read_entropy_coded_image(br, mw, mh, False)
        meta = [((p >> 8) & 0xFFFF) for p in entropy_img]   # (red<<8)|green
        num_groups = max(meta) + 1

    green_alpha = _NUM_LITERALS + _NUM_LENGTH_CODES + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, _NUM_LITERALS),       # red
            _read_prefix_code(br, _NUM_LITERALS),       # blue
            _read_prefix_code(br, _NUM_LITERALS),       # alpha
            _read_prefix_code(br, _NUM_DISTANCE_CODES),
        ))

    cache = [0] * cache_size
    n = w * h
    out = [0] * n
    pos = 0
    mw = _div_round_up(w, meta_bits) if meta is not None else 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[meta[(y >> meta_bits) * mw + (x >> meta_bits)]]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < _NUM_LITERALS:                           # literal pixel
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache_size:
                cache[_cache_key(px, cache_bits)] = px
        elif s < _NUM_LITERALS + _NUM_LENGTH_CODES:     # LZ77 backref
            length = _prefix_decode(br, s - _NUM_LITERALS)
            dist_code = _prefix_decode(br, g[4].read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(1, dy * w + dx)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache_size:
                    cache[_cache_key(px, cache_bits)] = px
        else:                                           # color-cache hit
            idx = s - _NUM_LITERALS - _NUM_LENGTH_CODES
            out[pos] = cache[idx]
            pos += 1
    return out


def _ctd(t: int, c: int) -> int:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5, arithmetic shift."""
    t = t - 256 if t >= 128 else t
    c = c - 256 if c >= 128 else c
    return (t * c) >> 5


def _inv_predictor(argb, w: int, h: int, tile_bits: int, modes, mode_w: int):
    """In-place inverse PREDICTOR transform over a flat uint32 list.

    Spec edge rules: pixel (0,0) predicts 0xff000000; the rest of row 0
    uses L; column 0 uses T; the top-right neighbor of the last column is
    the current row's FIRST pixel (the contiguous-buffer quirk the spec
    codifies)."""

    def unpack(p):
        return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)

    def pack(c):
        return (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]

    def avg2(a, b):
        return tuple((x + y) >> 1 for x, y in zip(a, b))

    def clamp_full(l, t, tl):
        return tuple(min(255, max(0, a + b - c)) for a, b, c in zip(l, t, tl))

    def clamp_half(l, t, tl):
        ave = avg2(l, t)
        out = []
        for a, b in zip(ave, tl):
            d = a - b
            half = d // 2 if d >= 0 else -((-d) // 2)   # trunc toward zero
            out.append(min(255, max(0, a + half)))
        return tuple(out)

    def select(l, t, tl):
        p = tuple(a + b - c for a, b, c in zip(l, t, tl))
        p_l = sum(abs(a - b) for a, b in zip(p, l))
        p_t = sum(abs(a - b) for a, b in zip(p, t))
        return t if p_t <= p_l else l

    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = (0xFF, 0, 0, 0)
            elif y == 0:
                pred = unpack(argb[i - 1])
            elif x == 0:
                pred = unpack(argb[i - w])
            else:
                mode = modes[(y >> tile_bits) * mode_w + (x >> tile_bits)]
                L = unpack(argb[i - 1])
                T = unpack(argb[i - w])
                TL = unpack(argb[i - w - 1])
                # TR of the last column = first pixel of the current row.
                TR = unpack(argb[i - w + 1]) if x < w - 1 else unpack(argb[row])
                if mode == 0:
                    pred = (0xFF, 0, 0, 0)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:
                    pred = select(L, T, TL)
                elif mode == 12:
                    pred = clamp_full(L, T, TL)
                elif mode == 13:
                    pred = clamp_half(L, T, TL)
                else:
                    raise ValueError(f"VP8L: predictor mode {mode} out of range")
            res = unpack(argb[i])
            argb[i] = pack(tuple((a + b) & 0xFF for a, b in zip(res, pred)))


def _inv_color_transform(argb, w: int, h: int, tile_bits: int, elems, elem_w: int):
    """In-place inverse COLOR transform. Element channels (spec): blue
    byte = green_to_red, green byte = green_to_blue, red byte =
    red_to_blue; red is recovered first, then blue uses the NEW red."""
    for y in range(h):
        for x in range(w):
            i = y * w + x
            e = elems[(y >> tile_bits) * elem_w + (x >> tile_bits)]
            g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
            p = argb[i]
            a, r, g, b = (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF
            r = (r + _ctd(g2r, g)) & 0xFF
            b = (b + _ctd(g2b, g) + _ctd(r2b, r)) & 0xFF
            argb[i] = (a << 24) | (r << 16) | (g << 8) | b


def _inv_subtract_green(argb):
    for i, p in enumerate(argb):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        argb[i] = (p & 0xFF00FF00) | (r << 16) | b


def _inv_color_indexing(argb, w: int, h: int, palette, pal_bits: int):
    """Palette lookup + pixel unbundling. pal_bits is the width-reduction
    shift (0 when > 16 colors); indices land in the green channel, packed
    bits_per_pixel = 8 >> pal_bits at a time, low bits first."""
    if pal_bits == 0:
        return [
            palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < len(palette) else 0
            for p in argb
        ]
    packed_w = _div_round_up(w, pal_bits)
    bpp = 8 >> pal_bits
    mask = (1 << bpp) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            packed = argb[y * packed_w + (x >> pal_bits)]
            idx = ((packed >> 8) >> ((x & ((1 << pal_bits) - 1)) * bpp)) & mask
            out[y * w + x] = palette[idx] if idx < len(palette) else 0
    return out


def decode_vp8l(payload: bytes):
    """Decode a VP8L chunk payload to ((h, w, 4) uint8 RGBA, alpha_used).

    Raises ValueError on any malformed structure — truncation, bad prefix
    codes, out-of-range backrefs — which the batch decoder maps to
    corrupt=true (the PIL-verify semantics the reference applies,
    /root/reference/dataset_checker.py:38-45)."""
    payload = bytes(payload)
    if len(payload) < 5 or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    header = struct.unpack_from("<I", payload, 1)[0]
    w = (header & 0x3FFF) + 1
    h = ((header >> 14) & 0x3FFF) + 1
    alpha_used = bool((header >> 28) & 1)
    if (header >> 29) & 0x7:
        raise ValueError("VP8L: unsupported version")
    br = _BitReader(payload[5:])

    # Transforms, in stream order; inverses apply in reverse order.
    # COLOR_INDEXING reduces the coded width for everything read after it.
    transforms = []
    seen = set()
    cur_w = w
    while br.read_bits(1):
        ttype = br.read_bits(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype in (0, 1):                   # PREDICTOR / COLOR
            tile_bits = br.read_bits(3) + 2
            tw, th = _div_round_up(cur_w, tile_bits), _div_round_up(h, tile_bits)
            tiles = _read_entropy_coded_image(br, tw, th, False)
            transforms.append((ttype, tile_bits, tiles, tw, cur_w))
        elif ttype == 2:                      # SUBTRACT_GREEN
            transforms.append((2, None, None, None, cur_w))
        else:                                 # COLOR_INDEXING
            n_colors = br.read_bits(8) + 1
            pal_bits = 0 if n_colors > 16 else 1 if n_colors > 4 else 2 if n_colors > 2 else 3
            deltas = _read_entropy_coded_image(br, n_colors, 1, False)
            palette = []
            prev = 0
            for d in deltas:                  # per-channel delta decoding
                prev = (
                    (((prev >> 24) + (d >> 24)) & 0xFF) << 24
                    | ((((prev >> 16) & 0xFF) + ((d >> 16) & 0xFF)) & 0xFF) << 16
                    | ((((prev >> 8) & 0xFF) + ((d >> 8) & 0xFF)) & 0xFF) << 8
                    | (((prev & 0xFF) + (d & 0xFF)) & 0xFF)
                )
                palette.append(prev)
            transforms.append((3, pal_bits, palette, None, cur_w))
            cur_w = _div_round_up(cur_w, pal_bits)

    argb = _read_entropy_coded_image(br, cur_w, h, True)

    for ttype, t_bits, t_data, t_w, t_full_w in reversed(transforms):
        if ttype == 3:
            argb = _inv_color_indexing(argb, t_full_w, h, t_data, t_bits)
        elif ttype == 2:
            _inv_subtract_green(argb)
        elif ttype == 1:
            elems = t_data
            _inv_color_transform(argb, t_full_w, h, t_bits, elems, t_w)
        else:
            modes = [(p >> 8) & 0xFF for p in t_data]
            _inv_predictor(argb, t_full_w, h, t_bits, modes, t_w)

    a = np.array(argb, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[:, :, 0] = (a >> 16) & 0xFF
    rgba[:, :, 1] = (a >> 8) & 0xFF
    rgba[:, :, 2] = a & 0xFF
    rgba[:, :, 3] = (a >> 24) & 0xFF
    return rgba, alpha_used


# --------------------------------------------------------- RIFF container


def _vp8l_chunk(content: bytes):
    """Return the VP8L chunk payload from a RIFF/WEBP container, or None
    (not WebP / no lossless chunk). Truncated chunk → ValueError."""
    content = bytes(content) if content else b""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        return None
    riff_end = min(len(content), 8 + struct.unpack_from("<I", content, 4)[0])
    i = 12
    while i + 8 <= riff_end:
        fourcc = content[i:i + 4]
        size = struct.unpack_from("<I", content, i + 4)[0]
        if i + 8 + size > riff_end:
            raise ValueError("WebP: truncated chunk")
        if fourcc == b"VP8L":
            return content[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)
    return None


def webp_lossless_pixels(content: bytes):
    """Decode a lossless WebP file to an (h, w, 4) uint8 RGBA array.
    Raises ValueError when not WebP, lossy-only, or malformed."""
    payload = _vp8l_chunk(content)
    if payload is None:
        raise ValueError("not a lossless WebP payload")
    return decode_vp8l(payload)[0]


def webp_real_dims(content: bytes):
    """Drop-in upgrade of containerprobe.webp_dims for the decode chain:
    same (w, h, n_channels, 'webp', corrupt) contract, but VP8L payloads
    are FULLY pixel-decoded so corrupt means what PIL-verify means (bad
    prefix codes, truncated entropy data, out-of-range backrefs), not just
    a broken chunk chain. Lossy VP8 stays the structure probe."""
    from ultragendataset_datachecker_spark.ops.containerprobe import webp_dims

    probed = webp_dims(content)
    if probed is None:
        return None
    try:
        payload = _vp8l_chunk(content)
        if payload is None:
            return probed
        rgba, alpha_used = decode_vp8l(payload)
        h, w = rgba.shape[:2]
        return (w, h, 4 if alpha_used else 3, "webp", False)
    except ValueError:
        return (probed[0], probed[1], probed[2], "webp", True)


# ---------------------------------------------------------------- encoder


def _limited_huffman_lengths(counts, max_len: int = 15):
    """Code lengths from symbol counts, depth-limited by halving counts
    and rebuilding (converges fast; exact optimality doesn't matter for
    an in-kind re-encoder)."""
    import heapq

    counts = list(counts)
    used = [s for s, c in enumerate(counts) if c > 0]
    if not used:
        raise ValueError("VP8L encoder: empty alphabet")
    if len(used) == 1:
        return {used[0]: 0}, True             # degenerate zero-bit code
    while True:
        heap = [(c, s, None, None) for s, c in enumerate(counts) if c > 0]
        heapq.heapify(heap)
        nodes = list(heap)
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            merged = (a[0] + b[0], -len(nodes) - 1, a, b)
            nodes.append(merged)
            heapq.heappush(heap, merged)
        lengths = {}

        def walk(node, depth):
            if node[2] is None:
                lengths[node[1]] = max(1, depth)
            else:
                walk(node[2], depth + 1)
                walk(node[3], depth + 1)

        walk(heap[0], 0)
        if max(lengths.values()) <= max_len:
            return lengths, False
        counts = [(c + 1) >> 1 if c else 0 for c in counts]


def _canonical_codes(lengths: dict):
    """(length, symbol)-ordered canonical code assignment."""
    codes = {}
    code = 0
    prev_len = None
    for length, sym in sorted((l, s) for s, l in lengths.items() if l > 0):
        if prev_len is None:
            prev_len = length
        code <<= length - prev_len
        prev_len = length
        codes[sym] = (code, length)
        code += 1
    return codes


class _EncodedCode:
    """One prefix code on the encode side: knows how to write its own
    definition into the stream and how to emit symbols."""

    def __init__(self, counts, alphabet_size: int):
        self.alphabet_size = alphabet_size
        lengths, degenerate = _limited_huffman_lengths(counts)
        self.lengths = lengths
        self.degenerate = degenerate
        self.codes = {} if degenerate else _canonical_codes(lengths)

    def write_definition(self, bw: _BitWriter) -> None:
        syms = sorted(self.lengths)
        if len(syms) <= 2 and all(s < 256 for s in syms):
            bw.write_bits(1, 1)                       # simple code
            bw.write_bits(len(syms) - 1, 1)
            first_is_8bit = 0 if syms[0] <= 1 else 1
            bw.write_bits(first_is_8bit, 1)
            bw.write_bits(syms[0], 8 if first_is_8bit else 1)
            if len(syms) == 2:
                bw.write_bits(syms[1], 8)
            return
        bw.write_bits(0, 1)                           # normal code
        # Code-length code over the lengths used (no 16/17/18 repeats —
        # every symbol's length is spelled out, zeros included).
        cl_counts = [0] * 19
        for s in range(self.alphabet_size):
            cl_counts[self.lengths.get(s, 0)] += 1
        cl_lengths, cl_degenerate = _limited_huffman_lengths(cl_counts, max_len=7)
        if cl_degenerate:
            # A zero-bit code-length code can't be expressed in the 3-bit
            # fields; pad with an unused second symbol at length 1.
            only = next(iter(cl_lengths))
            cl_lengths = {only: 1, (only + 1) % 19: 1}
        cl_codes = _canonical_codes(cl_lengths)
        bw.write_bits(15, 4)                          # num_code_lengths = 19
        for sym in _CODE_LENGTH_ORDER:
            bw.write_bits(cl_lengths.get(sym, 0), 3)
        bw.write_bits(0, 1)                           # no explicit max_symbol
        for s in range(self.alphabet_size):
            code, length = cl_codes[self.lengths.get(s, 0)]
            bw.write_code(code, length)

    def write_symbol(self, bw: _BitWriter, sym: int) -> None:
        if self.degenerate:
            return
        code, length = self.codes[sym]
        bw.write_code(code, length)


def encode_vp8l(
    pixels: np.ndarray,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
) -> bytes:
    """Encode a numpy image ((h,w) gray, (h,w,3) RGB or (h,w,4) RGBA) as
    a VP8L chunk payload: literal-only streams (no LZ77, no color cache,
    no meta-prefix) with optional transforms — enough to produce real
    bit-exact lossless WebP fixtures without libwebp. Decode parity is
    exact by construction; tests pin it."""
    a = np.ascontiguousarray(pixels)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    if a.shape[2] == 3:
        a = np.concatenate([a, np.full(a.shape[:2] + (1,), 255, dtype=a.dtype)], axis=2)
    rgba = a.astype(np.uint8)
    h, w = rgba.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L encoder: dims out of range")
    alpha_used = bool((rgba[:, :, 3] != 255).any())

    bw = _BitWriter()
    bw.write_bits(0x2F, 8)
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(1 if alpha_used else 0, 1)
    bw.write_bits(0, 3)                               # version

    coded = rgba
    coded_w = w
    pal_list = None
    if palette:
        flat = rgba.reshape(-1, 4)
        colors, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("VP8L encoder: palette mode needs <= 256 colors")
        n_colors = len(colors)
        pal_bits = 0 if n_colors > 16 else 1 if n_colors > 4 else 2 if n_colors > 2 else 3
        idx = inv.reshape(h, w).astype(np.int64)
        if pal_bits:
            packed_w = _div_round_up(w, pal_bits)
            bpp = 8 >> pal_bits
            packed = np.zeros((h, packed_w), dtype=np.int64)
            for x in range(w):
                packed[:, x >> pal_bits] |= idx[:, x] << ((x & ((1 << pal_bits) - 1)) * bpp)
            idx_img = packed
            coded_w = packed_w
        else:
            idx_img = idx
        coded = np.zeros((h, coded_w, 4), dtype=np.uint8)
        coded[:, :, 1] = idx_img & 0xFF               # index in green
        coded[:, :, 3] = 0
        pal_list = [
            (int(c[3]) << 24) | (int(c[0]) << 16) | (int(c[1]) << 8) | int(c[2])
            for c in colors
        ]
    if predictor_mode is not None and not 0 <= predictor_mode <= 13:
        raise ValueError("VP8L encoder: predictor mode out of range")
    if palette and (subtract_green or predictor_mode is not None or color_transform):
        raise ValueError("VP8L encoder: palette mode is exclusive here")

    if color_transform is not None:
        g2r, g2b, r2b = (v & 0xFF for v in color_transform)
        out = coded.astype(np.int64).copy()
        for y in range(h):
            for x in range(coded_w):
                r, g, b = int(coded[y, x, 0]), int(coded[y, x, 1]), int(coded[y, x, 2])
                out[y, x, 0] = (r - _ctd(g2r, g)) & 0xFF
                out[y, x, 2] = (b - _ctd(g2b, g) - _ctd(r2b, r)) & 0xFF
        coded = out.astype(np.uint8)
    if subtract_green:
        g = coded[:, :, 1].astype(np.int16)
        coded = coded.copy()
        coded[:, :, 0] = ((coded[:, :, 0].astype(np.int16) - g) & 0xFF).astype(np.uint8)
        coded[:, :, 2] = ((coded[:, :, 2].astype(np.int16) - g) & 0xFF).astype(np.uint8)
    if predictor_mode is not None:
        coded = _fwd_predictor_simple(coded, predictor_mode)

    # Transform list, in stream order. Inverses run in reverse read order
    # at decode, and the forward passes below apply color -> subtract
    # green -> predictor, so the stream lists COLOR, SUBTRACT_GREEN,
    # PREDICTOR (decoder then inverts predictor first, color last).
    if color_transform is not None:
        bw.write_bits(1, 1)
        bw.write_bits(1, 2)                           # COLOR
        bw.write_bits(7, 3)                           # tile_bits = 9
        tile_bits = 9
        tw, th = _div_round_up(w, tile_bits), _div_round_up(h, tile_bits)
        g2r, g2b, r2b = (v & 0xFF for v in color_transform)
        elem = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
        _write_uniform_subimage(bw, tw, th, elem)
    if subtract_green:
        bw.write_bits(1, 1)
        bw.write_bits(2, 2)                           # SUBTRACT_GREEN
    if predictor_mode is not None:
        bw.write_bits(1, 1)
        bw.write_bits(0, 2)                           # PREDICTOR
        bw.write_bits(7, 3)                           # tile_bits = 9
        tile_bits = 9
        tw, th = _div_round_up(w, tile_bits), _div_round_up(h, tile_bits)
        _write_uniform_subimage(bw, tw, th, (0xFF << 24) | (predictor_mode << 8))
    if palette:
        bw.write_bits(1, 1)
        bw.write_bits(3, 2)                           # COLOR_INDEXING
        bw.write_bits(len(pal_list) - 1, 8)
        deltas = []
        prev = 0
        for c in pal_list:                            # per-channel deltas
            deltas.append(
                (((c >> 24) - (prev >> 24)) & 0xFF) << 24
                | ((((c >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16
                | ((((c >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8
                | (((c & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            prev = c
        _write_literal_image(bw, deltas)
    bw.write_bits(0, 1)                               # end of transforms

    flat = [
        (int(coded[y, x, 3]) << 24) | (int(coded[y, x, 0]) << 16)
        | (int(coded[y, x, 1]) << 8) | int(coded[y, x, 2])
        for y in range(h) for x in range(coded_w)
    ]
    _write_literal_image(bw, flat, is_level0=True)
    return bw.getvalue()


def _fwd_predictor_simple(rgba: np.ndarray, mode: int) -> np.ndarray:
    """Residuals for a single whole-image predictor tile, computed by
    replaying the decoder's reconstruction order so predictions always see
    already-final pixels."""
    h, w = rgba.shape[:2]
    argb_orig = [
        (int(rgba[y, x, 3]) << 24) | (int(rgba[y, x, 0]) << 16)
        | (int(rgba[y, x, 1]) << 8) | int(rgba[y, x, 2])
        for y in range(h) for x in range(w)
    ]
    residual = list(argb_orig)
    tile_bits = 9
    mode_w = _div_round_up(w, tile_bits)
    modes = [mode] * (mode_w * _div_round_up(h, tile_bits))
    # Decoder invariant: after processing pixel i its value is original.
    # So prediction at i depends only on originals; compute it by running
    # the inverse on a zero residual over the original neighborhood.
    zero_img = list(argb_orig)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            snapshot = zero_img[i]
            zero_img[i] = 0
            _inv_predictor_pixel_body(
                zero_img, w, i, x, y, y * w, modes, mode_w, tile_bits)
            pred = zero_img[i]
            zero_img[i] = snapshot
            residual[i] = (
                ((((argb_orig[i] >> 24) & 0xFF) - ((pred >> 24) & 0xFF)) & 0xFF) << 24
                | ((((argb_orig[i] >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF) << 16
                | ((((argb_orig[i] >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8
                | (((argb_orig[i] & 0xFF) - (pred & 0xFF)) & 0xFF)
            )
    out = np.empty_like(rgba)
    for y in range(h):
        for x in range(w):
            p = residual[y * w + x]
            out[y, x] = ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF, (p >> 24) & 0xFF)
    return out


def _inv_predictor_pixel_body(argb, w, i, x, y, row, modes, mode_w, tile_bits):
    """The per-pixel body of _inv_predictor, applied at one position
    (encoder forward pass: the decoder will have reconstructed every
    earlier pixel to its original value, so predicting off originals and
    storing pixel - prediction round-trips exactly)."""
    def unpack(p):
        return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)

    def avg2(a, b):
        return tuple((p + q) >> 1 for p, q in zip(a, b))

    if x == 0 and y == 0:
        pred = (0xFF, 0, 0, 0)
    elif y == 0:
        pred = unpack(argb[i - 1])
    elif x == 0:
        pred = unpack(argb[i - w])
    else:
        mode = modes[(y >> tile_bits) * mode_w + (x >> tile_bits)]
        L = unpack(argb[i - 1])
        T = unpack(argb[i - w])
        TL = unpack(argb[i - w - 1])
        TR = unpack(argb[i - w + 1]) if x < w - 1 else unpack(argb[row])
        if mode == 0:
            pred = (0xFF, 0, 0, 0)
        elif mode == 1:
            pred = L
        elif mode == 2:
            pred = T
        elif mode == 3:
            pred = TR
        elif mode == 4:
            pred = TL
        elif mode == 5:
            pred = avg2(avg2(L, TR), T)
        elif mode == 6:
            pred = avg2(L, TL)
        elif mode == 7:
            pred = avg2(L, T)
        elif mode == 8:
            pred = avg2(TL, T)
        elif mode == 9:
            pred = avg2(T, TR)
        elif mode == 10:
            pred = avg2(avg2(L, TL), avg2(T, TR))
        elif mode == 11:
            p = tuple(a + b - c for a, b, c in zip(L, T, TL))
            p_l = sum(abs(a - b) for a, b in zip(p, L))
            p_t = sum(abs(a - b) for a, b in zip(p, T))
            pred = T if p_t <= p_l else L
        elif mode == 12:
            pred = tuple(min(255, max(0, a + b - c)) for a, b, c in zip(L, T, TL))
        else:
            ave = avg2(L, T)
            out = []
            for a, b in zip(ave, TL):
                d = a - b
                half = d // 2 if d >= 0 else -((-d) // 2)
                out.append(min(255, max(0, a + half)))
            pred = tuple(out)
    res = unpack(argb[i])
    argb[i] = (
        ((res[0] + pred[0]) & 0xFF) << 24
        | ((res[1] + pred[1]) & 0xFF) << 16
        | ((res[2] + pred[2]) & 0xFF) << 8
        | ((res[3] + pred[3]) & 0xFF)
    )


def _write_literal_image(bw: _BitWriter, argb_flat, is_level0: bool = False) -> None:
    """One entropy-coded image: no color cache, no meta-prefix, every
    pixel a literal."""
    bw.write_bits(0, 1)                               # no color cache
    if is_level0:
        bw.write_bits(0, 1)                           # no meta-prefix
    greens = [0] * (_NUM_LITERALS + _NUM_LENGTH_CODES)
    reds = [0] * 256
    blues = [0] * 256
    alphas = [0] * 256
    for p in argb_flat:
        greens[(p >> 8) & 0xFF] += 1
        reds[(p >> 16) & 0xFF] += 1
        blues[p & 0xFF] += 1
        alphas[(p >> 24) & 0xFF] += 1
    dists = [0] * _NUM_DISTANCE_CODES
    dists[0] = 1                                      # unused but present
    codes = [
        _EncodedCode(greens, _NUM_LITERALS + _NUM_LENGTH_CODES),
        _EncodedCode(reds, 256),
        _EncodedCode(blues, 256),
        _EncodedCode(alphas, 256),
        _EncodedCode(dists, _NUM_DISTANCE_CODES),
    ]
    for c in codes:
        c.write_definition(bw)
    green_c, red_c, blue_c, alpha_c, _ = codes
    for p in argb_flat:
        green_c.write_symbol(bw, (p >> 8) & 0xFF)
        red_c.write_symbol(bw, (p >> 16) & 0xFF)
        blue_c.write_symbol(bw, p & 0xFF)
        alpha_c.write_symbol(bw, (p >> 24) & 0xFF)


def _write_uniform_subimage(bw: _BitWriter, w: int, h: int, argb: int) -> None:
    _write_literal_image(bw, [argb] * (w * h))


def encode_webp_lossless(pixels: np.ndarray, **kwargs) -> bytes:
    """Wrap encode_vp8l in a RIFF/WEBP container (even-padded chunk)."""
    payload = encode_vp8l(pixels, **kwargs)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
