"""Dependency-free BMP / GIF / baseline-TIFF codecs (stdlib + numpy).

The reference validates images of any PIL-readable format per sample
(/root/reference/dataset_checker.py:26-62 — PIL verify + corruption check;
/root/reference/app.py:221-273 — folder ingest). The sandbox has no PIL, so
the common legacy formats are decoded for real here, same as ops/jpegcodec
does for JPEG: structure-walk "dims" functions with the PIL-verify-like
corruption semantics, full pixel decoders, and in-kind re-encoders for the
resize stage.

Every dims function returns ``(width, height, n_channels, fmt, corrupt)``
or ``None`` when the payload doesn't carry that format's magic — matching
decode_pnm/decode_png/jpeg_dims so ops/multimodal can chain them.

Supported for real:
- BMP: BITMAPINFOHEADER(+) BI_RGB 8-bit paletted / 24-bit / 32-bit,
  bottom-up and top-down rows.
- GIF: 87a/89a, global+local palettes, full LZW decode (12-bit growing
  table), interlaced frames deinterlaced; first frame decoded.
- TIFF: single-IFD baseline, compression 1 (none) and 32773 (PackBits),
  8-bit grayscale and RGB(A), II and MM byte orders.

Out of scope (still PIL/cv2 territory): BMP RLE4/RLE8, GIF animation
beyond frame 0, TIFF LZW/JPEG-in-TIFF/tiled/planar.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------- BMP


def _bmp_header(content: bytes):
    """Parse BITMAPFILEHEADER + DIB header. Returns
    (w, h, bpp, compression, data_off, top_down, palette) or None when the
    payload is not BMP, raising nothing."""
    if content is None or len(content) < 26 or content[:2] != b"BM":
        return None
    try:
        data_off = struct.unpack_from("<I", content, 10)[0]
        dib_size = struct.unpack_from("<I", content, 14)[0]
        if dib_size < 40:  # BITMAPCOREHEADER etc. — ancient, refuse as non-BMP-like corrupt
            return None
        w, h = struct.unpack_from("<ii", content, 18)
        planes, bpp = struct.unpack_from("<HH", content, 26)
        compression = struct.unpack_from("<I", content, 30)[0]
    except struct.error:
        return None
    top_down = h < 0
    h = abs(h)
    palette = None
    if bpp == 8:
        n_colors = struct.unpack_from("<I", content, 46)[0] if len(content) >= 50 else 0
        n_colors = n_colors or 256
        pal_off = 14 + dib_size
        pal = np.frombuffer(
            content, dtype=np.uint8,
            count=min(n_colors * 4, max(0, len(content) - pal_off)) // 4 * 4,
            offset=pal_off,
        ).reshape(-1, 4)
        palette = pal[:, [2, 1, 0]].copy()  # BGRA -> RGB
    return (w, h, bpp, compression, data_off, top_down, palette)


def bmp_dims(content: bytes):
    """(width, height, n_channels, 'bmp', corrupt) or None if not BMP.

    corrupt = nonsense dims/bpp, unsupported compression, or a raster that
    doesn't fit in the file (rows are 4-byte aligned) — the same
    "would PIL refuse to load it" semantics as jpeg_dims."""
    hdr = _bmp_header(bytes(content) if content else b"")
    if hdr is None:
        return None
    w, h, bpp, compression, data_off, _td, palette = hdr
    nc = {8: 1, 24: 3, 32: 4}.get(bpp, 0)
    stride = ((w * bpp + 31) // 32) * 4 if nc else 0
    content = bytes(content)
    ok = (
        nc > 0 and w > 0 and h > 0 and compression == 0
        and data_off < len(content)
        and len(content) - data_off >= stride * h
        and (bpp != 8 or (palette is not None and len(palette) > 0))
    )
    return (w, h, nc, "bmp", not ok)


def bmp_pixels(content: bytes) -> np.ndarray:
    """Decode a valid BI_RGB BMP to uint8 (h, w) gray-palette index-expanded
    or (h, w, 3)/(h, w, 4). Raises ValueError on corrupt/unsupported."""
    content = bytes(content)
    dims = bmp_dims(content)
    if dims is None:
        raise ValueError("not a BMP payload")
    if dims[4]:
        raise ValueError("corrupt or unsupported BMP")
    w, h, _nc, _fmt, _ = dims
    _, _, bpp, _, data_off, top_down, palette = _bmp_header(content)
    stride = ((w * bpp + 31) // 32) * 4
    raw = np.frombuffer(content, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idx = rows[:, :w]
        return palette[np.minimum(idx, len(palette) - 1)]
    n = bpp // 8
    px = rows[:, : w * n].reshape(h, w, n)
    if n == 3:
        return px[:, :, [2, 1, 0]].copy()  # BGR -> RGB
    return px[:, :, [2, 1, 0, 3]].copy()  # BGRA -> RGBA


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode uint8 (H, W) gray or (H, W, 3/4) RGB(A) as a 24-bit BI_RGB
    bottom-up BMP. Deterministic; stdlib+numpy only."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    if px.ndim != 3 or px.shape[2] not in (3, 4):
        raise ValueError("encode_bmp expects (H,W) gray or (H,W,3/4)")
    px = px[:, :, :3]
    h, w, _ = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    stride = ((w * 24 + 31) // 32) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    data = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    off = 14 + len(dib)
    head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return head + dib + data


# ---------------------------------------------------------------------- GIF


def _gif_subblocks(content: bytes, i: int):
    """Walk size-prefixed sub-blocks from offset i. Returns
    (concatenated_bytes, next_offset) or (None, i) on truncation."""
    parts = []
    n = len(content)
    while True:
        if i >= n:
            return None, i
        sz = content[i]
        i += 1
        if sz == 0:
            return b"".join(parts), i
        if i + sz > n:
            return None, i
        parts.append(content[i:i + sz])
        i += sz


def _gif_walk(content: bytes):
    """Structure walk. Returns dict with keys w, h, frames (list of
    (left, top, fw, fh, interlaced, palette, min_code, data)), ok — or
    None when the payload is not GIF."""
    if content is None or len(content) < 13 or content[:4] != b"GIF8" or content[4:6] not in (b"7a", b"9a"):
        return None
    w, h = struct.unpack_from("<HH", content, 6)
    packed = content[10]
    i = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = np.frombuffer(content, dtype=np.uint8, count=min(n, len(content) - i), offset=i)
        if len(gct) < n:
            return {"w": w, "h": h, "frames": [], "ok": False}
        gct = gct.reshape(-1, 3)
        i += n
    frames, ok = [], False
    n_total = len(content)
    while i < n_total:
        b0 = content[i]
        i += 1
        if b0 == 0x3B:  # trailer
            ok = True
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            if i >= n_total:
                break
            i += 1
            _, i2 = _gif_subblocks(content, i)
            if _ is None:
                break
            i = i2
        elif b0 == 0x2C:  # image descriptor
            if i + 9 > n_total:
                break
            left, top, fw, fh = struct.unpack_from("<HHHH", content, i)
            ipacked = content[i + 8]
            i += 9
            pal = gct
            if ipacked & 0x80:
                np_ = 3 * (2 << (ipacked & 0x07))
                if i + np_ > n_total:
                    break
                pal = np.frombuffer(content, dtype=np.uint8, count=np_, offset=i).reshape(-1, 3)
                i += np_
            if i >= n_total:
                break
            min_code = content[i]
            i += 1
            data, i2 = _gif_subblocks(content, i)
            if data is None:
                break
            i = i2
            frames.append((left, top, fw, fh, bool(ipacked & 0x40), pal, min_code, data))
        else:
            break  # unknown block type = structural corruption
    return {"w": w, "h": h, "frames": frames, "ok": ok and len(frames) > 0}


def gif_dims(content: bytes):
    """(width, height, 3, 'gif', corrupt) or None if not GIF. corrupt =
    truncated sub-blocks, missing trailer, no image frame, or a frame with
    no palette at all."""
    st = _gif_walk(bytes(content) if content else b"")
    if st is None:
        return None
    ok = st["ok"] and st["w"] > 0 and st["h"] > 0
    ok = ok and all(f[5] is not None and f[2] > 0 and f[3] > 0 for f in st["frames"])
    return (st["w"], st["h"], 3, "gif", not ok)


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> np.ndarray | None:
    """GIF-variant LZW: returns uint8 index array or None on a corrupt
    stream. Codes grow from min_code+1 up to 12 bits; CLEAR resets."""
    clear = 1 << min_code
    end = clear + 1
    bitbuf = bitlen = 0
    pos, n = 0, len(data)
    out = np.empty(max_pixels, dtype=np.uint8)
    out_n = 0
    # table entries as (prefix_code, suffix_byte); roots are implicit
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    next_code = end + 1
    width = min_code + 1
    prev = -1
    stack = np.empty(4097, dtype=np.uint8)
    while True:
        while bitlen < width:
            if pos >= n:
                return None  # ran out mid-stream without END code
            bitbuf |= data[pos] << bitlen
            bitlen += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitlen -= width
        if code == clear:
            next_code = end + 1
            width = min_code + 1
            prev = -1
            continue
        if code == end:
            return out[:out_n]
        if prev == -1:
            if code >= clear:
                return None
            if out_n < max_pixels:
                out[out_n] = code
            out_n += 1
            prev = code
            continue
        # expand code (or prev+first(prev) for the not-yet-defined code)
        incode = code
        sp = 0
        if code >= next_code:
            if code > next_code:
                return None
            code = prev
            sp = 1  # placeholder for first(prev), filled below
        c = code
        while c >= clear:
            stack[sp] = suffix[c]
            sp += 1
            c = prefix[c]
        first = c
        stack[sp] = first
        sp += 1
        if incode >= next_code:
            stack[0] = first
        take = min(sp, max_pixels - out_n)
        if take > 0:
            out[out_n:out_n + take] = stack[:sp][::-1][:take]
        out_n += sp
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = incode
        if out_n >= max_pixels:
            return out[:max_pixels]


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_pixels(content: bytes) -> np.ndarray:
    """Decode the first GIF frame to uint8 (h, w, 3) RGB, composited onto
    the logical screen (background = palette entry 0). Raises ValueError on
    corrupt or truncated payloads."""
    content = bytes(content)
    st = _gif_walk(content)
    if st is None:
        raise ValueError("not a GIF payload")
    if not st["ok"] or not st["frames"]:
        raise ValueError("corrupt GIF")
    w, h = st["w"], st["h"]
    left, top, fw, fh, interlaced, pal, min_code, data = st["frames"][0]
    if pal is None or not (1 <= min_code <= 11):
        raise ValueError("corrupt GIF (palette/min-code)")
    idx = _lzw_decode(data, min_code, fw * fh)
    if idx is None or len(idx) < fw * fh:
        raise ValueError("corrupt GIF (LZW stream)")
    frame = idx.reshape(fh, fw)
    if interlaced:
        de = np.empty_like(frame)
        src = 0
        for start, step in _GIF_INTERLACE_PASSES:
            rows = range(start, fh, step)
            for r in rows:
                de[r] = frame[src]
                src += 1
        frame = de
    frame = np.minimum(frame, len(pal) - 1)
    screen = np.zeros((h, w), dtype=np.uint8)
    y2, x2 = min(h, top + fh), min(w, left + fw)
    screen[top:y2, left:x2] = frame[: y2 - top, : x2 - left]
    return pal[screen]


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """GIF-variant LZW encode with dict reset at 4096 (emit CLEAR)."""
    clear = 1 << min_code
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    out = bytearray()
    bitbuf = bitlen = 0

    def emit(code: int):
        nonlocal bitbuf, bitlen
        bitbuf |= code << bitlen
        bitlen += width
        while bitlen >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8

    emit(clear)
    cur = b""
    for v in indices.tobytes():
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        cur = bytes([v])
    if cur:
        emit(table[cur])
    emit(end)
    if bitlen:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode a uint8 index raster (H, W) + RGB palette (N, 3) as a
    single-frame GIF89a. Palette is padded to the next power of two."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    if idx.ndim != 2 or idx.size == 0:
        raise ValueError("encode_gif expects a non-empty (H,W) index raster")
    if idx.max(initial=0) >= len(pal):
        raise ValueError("index out of palette range")
    h, w = idx.shape
    bits = max(2, int(np.ceil(np.log2(max(2, len(pal))))))
    pal_full = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) & 0x07), 0, 0])
    out += pal_full.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_code = max(2, bits)
    out += bytes([min_code])
    data = _lzw_encode(idx, min_code)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_resize(content: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of a GIF by resampling the first frame's
    index raster and re-encoding against the SAME palette — exact colors,
    no quantization step. Raises ValueError on corrupt input."""
    content = bytes(content)
    st = _gif_walk(content)
    if st is None or not st["ok"] or not st["frames"]:
        raise ValueError("corrupt GIF")
    w, h = st["w"], st["h"]
    left, top, fw, fh, interlaced, pal, min_code, data = st["frames"][0]
    if pal is None:
        raise ValueError("corrupt GIF (no palette)")
    idx = _lzw_decode(data, min_code, fw * fh)
    if idx is None or len(idx) < fw * fh:
        raise ValueError("corrupt GIF (LZW stream)")
    frame = idx.reshape(fh, fw)
    if interlaced:
        de = np.empty_like(frame)
        src = 0
        for start, step in _GIF_INTERLACE_PASSES:
            for r in range(start, fh, step):
                de[r] = frame[src]
                src += 1
        frame = de
    screen = np.zeros((h, w), dtype=np.uint8)
    y2, x2 = min(h, top + fh), min(w, left + fw)
    screen[top:y2, left:x2] = frame[: y2 - top, : x2 - left]
    ys = np.arange(height) * h // height
    xs = np.arange(width) * w // width
    return encode_gif(screen[ys][:, xs], pal)


# --------------------------------------------------------------------- TIFF

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}


def _tiff_ifd(content: bytes):
    """Parse the first IFD of a TIFF. Returns (tags: dict[int, list[int]],
    byteorder) or None if not TIFF, raising nothing on truncation (missing
    entries simply absent)."""
    if content is None or len(content) < 8:
        return None
    if content[:4] == b"II*\x00":
        bo = "<"
    elif content[:4] == b"MM\x00*":
        bo = ">"
    else:
        return None
    try:
        ifd_off = struct.unpack_from(bo + "I", content, 4)[0]
        n_entries = struct.unpack_from(bo + "H", content, ifd_off)[0]
    except struct.error:
        return {"tags": {}, "bo": bo, "truncated": True}
    tags: dict[int, list[int]] = {}
    truncated = False
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        if off + 12 > len(content):
            truncated = True
            break
        tag, typ = struct.unpack_from(bo + "HH", content, off)
        count = struct.unpack_from(bo + "I", content, off + 4)[0]
        sz = _TIFF_TYPE_SIZE.get(typ)
        if sz is None:
            continue
        total = sz * count
        voff = off + 8 if total <= 4 else struct.unpack_from(bo + "I", content, off + 8)[0]
        if voff + total > len(content):
            truncated = True
            continue
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        try:
            vals = list(struct.unpack_from(bo + fmt * count, content, voff))
        except struct.error:
            truncated = True
            continue
        tags[tag] = vals
    return {"tags": tags, "bo": bo, "truncated": truncated}


def tiff_dims(content: bytes):
    """(width, height, n_channels, 'tiff', corrupt) or None if not TIFF.
    corrupt = truncated IFD/strips, unsupported compression (anything but
    none/PackBits), or non-8-bit samples."""
    content = bytes(content) if content else b""
    ifd = _tiff_ifd(content)
    if ifd is None:
        return None
    t = ifd["tags"]
    w = t.get(256, [0])[0]
    h = t.get(257, [0])[0]
    spp = t.get(277, [1])[0]
    bits = t.get(258, [8])
    comp = t.get(259, [1])[0]
    offsets = t.get(273, [])
    counts = t.get(279, [])
    ok = (
        not ifd["truncated"] and w > 0 and h > 0 and 1 <= spp <= 4
        and all(b == 8 for b in bits) and comp in (1, 32773)
        and offsets and len(offsets) == len(counts)
        and all(o + c <= len(content) for o, c in zip(offsets, counts))
    )
    if ok and comp == 1:
        ok = sum(counts) >= w * h * spp
    return (w, h, spp, "tiff", not ok)


def _packbits(data: bytes, want: int) -> bytes | None:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < want:
        b = data[i]
        i += 1
        if b < 128:
            if i + b + 1 > n:
                return None
            out += data[i:i + b + 1]
            i += b + 1
        elif b > 128:
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op
    return bytes(out) if len(out) >= want else None


def tiff_pixels(content: bytes) -> np.ndarray:
    """Decode a valid baseline TIFF to uint8 (h, w) or (h, w, spp).
    Raises ValueError on corrupt/unsupported payloads."""
    content = bytes(content)
    dims = tiff_dims(content)
    if dims is None:
        raise ValueError("not a TIFF payload")
    if dims[4]:
        raise ValueError("corrupt or unsupported TIFF")
    w, h, spp, _, _ = dims
    t = _tiff_ifd(content)["tags"]
    comp = t.get(259, [1])[0]
    rows_per = t.get(278, [h])[0] or h
    offsets, counts = t[273], t[279]
    raster = bytearray()
    remaining_rows = h
    for o, c in zip(offsets, counts):
        strip_rows = min(rows_per, remaining_rows)
        want = strip_rows * w * spp
        chunk = content[o:o + c]
        if comp == 32773:
            dec = _packbits(chunk, want)
            if dec is None:
                raise ValueError("corrupt TIFF (PackBits strip)")
            raster += dec[:want]
        else:
            raster += chunk[:want]
        remaining_rows -= strip_rows
    if len(raster) < w * h * spp:
        raise ValueError("corrupt TIFF (short raster)")
    arr = np.frombuffer(bytes(raster), dtype=np.uint8, count=w * h * spp)
    return arr.reshape(h, w) if spp == 1 else arr.reshape(h, w, spp)


def encode_tiff(pixels: np.ndarray) -> bytes:
    """Encode uint8 (H, W) gray or (H, W, 3/4) as an uncompressed
    little-endian single-strip TIFF."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        spp = 1
    elif px.ndim == 3 and px.shape[2] in (3, 4):
        spp = px.shape[2]
    else:
        raise ValueError("encode_tiff expects (H,W) gray or (H,W,3/4)")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    data = px.tobytes()
    # layout: header(8) | IFD | bits-array (if spp>1) | strip data
    entries = []
    photometric = 1 if spp == 1 else 2

    def entry(tag, typ, count, value):
        entries.append((tag, typ, count, value))

    n_fixed = 9
    ifd_off = 8
    ifd_size = 2 + 12 * n_fixed + 4
    bits_off = ifd_off + ifd_size
    bits_extra = 2 * spp if spp > 2 else 0
    data_off = bits_off + bits_extra
    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    if spp > 2:
        entry(258, 3, spp, bits_off)
    else:
        entry(258, 3, 1, 8)
    entry(259, 3, 1, 1)
    entry(262, 3, 1, photometric)
    entry(273, 4, 1, data_off)
    entry(277, 3, 1, spp)
    entry(278, 4, 1, h)
    entry(279, 4, 1, len(data))
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value in sorted(entries):
        out += struct.pack("<HHI", tag, typ, count)
        if typ == 3 and count == 1:
            out += struct.pack("<HH", value, 0)
        else:
            out += struct.pack("<I", value)
    out += struct.pack("<I", 0)  # next IFD
    if spp > 2:
        out += struct.pack("<" + "H" * spp, *([8] * spp))
    out += data
    return bytes(out)
