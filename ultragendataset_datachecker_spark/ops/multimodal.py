"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata.

The reference loads image/audio folders into per-file metadata rows
(/root/reference/app.py:221-273) and checks images by decoding them
per-sample (corruption = NaN/Inf pixels, size/format bounds —
/root/reference/dataset_checker.py:13-63, config.py:83-86). At Spark scale the
shape is: ``spark.read.format("binaryFile")`` → (path, content:binary) →
Arrow-batched ``mapInPandas`` decode/feature stages.

Decode kernels: formats decodable with the stdlib/numpy are REAL here —
WAV audio (stdlib ``wave``), the PNM image family (P5 PGM / P6 PPM), PNG
(stdlib zlib + numpy unfiltering, ops' own encoder for re-encode),
baseline JPEG (ops/jpegcodec: full huffman+DCT codec, no PIL),
BMP / GIF / baseline TIFF (ops/legacycodecs: BI_RGB, full LZW, PackBits),
lossless WebP (ops/vp8lcodec: full VP8L entropy decode + all four inverse
transforms), FLAC audio (ops/flaccodec: Rice residuals, FIXED/LPC
predictors, stereo decorrelation, CRC checks) and MJPEG-AVI video
(ops/avicodec: RIFF walk + JPEG frames). Lossy WebP (VP8), MP4 and MP3
get structure-validated metadata probes (ops/containerprobe —
dims/frames/durations, the attributes the reference's ingest actually
reads) without sample decode. Formats beyond
that (mkv/webm pixels, VP8/H.264 pixels) raise NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (hash-derived
dimensions) exercises the full Spark plumbing — schema, batching,
partition flow — which is real and tested either way.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, content binary, "
    "meta map<string,string>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, width int, height int, n_channels int, "
    "format string, corrupt boolean"
)

AUDIO_FEATURES_SCHEMA = "media_id string, sample_rate int, n_samples long, duration_sec double, corrupt boolean"

FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, frame binary"


def read_binary_folder(spark: SparkSession, path: str, kind: str) -> DataFrame:
    """Folder of media files → media table (S6 analogue, distributed)."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.create_map(
            F.lit("path"), F.col("path"),
            F.lit("length"), F.col("length").cast("string"),
            F.lit("mtime"), F.col("modificationTime").cast("string"),
        ).alias("meta"),
    )


# ------------------------------------------------------------------- PNM

def _pnm_header(content: bytes):
    """Parse a binary PNM header (P5 gray / P6 RGB): returns
    (width, height, maxval, channels, fmt, raster_offset) or None if the
    payload is not PNM. Whitespace-and-comment tokenizer per the netpbm
    spec: tokens are separated by whitespace; '#' starts a comment to EOL."""
    if content is None or content[:2] not in (b"P5", b"P6"):
        return None
    channels = 1 if content[:2] == b"P5" else 3
    fmt = "pgm" if channels == 1 else "ppm"
    toks, i, n = [], 2, len(content)
    while len(toks) < 3 and i < n:
        c = content[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and content[i:i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < n and not content[j:j + 1].isspace():
                j += 1
            toks.append(content[i:j])
            i = j
    if len(toks) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in toks)
    except ValueError:
        return None
    # exactly one whitespace char after maxval, then the raster
    return (w, h, maxval, channels, fmt, i + 1)


def decode_pnm(content: bytes):
    """Real PNM decode: (width, height, n_channels, format, corrupt).
    corrupt = truncated raster, nonsense dimensions, or unsupported maxval.
    Returns None when the payload is not PNM at all."""
    hdr = _pnm_header(content)
    if hdr is None:
        return None
    w, h, maxval, channels, fmt, off = hdr
    bytes_per = 2 if maxval > 255 else 1
    ok = (
        w > 0 and h > 0 and 0 < maxval < 65536
        and len(content) - off >= w * h * channels * bytes_per
    )
    return (w, h, channels, fmt, not ok)


def pnm_pixels(content: bytes):
    """Decode a valid P5/P6 raster to a numpy array (h, w[, 3])."""
    import numpy as np

    hdr = _pnm_header(content)
    if hdr is None:
        raise ValueError("not a PNM payload")
    w, h, maxval, channels, _fmt, off = hdr
    dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    need = w * h * channels
    arr = np.frombuffer(content, dtype=dt, count=need, offset=off)
    return arr.reshape((h, w) if channels == 1 else (h, w, 3))


def encode_pnm(pixels) -> bytes:
    """Re-encode a numpy image array to binary PNM (maxval 255)."""
    import numpy as np

    a = np.ascontiguousarray(pixels.astype("u1"))
    magic = b"P5" if a.ndim == 2 else b"P6"
    h, w = a.shape[0], a.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


# ------------------------------------------------------------------- PNG
#
# Real PNG support with ONLY stdlib zlib + numpy (the sandbox has no
# PIL/cv2): chunk walk with CRC verification, IHDR/IDAT/IEND structure
# checks, exact raster-length validation (including Adam7 interlaced
# layouts), and full pixel decode (filters 0-4 unfiltered with numpy row
# ops) for the formats that matter — 8/16-bit grayscale/RGB(A),
# non-interlaced. This un-stubs the most common image format for the
# corruption/resize checks (reference behavior: dataset_checker.py:26-62
# PIL verify + corruption flag).

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# raw raster channels per color type (palette rasters are 1 byte/pixel)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(content: bytes):
    """Yield (chunk_type, data, crc_ok) until IEND / truncation."""
    import struct
    import zlib

    i, n = len(PNG_MAGIC), len(content)
    while i + 8 <= n:
        (length,), ctype = struct.unpack(">I", content[i:i + 4]), content[i + 4:i + 8]
        end = i + 8 + length
        if length > 0x7FFFFFFF or end + 4 > n:
            return  # truncated mid-chunk
        data = content[i + 8:end]
        crc = int.from_bytes(content[end:end + 4], "big")
        yield ctype, data, zlib.crc32(ctype + data) & 0xFFFFFFFF == crc
        if ctype == b"IEND":
            return
        i = end + 4


def _png_raster_bytes(w: int, h: int, channels: int, depth: int, interlace: int) -> int:
    """Exact decompressed-raster size: per-scanline filter byte + packed
    pixels; Adam7 splits the image into 7 sub-rasters."""
    def sub(w_, h_):
        if w_ <= 0 or h_ <= 0:
            return 0
        return h_ * (1 + (w_ * channels * depth + 7) // 8)

    if interlace == 0:
        return sub(w, h)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    return sum(
        sub((w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
        for x0, y0, dx, dy in passes
    )


def _png_parse(content: bytes):
    """Full structural validation. Returns (w, h, depth, color_type,
    interlace, idat_bytes, ok) or None when not PNG at all."""
    import struct
    import zlib

    if content is None or not bytes(content).startswith(PNG_MAGIC):
        return None
    content = bytes(content)
    w = h = depth = ctype_v = interlace = None
    idat, seen_plte, seen_iend, ok = [], False, False, True
    first = True
    for ctype, data, crc_ok in _png_chunks(content):
        if not crc_ok:
            ok = False
        if first:
            if ctype != b"IHDR" or len(data) != 13:
                return (0, 0, 0, 0, 0, b"", False)
            w, h, depth, ctype_v, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (
                comp != 0 or filt != 0 or interlace not in (0, 1)
                or ctype_v not in _PNG_CHANNELS
                or depth not in (1, 2, 4, 8, 16)
                or (ctype_v in (2, 4, 6) and depth not in (8, 16))
                or (ctype_v == 3 and depth == 16)
                or w == 0 or h == 0
            ):
                ok = False
            first = False
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            seen_plte = len(data) % 3 == 0 and len(data) > 0
        elif ctype == b"IEND":
            seen_iend = True
    if first:
        return (0, 0, 0, 0, 0, b"", False)
    if not seen_iend or not idat or (ctype_v == 3 and not seen_plte):
        ok = False
    raw = b""
    if ok:
        try:
            raw = zlib.decompress(b"".join(idat))
        except zlib.error:
            ok = False
        if ok and len(raw) != _png_raster_bytes(
            w, h, _PNG_CHANNELS[ctype_v], depth, interlace
        ):
            ok = False
    return (w or 0, h or 0, depth or 0, ctype_v or 0, interlace or 0, raw, ok)


def decode_png(content: bytes):
    """Real PNG decode/verify: (width, height, n_channels, 'png', corrupt).
    corrupt = CRC mismatch, truncation, zlib failure, raster-size mismatch,
    or malformed structure. Returns None when the payload has no PNG magic.
    n_channels follows the DECODED meaning (palette reports 3)."""
    parsed = _png_parse(content)
    if parsed is None:
        return None
    w, h, depth, ctype_v, _il, _raw, ok = parsed
    channels = 3 if ctype_v == 3 else _PNG_CHANNELS.get(ctype_v, 0)
    return (w, h, channels, "png", not ok)


def png_pixels(content: bytes):
    """Decode a valid non-interlaced 8/16-bit gray/RGB(A) PNG to a numpy
    array (h, w) or (h, w, channels) — filters 0-4 unfiltered with numpy
    row vector ops (the per-row Python loop touches h rows, not h*w
    pixels)."""
    import numpy as np

    parsed = _png_parse(content)
    if parsed is None or not parsed[6]:
        raise ValueError("not a valid PNG payload")
    w, h, depth, ctype_v, interlace, raw, _ok = parsed
    if interlace != 0 or depth not in (8, 16) or ctype_v == 3:
        raise ValueError(
            "png_pixels supports non-interlaced 8/16-bit gray/RGB(A) "
            f"(got depth={depth}, color_type={ctype_v}, interlace={interlace})"
        )
    channels = _PNG_CHANNELS[ctype_v]
    bpp = channels * (depth // 8)          # filter unit: bytes per pixel
    stride = 1 + w * bpp
    rows = np.frombuffer(raw, dtype="u1").reshape(h, stride)
    filters, data = rows[:, 0], rows[:, 1:].astype("i4")
    out = np.zeros_like(data)
    zero = np.zeros(w * bpp, dtype="i4")
    for y in range(h):
        cur, f = data[y], int(filters[y])
        prev = out[y - 1] if y else zero
        if f == 0:
            out[y] = cur
        elif f == 2:                        # Up
            out[y] = (cur + prev) & 0xFF
        elif f == 1:                        # Sub: per-lane prefix sum mod 256
            out[y] = (cur.reshape(w, bpp).cumsum(axis=0) & 0xFF).reshape(-1)
        elif f in (3, 4):                   # Average / Paeth: x-sequential
            row = out[y]
            row[:] = cur
            if f == 3:
                for x in range(w * bpp):
                    left = row[x - bpp] if x >= bpp else 0
                    row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
            else:
                for x in range(w * bpp):
                    a = row[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
    px = out.astype("u1").reshape(h, w * bpp)
    if depth == 16:
        px = px.reshape(h, w * channels, 2)
        px = (px[:, :, 0].astype("u2") << 8 | px[:, :, 1]).reshape(h, w, channels)
    else:
        px = px.reshape(h, w, channels)
    return px[:, :, 0] if channels == 1 else px


def encode_png(pixels) -> bytes:
    """Re-encode a numpy image array ((h,w) gray or (h,w,3/4)) to a
    minimal valid 8-bit PNG (filter 0 rows, one IDAT, correct CRCs)."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(pixels.astype("u1"))
    h, w = a.shape[0], a.shape[1]
    channels = 1 if a.ndim == 2 else a.shape[2]
    ctype_v = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    raster = a.reshape(h, w * channels)
    raw = b"".join(b"\x00" + raster[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_v, 0, 0, 0)
    return (
        PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")
    )


def _fake_decode(content: bytes) -> tuple[int, int, int, str, bool]:
    """Deterministic fake image decode: dimensions derived from a content
    hash; 'corrupt' when the payload is empty or starts with a zero byte."""
    if content is None or len(content) == 0:
        return (0, 0, 0, "unknown", True)
    h = hash(bytes(content[:64]))
    return (64 + (h % 512), 64 + ((h >> 9) % 512), 3, "png" if content[:1] != b"\x00" else "raw",
            content[:1] == b"\x00")


def decode_image_batch(df: DataFrame, fake: bool = False) -> DataFrame:
    """content:binary → (width, height, channels, format, corrupt) via
    Arrow-batched mapInPandas. PNM (P5/P6), PNG (stdlib zlib + numpy —
    CRC, structure and exact raster-size verification), baseline JPEG
    (ops/jpegcodec — marker-structure walk, EOI/truncation check), BMP,
    GIF, baseline TIFF (ops/legacycodecs) and lossless WebP (ops/
    vp8lcodec — full VP8L pixel decode; lossy VP8 stays a structure
    probe) decode for real; the remaining formats (video stills) need
    PIL/cv2 (not in this environment) and require fake=True."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        from ultragendataset_datachecker_spark.ops.jpegcodec import jpeg_dims
        from ultragendataset_datachecker_spark.ops.legacycodecs import (
            bmp_dims, gif_dims, tiff_dims,
        )
        from ultragendataset_datachecker_spark.ops.vp8lcodec import webp_real_dims

        for pdf in batches:
            rows = []
            for c in pdf["content"]:
                c = bytes(c) if c is not None else b""
                real = decode_pnm(c)
                for dims in (decode_png, jpeg_dims, bmp_dims, gif_dims, tiff_dims,
                             webp_real_dims):
                    if real is not None:
                        break
                    real = dims(c)
                if real is not None:
                    rows.append(real)
                elif fake:
                    rows.append(_fake_decode(c))
                else:
                    raise NotImplementedError(
                        "unrecognized image format needs PIL/cv2 (not in this "
                        "environment); pass fake=True to stub it"
                    )
            out = pd.DataFrame(rows, columns=["width", "height", "n_channels", "format", "corrupt"])
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.select("media_id", "content").mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


def decode_audio_batch(df: DataFrame) -> DataFrame:
    """content:binary → (sample_rate, n_samples, duration_sec, corrupt) —
    REAL decode for WAV containers via the stdlib ``wave`` module AND for
    FLAC via ops/flaccodec (full sample decode: Rice residuals, FIXED/LPC
    predictors, stereo decorrelation, CRC-8/16 verification), plus
    structure-validated metadata for MP3 (full Layer-III frame-chain
    walk) via ops/containerprobe. Unparseable payloads mark corrupt=true
    rather than failing the batch, matching the reference's per-file
    try/except metadata loop (app.py:252-273)."""

    def decode(batches: Iterator) -> Iterator:
        import io as _io
        import wave

        import pandas as pd

        from ultragendataset_datachecker_spark.ops.containerprobe import mp3_info
        from ultragendataset_datachecker_spark.ops.flaccodec import flac_real_info

        for pdf in batches:
            rows = []
            for c in pdf["content"]:
                c = bytes(c) if c is not None else b""
                try:
                    with wave.open(_io.BytesIO(c), "rb") as wf:
                        sr = wf.getframerate()
                        n = wf.getnframes()
                        rows.append((sr, n, (n / sr) if sr else 0.0, False))
                        continue
                except Exception:
                    pass
                info = flac_real_info(c)
                if info is None:
                    info = mp3_info(c)
                rows.append(info if info is not None else (0, 0, 0.0, True))
            out = pd.DataFrame(rows, columns=["sample_rate", "n_samples", "duration_sec", "corrupt"])
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.select("media_id", "content").mapInPandas(decode, schema=AUDIO_FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize stage: REAL nearest-neighbor resize + re-encode for PNM,
    (non-interlaced 8/16-bit gray/RGB(A)) PNG, baseline JPEG, BMP, GIF
    (index-raster resample against the original palette — no quantization),
    baseline TIFF and lossless-WebP payloads — pure numpy per Arrow batch,
    each format re-encoded in kind; other formats (lossy WebP, video
    stills) require PIL/cv2 and pass through only under fake=True."""

    def resize(batches: Iterator) -> Iterator:
        import numpy as np

        from ultragendataset_datachecker_spark.ops.jpegcodec import (
            decode_jpeg, encode_jpeg, jpeg_dims,
        )
        from ultragendataset_datachecker_spark.ops.legacycodecs import (
            bmp_dims, bmp_pixels, encode_bmp, encode_tiff, gif_dims,
            gif_resize, tiff_dims, tiff_pixels,
        )
        from ultragendataset_datachecker_spark.ops.vp8lcodec import (
            encode_webp_lossless, webp_lossless_pixels,
        )

        def nn(px):
            ys = (np.arange(height) * px.shape[0] // height)
            xs = (np.arange(width) * px.shape[1] // width)
            return px[ys][:, xs]

        for pdf in batches:
            new_content = []
            for c in pdf["content"]:
                c = bytes(c) if c is not None else b""
                real = decode_pnm(c)
                if real is not None and not real[4]:
                    px = pnm_pixels(c)
                    if px.dtype.itemsize == 2:
                        # 16-bit raster (maxval 256-65535): scale to the
                        # 8-bit range encode_pnm emits — a bare u1 cast
                        # would wrap values mod 256 (silent corruption of
                        # inputs the decoder validates as non-corrupt)
                        maxval = _pnm_header(c)[2]
                        px = (px.astype("u4") * 255 // maxval).astype("u1")
                    new_content.append(encode_pnm(nn(px)))
                    continue
                png = decode_png(c)
                if png is not None and not png[4]:
                    try:
                        px = png_pixels(c)
                    except ValueError:
                        px = None  # valid but unsupported variant (palette/Adam7)
                    if px is not None:
                        if px.dtype.itemsize == 2:
                            px = (px.astype("u4") * 255 // 65535).astype("u1")
                        new_content.append(encode_png(nn(px)))
                        continue
                jpg = jpeg_dims(c)
                if jpg is not None and not jpg[4]:
                    try:
                        px = decode_jpeg(c)
                    except ValueError:
                        px = None  # structurally valid but unsupported mode
                    if px is not None:
                        new_content.append(encode_jpeg(nn(px)))
                        continue
                bmp = bmp_dims(c)
                if bmp is not None and not bmp[4]:
                    new_content.append(encode_bmp(nn(bmp_pixels(c))))
                    continue
                gif = gif_dims(c)
                if gif is not None and not gif[4]:
                    new_content.append(gif_resize(c, width, height))
                    continue
                tif = tiff_dims(c)
                if tif is not None and not tif[4]:
                    new_content.append(encode_tiff(nn(tiff_pixels(c))))
                    continue
                try:
                    px = webp_lossless_pixels(c)
                except ValueError:
                    px = None  # not WebP, lossy-only, or malformed
                if px is not None:
                    new_content.append(encode_webp_lossless(nn(px)))
                    continue
                if fake:
                    new_content.append(c)
                else:
                    raise NotImplementedError(
                        "non-PNM/PNG/JPEG/BMP/GIF/TIFF/lossless-WebP resize "
                        "requires PIL/cv2; pass fake=True for the stub"
                    )
            out = pdf[["media_id", "kind", "content", "meta"]].copy()
            out["content"] = new_content
            yield out

    return df.mapInPandas(resize, schema=MEDIA_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 30, fake: bool = False) -> DataFrame:
    """Frame sampler (UDTF-shaped: one input row → one row per sampled
    frame). REAL for MJPEG-AVI containers (ops/avicodec: RIFF chunk walk,
    frames are JPEG payloads decodable by ops/jpegcodec) — every Nth
    ``00dc`` frame's bytes are emitted. Other containers (mp4/mkv/webm)
    need ffmpeg/cv2 and raise unless ``fake=True``, whose deterministic
    pseudo-frames keep the 1→N fan-out plumbing exercised."""

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        from ultragendataset_datachecker_spark.ops.avicodec import avi_frames, avi_info

        for pdf in batches:
            out_rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                c = bytes(content) if content is not None else b""
                info = avi_info(c)
                if info is not None and not info[5]:
                    for idx, jpg in avi_frames(c):
                        if idx % every_n == 0:
                            out_rows.append((mid, idx, jpg))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "non-MJPEG-AVI video decode requires ffmpeg/cv2; "
                        "pass fake=True for the stub"
                    )
                n_frames = 1 + (len(c) % 4)
                for i in range(n_frames):
                    out_rows.append((mid, i * every_n, bytes(16)))
            yield pd.DataFrame(out_rows, columns=["media_id", "frame_idx", "frame"])

    return df.select("media_id", "content").mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


VIDEO_FEATURES_SCHEMA = (
    "media_id string, width int, height int, n_frames int, fps double, "
    "format string, corrupt boolean"
)


def decode_video_batch(df: DataFrame, fake: bool = False) -> DataFrame:
    """content:binary → (width, height, n_frames, fps, format, corrupt).
    REAL for MJPEG-AVI (structure-validated RIFF walk) and MP4/ISO-BMFF
    (full box-tree walk: tkhd dims, stsz frame count, mdhd-derived fps —
    ops/containerprobe); other containers (mkv/webm) need ffmpeg and
    require fake=True (hash-derived fake metadata)."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        from ultragendataset_datachecker_spark.ops.avicodec import avi_info
        from ultragendataset_datachecker_spark.ops.containerprobe import mp4_info

        for pdf in batches:
            rows = []
            for c in pdf["content"]:
                c = bytes(c) if c is not None else b""
                info = avi_info(c)
                if info is None:
                    info = mp4_info(c)
                if info is not None:
                    rows.append(info)
                elif fake:
                    h = hash(c[:64])
                    rows.append((64 + h % 512, 64 + (h >> 9) % 512,
                                 1 + h % 100, 30.0, "fake", len(c) == 0))
                else:
                    raise NotImplementedError(
                        "non-AVI/MP4 video metadata requires ffmpeg; "
                        "pass fake=True for the stub"
                    )
            out = pd.DataFrame(
                rows,
                columns=["width", "height", "n_frames", "fps", "format", "corrupt"],
            )
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.select("media_id", "content").mapInPandas(decode, schema=VIDEO_FEATURES_SCHEMA)


def media_integrity_violations(features: DataFrame, max_width: int = 4096, max_height: int = 4096) -> DataFrame:
    """Corruption/size checks over decoded features → violation rows, same
    schema as the core engine (the media analogue of dataset_checker.py:26-63
    format/size/corruption checks)."""
    return features.select(
        F.lit(None).cast("int").alias("part"),
        F.col("media_id").alias("doc_id"),
        F.when(F.col("corrupt"), F.lit("media_corrupt"))
        .when((F.col("width") > max_width) | (F.col("height") > max_height), F.lit("media_too_large"))
        .alias("check_name"),
        F.concat_ws("x", F.col("width").cast("string"), F.col("height").cast("string")).alias("observed"),
        F.lit(f"decodable, <= {max_width}x{max_height}").alias("expected"),
    ).where(F.col("check_name").isNotNull())
