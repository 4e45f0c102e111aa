"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata.

The reference loads image/audio folders into per-file metadata rows
(/root/reference/app.py:221-273) and checks images by decoding them
per-sample (corruption = NaN/Inf pixels, size/format bounds —
/root/reference/dataset_checker.py:13-63, config.py:83-86). At Spark scale the
shape is: ``spark.read.format("binaryFile")`` → (path, content:binary) →
Arrow-batched ``mapInPandas`` decode/feature stages.

The decode kernels themselves are STUBBED here (no PIL/cv2/librosa in this
environment): ``decode_image_batch`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (hash-derived
dimensions) exercises the full Spark plumbing — schema, batching, partition
flow — which IS real and tested.
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
    Arrow-batched mapInPandas. Real decoder requires PIL — stubbed here."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        if not fake:
            raise NotImplementedError(
                "image decode requires PIL/cv2 (not in this environment); "
                "pass fake=True to run the deterministic stub decoder"
            )
        for pdf in batches:
            rows = [_fake_decode(c) for c in pdf["content"]]
            out = pd.DataFrame(rows, columns=["width", "height", "n_channels", "format", "corrupt"])
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.select("media_id", "content").mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Stub resize stage: real impl would decode → resize → re-encode per
    Arrow batch. Fake path passes content through (plumbing test only)."""

    def resize(batches: Iterator) -> Iterator:
        if not fake:
            raise NotImplementedError("image resize requires PIL/cv2; pass fake=True for the stub")
        for pdf in batches:
            yield pdf[["media_id", "kind", "content", "meta"]]

    return df.mapInPandas(resize, schema=MEDIA_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 30, fake: bool = False) -> DataFrame:
    """Stub frame sampler: real impl decodes the container and emits every
    Nth frame (UDTF-shaped: one input row → many output rows). The fake path
    emits a deterministic number of 16-byte pseudo-frames per video so the
    1→N fan-out plumbing is real."""

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        if not fake:
            raise NotImplementedError("video decode requires ffmpeg/cv2; pass fake=True for the stub")
        for pdf in batches:
            out_rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n_frames = 1 + (len(content or b"") % 4)
                for i in range(n_frames):
                    out_rows.append((mid, i * every_n, bytes(16)))
            yield pd.DataFrame(out_rows, columns=["media_id", "frame_idx", "frame"])

    return df.select("media_id", "content").mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


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
