"""Binary-column (image/audio/video) plumbing for LLM-data pipelines.

The Spark-side design is fully real — schemas, partitioning, Arrow batch
shapes, mapInPandas signatures; only the codec inner loop is a
deterministic fake (Pillow/ffmpeg are not in this container):
`decode_image_meta` does real header parsing for PNG/JPEG dimensions, and
`decode_image_thumbs` substitutes a byte-sampling fake for pixel decode
(clearly marked; swap points documented at each function).

Scale design:
- binary payloads ride `spark.read.format("binaryFile")` (one row per
  object: path, modificationTime, length, content) — Spark's standard
  opaque-blob source; partition count follows maxPartitionBytes so a
  1000-executor cluster fans out automatically;
- every transform is mapInPandas: one Arrow batch in, one out, no
  per-row Python dispatch; memory is bounded by
  `spark.sql.execution.arrow.maxRecordsPerBatch` — set it low (e.g. 64)
  for multi-MB blobs;
- derived features (dims, histograms, fingerprints) are small typed
  columns, so downstream joins/dedup stay JVM-side.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seo_audit_etl_actor_spark.session import ensure_package_on_executors

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content_sha1", T.StringType(), True),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Opaque-blob scan: one row per file (path, modificationTime, length,
    content binary)."""
    return spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)


def _sniff_image_header(data: bytes) -> tuple[str | None, int | None, int | None]:
    """Deterministic header-only dimension sniff for PNG and baseline JPEG.
    This is real parsing of the container header, not a decode stub."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return "png", int(w), int(h)
    if data[:2] == b"\xff\xd8":  # JPEG SOI; walk segments to SOF0/2
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC2):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return "jpeg", int(w), int(h)
            i += 2 + seg_len
        return "jpeg", None, None
    return None, None, None


def decode_image_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas image metadata extraction: format/dims from container
    headers + content hash. For the (fake-decoded) pixel path see
    `decode_image_thumbs`."""
    ensure_package_on_executors(df.sparkSession)

    def extract(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, data in zip(pdf["path"], pdf[content_col]):
                b = bytes(data) if data is not None else b""
                fmt, w, h = _sniff_image_header(b)
                rows.append(
                    {
                        "path": path,
                        "byte_len": len(b),
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "content_sha1": hashlib.sha1(b).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return df.mapInPandas(extract, IMAGE_META_SCHEMA)


THUMB_SIDE = 8

IMAGE_THUMB_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("thumb", T.ArrayType(T.IntegerType()), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def decode_image_thumbs(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Resize/feature-extract step with a DETERMINISTIC FAKE decoder (no
    image codec ships in this container — the brief's sanctioned stand-in).

    The Spark side is the real contract: mapInPandas over Arrow batches,
    one fixed-width row per image (8×8 "grayscale thumbnail" + mean luma),
    bounded output regardless of blob size. The fake decode samples
    `THUMB_SIDE²` evenly spaced payload bytes — deterministic per content,
    so downstream tests (thumb-distance dedup, feature joins) behave like a
    real decoder's output. Swap `_fake_gray_thumb` for
    `PIL.Image.open(...).convert("L").resize(...)` when a codec exists;
    schema and batch shape do not change.
    """
    ensure_package_on_executors(df.sparkSession)

    def _fake_gray_thumb(b: bytes) -> list[int]:
        n = THUMB_SIDE * THUMB_SIDE
        if not b:
            return [0] * n
        step = max(1, len(b) // n)
        return [b[min(i * step, len(b) - 1)] for i in range(n)]

    def extract(batches) -> Iterator:
        import pandas as pd

        cols = [f.name for f in IMAGE_THUMB_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for path, data in zip(pdf["path"], pdf[content_col]):
                b = bytes(data) if data is not None else b""
                fmt, w, h = _sniff_image_header(b)
                thumb = _fake_gray_thumb(b)
                rows.append(
                    {
                        "path": path,
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "thumb": thumb,
                        "mean_luma": sum(thumb) / len(thumb),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(extract, IMAGE_THUMB_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), True),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_fingerprint", T.StringType(), True),
    ]
)


def sample_frames(df: DataFrame, every_n_bytes: int = 1 << 16, max_frames: int = 8) -> DataFrame:
    """Deterministic fake frame sampler: fingerprints fixed-offset byte
    windows of the blob (stand-in for ffmpeg keyframe extraction — the
    mapInPandas fan-out, bounded output rows per blob, and typed schema are
    the real contract; the codec inner loop is the stub)."""
    ensure_package_on_executors(df.sparkSession)

    def sample(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, data in zip(pdf["path"], pdf["content"]):
                b = bytes(data) if data is not None else b""
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    window = b[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append(
                        {
                            "path": path,
                            "frame_idx": i,
                            "frame_fingerprint": hashlib.sha1(window).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return df.mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


def dedup_by_content(meta: DataFrame) -> DataFrame:
    """Exact binary dedup over the extracted sha1 — JVM-side groupBy on the
    small derived column, never reshuffling blob bytes."""
    return (
        meta.groupBy("content_sha1")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("path").alias("canonical_path"))
        .where(F.col("n_copies") > 1)
    )
