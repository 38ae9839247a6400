"""Binary / multimodal columns (S8/S9 + the multimodal LLM-pipeline
extension): images, audio, video as opaque binary columns with typed
metadata, processed by Arrow-batched UDFs.

Reference: jpegs in folders keyed `{post_id}_{shortcode}.jpg`
(`InstagramImageScraper.py:107`), scanned with `os.listdir`
(`ImageLabeler.py:129-131`). Engine: `binaryFile` scan → BinaryType
column; decode/feature steps are mapInPandas with REAL plumbing (schema,
batching, partition control) and STUBBED codecs (no image/audio libs in
this container — swap the codec fn, keep the operator).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_binary_folder(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S9: folder of binary files → (path, image, length, content).

    `image` is the filename — the join key back to post tables (J5).
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path"),
            F.element_at(F.split(F.col("path"), "/"), -1).alias("image"),
            F.col("length"),
            F.col("content"),
        )
    )
    return df


IMAGE_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _sniff_format(b: bytes) -> str:
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return "webp"
    return "unknown"


def _png_dims(b: bytes) -> tuple[int | None, int | None]:
    # IHDR is always first: width/height big-endian at bytes 16..24
    if len(b) >= 24:
        return int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big")
    return None, None


def _jpeg_dims(b: bytes) -> tuple[int | None, int | None]:
    # walk JFIF segments to the first SOFn marker
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            return None, None
        marker = b[i + 1]
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            return w, h
        i += 2 + seg_len
    return None, None


def image_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Real (dependency-free) metadata decode: format sniff + dimension
    parse for png/jpeg headers — everything downstream (filtering by
    size/format, partitioning by format) works on actual values."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for b in pdf[content_col]:
                b = bytes(b)
                fmt = _sniff_format(b)
                w = h = None
                if fmt == "png":
                    w, h = _png_dims(b)
                elif fmt == "jpeg":
                    w, h = _jpeg_dims(b)
                metas.append({"format": fmt, "width": w, "height": h, "n_bytes": len(b)})
            out = pdf.drop(columns=[content_col])
            out["meta"] = metas
            yield out

    schema = T.StructType(
        [f for f in df.schema.fields if f.name != content_col] + [T.StructField("meta", IMAGE_META)]
    )
    return df.mapInPandas(_meta, schema)


def decode_image_stub(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Multimodal decode step — STUB: real pixel decode needs an imaging
    library absent from this container. The operator contract (binary in,
    array<array<int>>-ish tensor out) is what a real codec plugs into.
    """
    raise NotImplementedError(
        "pixel decode requires an imaging library (PIL/cv2) not present in "
        "this container; use image_metadata() for header-level decode, or "
        "swap in a codec-backed mapInPandas with the same signature"
    )


def resize_image_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Multimodal resize step — STUB: real resampling needs an imaging
    library. Contract: binary column in → binary column out with target
    dimensions recorded in metadata; plumbing identical to
    `ml.inference.anonymize_images` (mapInPandas binary→binary)."""
    raise NotImplementedError(
        "image resize requires an imaging library (PIL/cv2) not present in "
        "this container; implement as mapInPandas binary→binary with the "
        "anonymize_images plumbing and update the meta struct"
    )


def sample_video_frames_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Multimodal frame-sampling step — STUB (no video codec available).
    Contract: binary video column → exploded (frame_idx, frame_bytes)."""
    raise NotImplementedError(
        "video frame sampling requires a codec (ffmpeg/pyav) not present in "
        "this container; implement as mapInPandas yielding one row per "
        "sampled frame with columns (path, frame_idx, frame)"
    )
