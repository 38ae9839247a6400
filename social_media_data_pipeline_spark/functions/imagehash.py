"""Perceptual image hashing (dHash) + hamming-blocked image near-dup.

The multimodal analog of text simhash: a 64-bit difference hash per
image (row-wise brightness gradients over an area-averaged 9×8 gray
thumbnail — the classic public dHash construction), then the SAME
pigeonhole blocking join as `simhash_blocked_pairs` for near-duplicate
pairs. dHash is robust to re-encoding, mild resizing, and small
brightness shifts — exactly the duplicate classes a scraped-image
corpus carries (same photo at different JPEG qualities / thumbnail
sizes).

Scale shape (100 TB of images): hashing is map-side mapInPandas over
the binaryFile scan (one 64-bit long out per image — the shuffle that
follows carries 16 B/image, not pixels); pair generation is
`hamming_blocked_pairs` — equi-join on (block_idx, block_bits), recall
exactly 1.0 at the hamming bound, never n².
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _area_resize_gray(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic area-mean downsample (box filter over index bins)."""
    h, w = gray.shape
    row_edges = (np.arange(out_h + 1) * h // out_h).astype(int)
    col_edges = (np.arange(out_w + 1) * w // out_w).astype(int)
    out = np.empty((out_h, out_w), dtype=np.float64)
    for r in range(out_h):
        r0, r1 = row_edges[r], max(row_edges[r + 1], row_edges[r] + 1)
        for c in range(out_w):
            c0, c1 = col_edges[c], max(col_edges[c + 1], col_edges[c] + 1)
            out[r, c] = gray[r0:r1, c0:c1].mean()
    return out


def dhash64(pixels: np.ndarray) -> int:
    """64-bit dHash of an image array (h, w) or (h, w, c) uint8:
    area-resize the gray plane to 9×8, emit one bit per horizontal
    neighbor comparison (left > right), row-major, bit 63 first.
    Returned as a SIGNED 64-bit int (Spark LongType two's complement)."""
    a = np.asarray(pixels, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    g = _area_resize_gray(a, 9, 8)
    bits = (g[:, :-1] > g[:, 1:]).reshape(-1)  # 8 rows × 8 comparisons
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def image_dhash(
    df: DataFrame, content_col: str = "content", key_col: str = "image"
) -> DataFrame:
    """Binary image column → (key, width, height, dhash). Decodes via
    the in-repo codecs (`sources/binary.py` registry: ppm/bmp/png/gif/
    lossless-webp/jpeg incl. progressive); map-side only."""
    from social_media_data_pipeline_spark.sources.binary import (
        _PIXEL_DECODERS,
        _sniff_pixel_format,
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, buf in zip(pdf[key_col], pdf[content_col]):
                b = bytes(buf)
                fmt = _sniff_pixel_format(b)
                w, h, c, px = _PIXEL_DECODERS[fmt](b)
                arr = np.asarray(px, dtype=np.uint8).reshape(h, w, c)
                rows.append(
                    {"image": key, "width": w, "height": h, "dhash": dhash64(arr)}
                )
            yield pd.DataFrame(rows, columns=["image", "width", "height", "dhash"])

    schema = T.StructType(
        [
            T.StructField("image", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("dhash", T.LongType()),
        ]
    )
    return df.mapInPandas(_hash, schema)


def image_near_dup_pairs(
    hashes: DataFrame,
    tau: int = 6,
    id_col: str = "image",
    hash_col: str = "dhash",
) -> DataFrame:
    """Near-duplicate image pairs at hamming(dhash) <= tau via the
    pigeonhole blocking join (recall 1.0, equi-join only). `hashes` is
    the `image_dhash` output or any (id, 64-bit hash) table."""
    from pyspark.sql import functions as F

    from social_media_data_pipeline_spark.functions.sketches import (
        hamming_blocked_pairs,
    )

    fp = hashes.select(F.col(id_col).alias("doc"), F.col(hash_col).alias("fp"))
    return hamming_blocked_pairs(fp, tau=tau, bits=64)
