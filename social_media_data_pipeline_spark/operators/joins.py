"""Join operators (SURVEY.md §2.5, J1-J5).

Physical strategy (broadcast vs sort-merge vs shuffled-hash) is left to
Catalyst/AQE; the helpers only add explicit `broadcast()` hints where the
reference's data shape guarantees a small build side (the 365-row scene
hierarchy, 5-row region, 25-row nation).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_small_dim(
    df: DataFrame, dim: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """J1 — equi-join against a small dimension table, broadcast-hinted.

    Reference: `pd.merge(df, df_scene, on="category")`
    (`ImageLabeler.py:169`) — a 365-row dim; at 100 TB the fact side
    never shuffles for this join.
    """
    return df.join(F.broadcast(dim), on, how)


def align_time_series(
    a: DataFrame, b: DataFrame, bucket_col: str, fill: float = 0.0
) -> DataFrame:
    """J2 — full-outer join of two aggregated series on the time bucket,
    missing bins zero-filled (`dualplot_timeseries`,
    `plotting.py:147-152`)."""
    return a.join(b, bucket_col, "full_outer").na.fill(fill)


def anti_join(df: DataFrame, done: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J3/U3 — rows of df with no match in done (`InstagramImageScraper.py:157-160`)."""
    return df.join(done, on, "left_anti")


def semi_join(df: DataFrame, other: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J4 — rows of df WITH a match (membership, no column pickup)."""
    return df.join(other, on, "left_semi")


def explode_post_images(posts: DataFrame, listing: DataFrame) -> DataFrame:
    """J5 — post→image fan-out + existence join.

    Each post contributes its main image plus sidecar album members, then
    only filenames present in `listing` survive (`create_image_df`,
    `InstagramPostScraper.py:350-359`). `posts` must carry `image`
    (string) and `album_images` (array<string>, nullable); `listing` is
    the binaryFile-scan filename table.
    """
    all_images = F.array_union(
        F.array(F.col("image")),
        F.coalesce(F.col("album_images"), F.array().cast("array<string>")),
    )
    exploded = posts.withColumn("image_file", F.explode(all_images)).drop(
        "image", "album_images"
    )
    return exploded.join(
        listing.select(F.col("image_file")).dropDuplicates(["image_file"]),
        "image_file",
        "left_semi",
    )
