"""Preprocessor parity: the reference's config-gated filter chain as one
declarative transform (SURVEY.md §7.1 M1).

Reference: `Preprocessing/Preprocessor.py` — `Preprocessor.run`
(`Preprocessor.py:94-132`) applies, in this fixed order, each gated by a
config param: scrape_image flag → column_stuff derivations → dedup →
images_only → year filter → lowercase hashtags → hashtag include →
hashtag exclude → per-year sampling cap. `CTPreprocessor.run`
(`Preprocessor.py:35-58`) is the CrowdTangle variant (nested-struct
extraction + hashtag regex).

The whole chain is lazy — Catalyst fuses every filter into one scan pass
and pushes eligible predicates into the parquet read, where the reference
re-reads and re-materializes CSV per stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from social_media_data_pipeline_spark.operators import dedup, derive, filters, sampling
from social_media_data_pipeline_spark.schemas import POSTS_PREPROCESSED_COLUMNS


@dataclass
class PreprocessParams:
    """Mirrors the reference's config params (`config/test.json:25-36`)."""

    dataset_name: str = "City_Building"
    remove_duplicates: str | None = "shortcode"
    images_only: bool = True
    year_filter: tuple[int, int] | None = (2010, 2020)
    lowercase_hashtags: bool = True
    hashtag_filter_include: list[str] = field(default_factory=list)
    hashtag_filter_exclude: list[str] = field(default_factory=list)
    max_images_per_year: int = -1
    sample_seed: str = "42"


def preprocess_posts(df: DataFrame, params: PreprocessParams) -> DataFrame:
    """Full Preprocessor.run chain (`Preprocessor.py:108-129`), same
    operation order, each step gated exactly like the reference."""
    out = df.withColumn("scrape_image", F.lit(True))  # `Preprocessor.py:110`
    out = derive.column_stuff(out, params.dataset_name)

    if params.remove_duplicates is not None:
        # first-wins on file order in the reference; engine pins the
        # survivor with a deterministic timestamp+id order (SURVEY §7.2)
        out = dedup.dedup_first_wins(
            out, [params.remove_duplicates], [F.col("timestamp"), F.col("id")]
        )
    if params.images_only:
        out = filters.filter_eq(out, "is_video", False)
    if params.year_filter and len(params.year_filter) == 2:
        out = filters.filter_by_year(out, "timestamp", *params.year_filter)
    if params.lowercase_hashtags:
        out = out.withColumn("hashtags", derive.lowercase_array("hashtags"))
    if params.hashtag_filter_include:
        out = filters.filter_array_overlaps(out, "hashtags", params.hashtag_filter_include)
    if params.hashtag_filter_exclude:
        out = filters.filter_array_disjoint(out, "hashtags", params.hashtag_filter_exclude)
    if params.max_images_per_year != -1:
        out = sampling.sample_n_per_group(
            out,
            F.year("timestamp"),
            "id",
            params.max_images_per_year,
            seed=params.sample_seed,
            flag_col="scrape_image",
        )
    return out.select(*POSTS_PREPROCESSED_COLUMNS)


def preprocess_ct_posts(df: DataFrame) -> DataFrame:
    """CTPreprocessor.run (`Preprocessor.py:35-58`): nested-struct field
    extraction (E10) + hashtag regex (E7) — declarative `col("a.b.c")`
    instead of per-row dict lambdas."""
    return df.select(
        "*",
        F.col("statistics.actual.favoriteCount").alias("likes"),
        F.col("statistics.actual.commentCount").alias("comment_count"),
        F.col("statistics.expected.favoriteCount").alias("likes_expected"),
        F.col("statistics.expected.commentCount").alias("comment_count_expected"),
        F.col("account.id").alias("owner_id"),
        derive.extract_hashtags("description").alias("hashtags"),
    )
