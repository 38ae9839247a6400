"""Derived-column scalar expressions (SURVEY.md §2.4, E1-E15).

All built-in Column expressions — whole-stage-codegen'd, no Python in the
hot path. The reference computes these row-at-a-time or via pandas apply
(`Preprocessing/Preprocessor.py:134-158`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def concat_image_name(id_col: str, shortcode_col: str) -> Column:
    """E1 — `image = "{id}_{shortcode}.jpg"` (`Preprocessor.py:138`)."""
    return F.concat_ws("_", F.col(id_col).cast("string"), F.concat(F.col(shortcode_col), F.lit(".jpg")))


def post_url(shortcode_col: str) -> Column:
    """E1 — url build (`InstagramFeedScraper.py:12-13`)."""
    return F.format_string("https://www.instagram.com/p/%s/", F.col(shortcode_col))


def split_part_col(col: str, delim: str, index: int) -> Column:
    """E2 — string split → column (`Preprocessor.py:141-143`)."""
    return F.split(F.col(col), delim).getItem(index)


def with_date_parts(df: DataFrame, ts_col: str) -> DataFrame:
    """E3 — year/month/day convenience columns (`Preprocessor.py:149-151`)."""
    return (
        df.withColumn("year", F.year(F.col(ts_col)))
        .withColumn("month", F.month(F.col(ts_col)))
        .withColumn("day", F.dayofmonth(F.col(ts_col)))
    )


def epoch_to_timestamp(col: str) -> Column:
    """E4 — epoch-seconds → timestamp (`InstagramFeedScraper.py:219`)."""
    return F.timestamp_seconds(F.col(col))


def parse_timestamp(col: str, fmt: str | None = None) -> Column:
    """E5 — string → timestamp (`Preprocessor.py:41` converter)."""
    return F.to_timestamp(F.col(col), fmt) if fmt else F.to_timestamp(F.col(col))


def interactions(likes_col: str, comments_col: str) -> Column:
    """E6 — `interactions = likes + comment_count` (`Preprocessor.py:153`)."""
    return F.col(likes_col) + F.col(comments_col)


def extract_hashtags(text_col: str) -> Column:
    """E7 — `re.findall(r"#(\\w+)", text)` (`Preprocessor.py:54`,
    `InstagramPostScraper.py:308`)."""
    return F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(r"#(\w+)"), F.lit(1)
    )


def lowercase_array(col: str) -> Column:
    """E8 — lowercase every array element (`Preprocessor.py:219-221`)."""
    return F.transform(F.col(col), lambda x: F.lower(x))


def nested_field(path: str, alias: str) -> Column:
    """E10 — nested-struct field extraction, e.g.
    ``statistics.actual.favoriteCount`` → ``likes``
    (`Preprocessor.py:45-51`, `CTExtractors.py:30-45`)."""
    return F.col(path).alias(alias)


def edge_list_to_array(edges_path: str, leaf_path: str) -> Column:
    """E11 — edge-list → array, e.g. tagged users
    (`InstagramPostScraper.py:303-304`)."""
    return F.transform(F.col(edges_path), lambda e: e.getField("node").getField(leaf_path))


def first_element_or_null(arr: Column) -> Column:
    """E12 — `edges[0].node.text` else None
    (`InstagramPostScraper.py:306-311`)."""
    return F.when(F.size(arr) > 0, F.element_at(arr, 1))


def array_join_lines(col: str) -> Column:
    """E13 — `"\\n".join(comments_flat)` (`InstagramPostScraper.py:393-394`)."""
    return F.array_join(F.col(col), "\n")


def conditional_value(cond: Column, then: Column, otherwise: Column) -> Column:
    """E15 — row-wise conditional (`Translator.py:125-139`)."""
    return F.when(cond, then).otherwise(otherwise)


def column_stuff(
    df: DataFrame,
    dataset_name: str,
    ts_col: str = "timestamp",
    final_columns: Sequence[str] | None = None,
) -> DataFrame:
    """The Preprocessor's full derivation block (`Preprocessor.py:134-158`):
    image name (E1), city/building from dataset name (E2), date parts (E3),
    interactions (E6), then the fixed 20-column projection (P1)."""
    city, _, building = dataset_name.partition("_")
    out = (
        df.withColumn("image", concat_image_name("id", "shortcode"))
        .withColumn("city", F.lit(city))
        .withColumn("building", F.lit(building or None))
        .transform(lambda d: with_date_parts(d, ts_col))
        .withColumn("interactions", interactions("likes", "comment_count"))
    )
    if final_columns:
        out = out.select(*final_columns)
    return out
