"""Deduplication operators (SURVEY.md §2.3 D1/D2 + LLM-pipeline near-dup).

Exact dedup comes in two flavors:

- `dedup_arbitrary` — Spark's `dropDuplicates`: ONE row per key, any row.
  Cheapest (hash-aggregate, map-side partial) — use when the survivor
  doesn't matter.
- `dedup_first_wins` — deterministic survivor via a window. The reference's
  `drop_duplicates` keeps the first row in FILE order
  (`Preprocessor.py:161-167`, `InstagramFeedScraper.py:220`); file order is
  meaningless on a distributed engine, so the engine requires an explicit
  `order_by` tie-break — same contract, deterministic everywhere.

Scale note (100 TB): all variants are single-shuffle on the dedup key.
For heavily-skewed keys enable AQE skew handling (on by default in
`session.get_spark`); for repeated dedups of the same table, bucket the
table by the key to make the shuffle disappear.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_arbitrary(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """D1/D2 when survivor choice is free: `dropDuplicates(keys)`."""
    return df.dropDuplicates(list(keys))


def dedup_first_wins(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """D1/D2 with a deterministic survivor: first row per key under
    `order_by`.

    Reference: first-wins `drop_duplicates(subset=["shortcode"])`
    (`Preprocessor.py:161-167`); `(id, shortcode)` composite at
    `InstagramFeedScraper.py:220`.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact_content(
    df: DataFrame,
    content_col: str,
    id_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Exact content dedup for document corpora: hash-groupBy on the text
    digest, keep the smallest id (deterministic).

    LLM-pipeline extension (BASELINE.json north_star): at 100 TB the
    digest (128-bit md5) is grouped instead of the raw text, so the
    shuffle carries 16 bytes + id per row, not documents.
    """
    text = F.col(content_col)
    if normalize:
        text = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    digest = F.md5(text)
    w = Window.partitionBy(digest).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
