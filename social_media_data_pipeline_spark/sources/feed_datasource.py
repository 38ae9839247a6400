"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`) for the
feed-scrape bronze layer — SURVEY.md S5's "clean option".

`CursorFeedSource` lands raw pages (driver-side, rate-limited); this
DataSource exposes the landed bronze as a first-class `spark.read`
format with one input partition PER PAGE FILE, so extraction
parallelizes across executors without a manual union loop:

    spark.dataSource.register(FeedPagesDataSource)
    df = (spark.read.format("feed_pages")
          .option("path", bronze_dir)
          .load())

Also ships a streaming reader: `spark.readStream.format("feed_pages")`
tails the bronze dir page-by-page with offsets = page index — the
engine-native version of the reference's cursor-list resume
(`InstagramFeedScraper.py:66-74`).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

PAGE_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("shortcode", T.StringType()),
        T.StructField("likes", T.LongType()),
        T.StructField("page_idx", T.IntegerType()),
    ]
)


class FeedPagePartition(InputPartition):
    def __init__(self, path: str, page_idx: int):
        self.path = path
        self.page_idx = page_idx


def _page_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "page_*.json")))


def _read_page(path: str, page_idx: int) -> Iterator[tuple]:
    with open(path) as f:
        page = json.load(f)
    for item in page.get("items", []):
        yield (
            item.get("id"),
            item.get("shortcode"),
            item.get("likes"),
            page_idx,
        )


class FeedPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self) -> list[InputPartition]:
        return [FeedPagePartition(p, i) for i, p in enumerate(_page_files(self.path))]

    def read(self, partition: FeedPagePartition) -> Iterator[tuple]:
        yield from _read_page(partition.path, partition.page_idx)


class FeedPagesStreamReader(DataSourceStreamReader):
    """Offsets = number of pages consumed; each micro-batch reads the
    newly-landed page files (cursor-resume semantics, engine-managed)."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {"page": 0}

    def latestOffset(self) -> dict:
        return {"page": len(_page_files(self.path))}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        files = _page_files(self.path)
        return [FeedPagePartition(files[i], i) for i in range(start["page"], end["page"])]

    def read(self, partition: FeedPagePartition) -> Iterator[tuple]:
        yield from _read_page(partition.path, partition.page_idx)

    def commit(self, end: dict) -> None:
        pass  # offsets tracked by the engine's checkpoint


class FeedPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "feed_pages"

    def schema(self) -> T.StructType:
        return PAGE_ITEM_SCHEMA

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return FeedPagesReader(self.options)

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return FeedPagesStreamReader(self.options)
