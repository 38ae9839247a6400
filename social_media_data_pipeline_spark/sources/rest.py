"""Incremental REST-shaped sources with checkpointed offsets and retry
state (SURVEY.md §2.1 S5-S8, §2.11; M5).

Three ingestion shapes from the reference, each resumable mid-stream:

- S5 cursor pagination: follow `end_cursor` until `has_more` is false,
  persisting every page + the cursor history
  (`InstagramFeedScraper.py:87-168`). Offset ≙ cursor list.
- S6 chunked time range: split [start, end] into N-day chunks, fetch
  sequentially, `current_chunk` is the offset
  (`CTScraper.py:98-164`, `CTConfig.py:5-9`).
- S7 per-item retry budget: fetch each id, track attempts/successes in
  a state table, re-scan until done or budget exhausted
  (`InstagramPostScraper.py:139-188`, `InstagramImageScraper.py:97-139`).

Architecture: fetching is DRIVER-side (politeness rate limits make
parallel fetch against one API counterproductive — the reference sleeps
1 s/page); pages land as JSON files in a bronze dir; Spark reads bronze
declaratively. HTTP is behind the `HttpClient` protocol — tests use
`OfflineStubClient`, production wires a requests-backed client. State
lives in JSON/parquet next to the bronze dir — the hand-rolled analog of
a Structured Streaming checkpoint, kept explicit because the source is
driver-side.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Any, Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class HttpClient(Protocol):
    def get(self, url: str, params: dict[str, Any]) -> dict:
        """Returns the decoded JSON document; raises on transport error."""
        ...


@dataclass
class OfflineStubClient:
    """Deterministic canned-response client for tests.

    `pages[url]` is the ordered list of documents to serve; `failures[url]`
    makes the first N calls raise, to exercise retry budgets.
    """

    pages: dict[str, list[dict]]
    failures: dict[str, int] = field(default_factory=dict)
    calls: int = 0
    _served: dict[str, int] = field(default_factory=dict)

    def get(self, url: str, params: dict[str, Any]) -> dict:
        self.calls += 1
        if self.failures.get(url, 0) > 0:
            self.failures[url] -= 1
            raise ConnectionError(f"stub failure for {url}")
        i = self._served.get(url, 0)
        docs = self.pages[url]
        self._served[url] = min(i + 1, len(docs) - 1)
        return docs[i]


try:  # optional transport — everything else in this module is stdlib
    import requests as _requests
except ImportError:  # pragma: no cover - baked into the target env
    _requests = None


@dataclass
class RequestsHttpClient:
    """Production `HttpClient`: requests-backed GET with the retry
    envelope of the reference's `InstagramFeedScraper.feed_request`
    (`InstagramFeedScraper.py:87-120`): up to `max_tries` attempts, all
    `requests.exceptions.RequestException` flavors (HTTP status via
    `raise_for_status`, connection, timeout) caught and retried, an
    optional sleep between attempts (the reference sleeps 10 s on an
    empty page), body decoded as UTF-8 JSON. Exhausting the budget
    raises `ConnectionError` — the same exception type
    `OfflineStubClient` uses — so source-level retry budgeting treats
    both clients identically.

    `max_tries` defaults to 1: the sources already own a retry budget
    (`CursorFeedSource.max_tries`, `RetryBudgetSource`), and stacking
    two budgets by default would multiply attempts invisibly. Set it
    >1 only for a bare client used outside a source.
    """

    headers: dict[str, str] = field(default_factory=dict)
    timeout_s: float = 30.0
    max_tries: int = 1
    backoff_s: float = 0.0

    def get(self, url: str, params: dict[str, Any]) -> dict:
        if _requests is None:
            raise RuntimeError("the requests package is not installed")
        last: Exception | None = None
        for attempt in range(self.max_tries):
            try:
                resp = _requests.request(
                    "GET",
                    url,
                    headers=self.headers,
                    params=params,
                    timeout=self.timeout_s,
                )
                resp.raise_for_status()
                return json.loads(resp.content.decode("utf-8"))
            except _requests.exceptions.RequestException as err:
                last = err
                if self.backoff_s and attempt < self.max_tries - 1:
                    time.sleep(self.backoff_s)
        raise ConnectionError(f"GET {url} failed after {self.max_tries} tries: {last}")


def _read_json(path: str, default):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return default


def _write_json(path: str, doc) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, path)


@dataclass
class CursorFeedSource:
    """S5: cursor-paginated feed with retries and persisted offsets.

    State file mirrors the reference's scrape config: cursor history +
    page counter (`InstagramFeedScraper.py:66-74,150-156`); each page is
    persisted BEFORE the cursor advances, so a crash re-fetches at most
    one page (at-least-once into bronze; downstream dedup D2 makes it
    exactly-once, like the reference's `drop_duplicates` after merge).
    """

    client: HttpClient
    url: str
    bronze_dir: str
    max_tries: int = 3
    sleep_s: float = 0.0
    max_pages: int = 10_000

    @property
    def _state_path(self) -> str:
        return os.path.join(self.bronze_dir, "_scrape_state.json")

    def scrape(self) -> dict:
        os.makedirs(self.bronze_dir, exist_ok=True)
        state = _read_json(
            self._state_path, {"cursors": [None], "pages": 0, "done": False}
        )
        while not state["done"] and state["pages"] < self.max_pages:
            cursor = state["cursors"][-1]
            page = self._request_with_retry({"cursor": cursor})
            if page is None:  # retry budget exhausted (`:117-120`)
                break
            page_path = os.path.join(self.bronze_dir, f"page_{state['pages']:06d}.json")
            _write_json(page_path, page)
            state["pages"] += 1
            state["cursors"].append(page.get("end_cursor"))
            state["done"] = not page.get("has_more", False)
            _write_json(self._state_path, state)  # offset persists per page
            if self.sleep_s:
                time.sleep(self.sleep_s)  # politeness (`:163`)
        return state

    def _request_with_retry(self, params: dict) -> dict | None:
        for _ in range(self.max_tries):
            try:
                return self.client.get(self.url, params)
            except Exception:
                continue
        return None

    def to_dataframe(self, spark: SparkSession, item_field: str = "items") -> DataFrame:
        """Bronze pages → one row per item (S3 folder scan + explode)."""
        raw = spark.read.option("multiLine", True).json(
            os.path.join(self.bronze_dir, "page_*.json")
        )
        return raw.select(F.explode(F.col(item_field)).alias("item")).select("item.*")


@dataclass
class ChunkedTimeRangeSource:
    """S6: time-chunked queries with a `current_chunk` offset
    (`CTScraper.py:136-164`). Chunking ≙ manual partition pruning of the
    query space; the chunk table is deterministic from (start, end, days).
    """

    client: HttpClient
    url: str
    bronze_dir: str
    start: datetime
    end: datetime
    chunk_days: int

    @property
    def _state_path(self) -> str:
        return os.path.join(self.bronze_dir, "_chunk_state.json")

    def chunks(self) -> list[tuple[str, str]]:
        out = []
        lo = self.start
        while lo < self.end:
            hi = min(lo + timedelta(days=self.chunk_days), self.end)
            out.append((lo.isoformat(), hi.isoformat()))
            lo = hi
        return out

    def scrape(self) -> dict:
        os.makedirs(self.bronze_dir, exist_ok=True)
        chunks = self.chunks()
        state = _read_json(self._state_path, {"current_chunk": 0})
        while state["current_chunk"] < len(chunks):
            lo, hi = chunks[state["current_chunk"]]
            doc = self.client.get(self.url, {"start": lo, "end": hi})
            _write_json(
                os.path.join(self.bronze_dir, f"chunk_{state['current_chunk']:05d}.json"), doc
            )
            state["current_chunk"] += 1
            _write_json(self._state_path, state)
        return state

    def hit_count(self) -> int:
        """A13: `count=0` probe — source-side aggregate pushdown analog
        (`one_query.py:45-51`)."""
        return int(self.client.get(self.url, {"count": 0}).get("hitCount", 0))

    def to_dataframe(self, spark: SparkSession, item_field: str = "posts") -> DataFrame:
        raw = spark.read.option("multiLine", True).json(
            os.path.join(self.bronze_dir, "chunk_*.json")
        )
        return raw.select(F.explode(F.col(item_field)).alias("item")).select("item.*")


@dataclass
class RetryBudgetSource:
    """S7/S8: per-item fetch with attempt budget, state as a parquet
    table (`InstagramPostScraper.py:139-188` loop; state schema
    `InstagramImageScraper.py:62-69`).

    Each round: undone = state where NOT (done OR attempts>=max) (P10 +
    P11 anti-join semantics); fetch each undone item; increment attempts;
    repeat until nothing undone. Bounded batch loop, not a streaming
    query (SURVEY.md §7.2).
    """

    client: HttpClient
    url_template: str  # e.g. "https://api/post/{item_id}"
    bronze_dir: str
    max_attempts: int = 3

    @property
    def _state_path(self) -> str:
        return os.path.join(self.bronze_dir, "_item_state.json")

    def scrape(self, item_ids: list[str]) -> dict[str, dict]:
        os.makedirs(self.bronze_dir, exist_ok=True)
        state: dict[str, dict] = _read_json(self._state_path, {})
        for item_id in item_ids:
            state.setdefault(item_id, {"scraped": 0, "attempts": 0})
        while True:
            undone = [
                k
                for k, v in state.items()
                if not (v["scraped"] == 1 or v["attempts"] >= self.max_attempts)
            ]
            if not undone:
                break
            for item_id in undone:
                state[item_id]["attempts"] += 1
                try:
                    doc = self.client.get(self.url_template.format(item_id=item_id), {})
                except Exception:
                    continue
                _write_json(os.path.join(self.bronze_dir, f"item_{item_id}.json"), doc)
                state[item_id]["scraped"] = 1
            _write_json(self._state_path, state)
        _write_json(self._state_path, state)
        return state

    def state_dataframe(self, spark: SparkSession) -> DataFrame:
        state = _read_json(self._state_path, {})
        rows = [
            (k, int(v["scraped"]), int(v["attempts"]), self.max_attempts)
            for k, v in sorted(state.items())
        ]
        return spark.createDataFrame(
            rows, "post_id string, image_scraped int, image_attempts int, max_attempts int"
        )

    def status(self, spark: SparkSession) -> DataFrame:
        """A12 status frame (`InstagramImageScraper.py:162-191`)."""
        from social_media_data_pipeline_spark.operators.aggregates import (
            conditional_status_counts,
        )

        df = self.state_dataframe(spark)
        return conditional_status_counts(
            df,
            {
                "n_scraped": F.col("image_scraped") == 1,
                "n_failed": (F.col("image_scraped") == 0)
                & (F.col("image_attempts") >= F.col("max_attempts")),
                "n_pending": (F.col("image_scraped") == 0)
                & (F.col("image_attempts") < F.col("max_attempts")),
            },
        )

    def to_dataframe(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("multiLine", True).json(
            os.path.join(self.bronze_dir, "item_*.json")
        )
