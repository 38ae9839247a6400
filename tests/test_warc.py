"""Tests: WARC web-archive source (`sources/warc.py`) — record framing,
gzip member splitting, HTTP response split, truncation reporting, the
Spark reader, and composition with the text-quality chain."""

from __future__ import annotations

import pytest

from social_media_data_pipeline_spark.sources import warc


def _archive(gz=False):
    recs = [
        {
            "warc_type": "warcinfo",
            "payload": b"software: test-harness\r\n",
        },
        {
            "warc_type": "response",
            "url": "https://example.com/a",
            "payload": warc.build_http_response(
                b"<html>hello world this is page A</html>"
            ),
        },
        {
            "warc_type": "request",
            "url": "https://example.com/a",
            "payload": b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
        },
        {
            "warc_type": "response",
            "url": "https://example.com/b",
            "payload": warc.build_http_response(
                b"plain text document b", content_type="text/plain"
            ),
        },
    ]
    return warc.build_warc(recs, gzip_members=gz)


class TestWarcParsing:
    @pytest.mark.parametrize("gz", [False, True])
    def test_record_walk(self, gz):
        recs = list(warc.parse_warc_records(_archive(gz)))
        assert [r["headers"]["warc-type"] for r in recs] == [
            "warcinfo",
            "response",
            "request",
            "response",
        ]
        assert recs[1]["headers"]["warc-target-uri"] == "https://example.com/a"

    def test_http_split(self):
        status, headers, body = warc.split_http_response(
            warc.build_http_response(b"xyz", status=404, content_type="text/plain")
        )
        assert status == 404
        assert headers["content-type"] == "text/plain"
        assert body == b"xyz"

    def test_non_http_payload_passthrough(self):
        s, h, b = warc.split_http_response(b"not http at all")
        assert s is None and h == {} and b == b"not http at all"

    def test_truncated_record_reported(self):
        data = _archive()
        with pytest.raises(ValueError, match="truncated"):
            list(warc.parse_warc_records(data[:-30]))

    def test_bad_version_reported(self):
        with pytest.raises(ValueError, match="version"):
            list(warc.parse_warc_records(b"NOTWARC/1.0\r\n\r\n"))


class TestWarcReader:
    def test_responses_only_with_http_split(self, spark, tmp_path):
        (tmp_path / "shard0.warc").write_bytes(_archive(gz=False))
        (tmp_path / "shard1.warc.gz").write_bytes(_archive(gz=True))
        df = warc.read_warc(spark, str(tmp_path))
        rows = df.collect()
        assert len(rows) == 4  # 2 responses per shard
        assert {r["warc_type"] for r in rows} == {"response"}
        by_url = {}
        for r in rows:
            by_url.setdefault(r["url"], []).append(r)
        assert bytes(by_url["https://example.com/b"][0]["body"]) == b"plain text document b"
        assert by_url["https://example.com/a"][0]["http_status"] == 200
        assert by_url["https://example.com/b"][0]["content_type"] == "text/plain"

    def test_composes_with_quality_chain(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from social_media_data_pipeline_spark.functions import text as etext

        (tmp_path / "s.warc").write_bytes(_archive())
        docs = (
            warc.read_warc(spark, str(tmp_path))
            .filter(F.col("content_type").startswith("text/"))
            .select(
                F.col("url").alias("doc_id"),
                F.decode(F.col("body"), "utf-8").alias("text"),
            )
        )
        scored = docs.withColumn("n_tokens", etext.token_count("text"))
        got = {r["doc_id"]: r["n_tokens"] for r in scored.collect()}
        assert got["https://example.com/b"] == 4
