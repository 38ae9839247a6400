"""Custom Python DataSource tests: batch partition-per-page reads and
streaming offset-tracked tailing of the bronze dir."""

from __future__ import annotations

import json

import pytest

from social_media_data_pipeline_spark.sources.feed_datasource import FeedPagesDataSource


def write_page(d, idx, items):
    (d / f"page_{idx:06d}.json").write_text(
        json.dumps({"items": items, "end_cursor": f"c{idx}", "has_more": True})
    )


@pytest.fixture()
def bronze(tmp_path):
    d = tmp_path / "bronze"
    d.mkdir()
    write_page(d, 0, [{"id": "1", "shortcode": "a", "likes": 5}])
    write_page(d, 1, [{"id": "2", "shortcode": "b", "likes": 6}, {"id": "3", "shortcode": "c", "likes": 7}])
    return d


class TestFeedDataSource:
    def test_batch_read_partition_per_page(self, spark, bronze):
        spark.dataSource.register(FeedPagesDataSource)
        df = spark.read.format("feed_pages").option("path", str(bronze)).load()
        rows = {r.id: r for r in df.collect()}
        assert set(rows) == {"1", "2", "3"}
        assert rows["3"].page_idx == 1 and rows["1"].page_idx == 0
        assert df.rdd.getNumPartitions() == 2  # one partition per page file

    def test_stream_read_resumes_on_new_pages(self, spark, bronze, tmp_path):
        spark.dataSource.register(FeedPagesDataSource)
        sink = str(tmp_path / "sink")
        ck = str(tmp_path / "ck")

        def drain():
            stream = spark.readStream.format("feed_pages").option("path", str(bronze)).load()
            q = (
                stream.writeStream.foreachBatch(
                    lambda df, _e: df.write.mode("append").parquet(sink)
                )
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        drain()
        assert spark.read.parquet(sink).count() == 3
        # a new page lands; restart consumes ONLY the new offset range
        write_page(bronze, 2, [{"id": "9", "shortcode": "z", "likes": 1}])
        drain()
        out = spark.read.parquet(sink)
        assert out.count() == 4  # no reprocessing of pages 0-1
        assert out.filter("id = '9'").count() == 1
