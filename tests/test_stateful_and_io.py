"""Tests: stateful streaming operators, grouped UDAF, CSV adapter IO,
observable filter metrics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from social_media_data_pipeline_spark import io as eio
from social_media_data_pipeline_spark.operators import filters
from social_media_data_pipeline_spark.operators.grouped_udaf import (
    engagement_concentration,
)
from social_media_data_pipeline_spark.streaming import stateful

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


class TestStateful:
    def test_running_user_totals_accumulates_across_batches(self, spark, tmp_path):
        src = str(tmp_path / "src")
        sink = str(tmp_path / "sink")
        ck = str(tmp_path / "ck")
        t0 = dt.datetime(2024, 1, 1, 10)

        def run_query():
            # foreachBatch sink: checkpoint-recoverable (memory sink isn't),
            # so engine state survives query restarts
            stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
            out = stateful.running_user_totals(stream)
            q = (
                out.writeStream.foreachBatch(
                    lambda df, epoch: df.write.mode("append").parquet(sink)
                )
                .outputMode("update")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        batch1 = [(1, t0, 10, "c", 1.0), (2, t0, 10, "c", 2.0), (3, t0, 20, "v", 5.0)]
        spark.createDataFrame(batch1, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)
        run_query()
        latest = {
            r.user_id: r
            for r in spark.read.parquet(sink).orderBy("n_events").collect()
        }
        assert latest[10].n_events == 2 and latest[10].total_value == 3.0
        assert latest[20].n_events == 1 and latest[20].total_value == 5.0

        # second batch arrives; restart from the same checkpoint —
        # engine-managed state carries the previous totals forward
        batch2 = [(4, t0, 10, "c", 4.0)]
        spark.createDataFrame(batch2, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)
        run_query()
        rows = spark.read.parquet(sink).filter("user_id = 10").collect()
        assert max(r.n_events for r in rows) == 3
        assert max(r.total_value for r in rows) == 7.0

    def test_attempt_budget_state(self, spark, tmp_path):
        src = str(tmp_path / "attempts")
        rows = [("a", False), ("a", True), ("b", False)]
        spark.createDataFrame(rows, "item_id string, ok boolean").coalesce(1).write.parquet(src)
        stream = spark.readStream.schema("item_id string, ok boolean").parquet(src)
        out = stateful.attempt_budget_state(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("attempts")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {r.item_id: r for r in spark.sql("select * from attempts").collect()}
        assert got["a"].attempts == 2 and got["a"].succeeded is True
        assert got["b"].attempts == 1 and got["b"].succeeded is False


class TestGroupedUdaf:
    def test_gini_uniform_vs_concentrated(self, spark):
        rows = [("u", 10.0)] * 4 + [("c", 0.0), ("c", 0.0), ("c", 0.0), ("c", 100.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r.g: r.gini for r in engagement_concentration(df, "g", "v").collect()}
        assert out["u"] == 0.0
        assert out["c"] > 0.7


class TestCsvAdapter:
    def test_reference_csv_roundtrip(self, spark, tmp_path):
        schema = T.StructType(
            [
                T.StructField("id", T.StringType()),
                T.StructField("hashtags", T.ArrayType(T.StringType())),
                T.StructField("timestamp", T.TimestampType()),
                T.StructField("likes", T.LongType()),
            ]
        )
        # reference-style CSV: python-list strings + iso timestamps
        csv_dir = tmp_path / "csv"
        csv_dir.mkdir()
        (csv_dir / "part.csv").write_text(
            "id,hashtags,timestamp,likes\n"
            "1,\"['Art', 'museum']\",2020-05-01 10:00:00,42\n"
            "2,\"[]\",2021-01-02 00:00:00,7\n"
        )
        df = eio.read_csv_with_arrays(
            spark,
            str(csv_dir),
            schema,
            array_cols=("hashtags",),
            timestamp_cols=("timestamp",),
        )
        rows = {r.id: r for r in df.collect()}
        assert list(rows["1"].hashtags) == ["Art", "museum"]
        assert rows["2"].hashtags == []
        assert rows["1"].timestamp == dt.datetime(2020, 5, 1, 10)
        assert rows["1"].likes == 42

    def test_write_stage_output_csv_stringifies_arrays(self, spark, tmp_path):
        df = spark.createDataFrame([("1", ["a", "b"])], "id string, tags array<string>")
        out = str(tmp_path / "out_csv")
        eio.write_stage_output(df, out, fmt="csv")
        back = spark.read.option("header", True).csv(out).collect()[0]
        assert back.tags == '["a","b"]'

    def test_write_stage_output_orc_and_json_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("1", ["a", "b"], 42)], "id string, tags array<string>, n long"
        )
        for fmt in ("orc", "json"):
            out = str(tmp_path / f"out_{fmt}")
            eio.write_stage_output(df, out, fmt=fmt)
            back = spark.read.format(fmt).load(out).collect()[0]
            assert (back.id, list(back.tags), back.n) == ("1", ["a", "b"], 42)


class TestObserve:
    def test_apply_filter_observed_counts(self, spark):
        df = spark.createDataFrame([(i,) for i in range(10)], "x int")
        out = filters.apply_filter_observed(
            df, lambda d: d.filter(F.col("x") < 3), "xfilter"
        )
        assert out.count() == 3  # transform applied; metrics ride along


def test_transform_with_state_running_totals(spark, tmp_path):
    """Spark 4 StatefulProcessor path — skipped where the TWS Python
    runner's protobuf dependency is absent (container boundary; the
    applyInPandasWithState equivalent above is always exercised)."""
    import pytest as _pytest

    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        _pytest.skip("protobuf not installed: TWS python runner unavailable")
    from social_media_data_pipeline_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    src = str(tmp_path / "tws_src")
    spark.createDataFrame(
        [(1, 10, 1.5), (2, 10, 2.0), (3, 11, 3.0)],
        "event_id long, user_id long, value double",
    ).write.mode("overwrite").parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(
            "event_id long, user_id long, value double"
        ).parquet(src)
        q = (
            running_user_totals_tws(stream)
            .writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
            .start()
        )
        q.awaitTermination()
        rows = {
            r.user_id: (r.n_events, r.total_value)
            for r in spark.sql("select * from tws_totals").collect()
        }
        assert rows == {10: (2, 3.5), 11: (1, 3.0)}
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


class TestJsonQuarantine:
    def test_valid_and_corrupt_split(self, spark, tmp_path):
        from social_media_data_pipeline_spark.io import read_json_with_quarantine

        p = tmp_path / "feed.jsonl"
        p.write_text(
            '{"id": 1, "name": "ok"}\n'
            '{"id": 2, "name": "also ok"}\n'
            'this is not json at all\n'
            '{"id": "not-an-int", "name": "type clash"}\n'
            '{"id": 3, "name": "fine"}\n'
        )
        valid, corrupt = read_json_with_quarantine(
            spark, str(p), "id long, name string"
        )
        ids = sorted(r["id"] for r in valid.collect())
        assert ids == [1, 2, 3]
        raws = [r["raw"] for r in corrupt.collect()]
        assert len(raws) == 2
        assert any("not json" in r for r in raws)
        assert any("not-an-int" in r for r in raws)

    def test_quarantine_sink_written(self, spark, tmp_path):
        from social_media_data_pipeline_spark.io import read_json_with_quarantine

        p = tmp_path / "feed.jsonl"
        p.write_text('{"id": 1}\nbroken line\n')
        qdir = str(tmp_path / "quarantine")
        valid, corrupt = read_json_with_quarantine(
            spark, str(p), "id long", quarantine_path=qdir
        )
        assert valid.count() == 1
        stored = spark.read.parquet(qdir).collect()
        assert len(stored) == 1 and "broken" in stored[0]["raw"]

    def test_csv_twin_splits(self, spark, tmp_path):
        from social_media_data_pipeline_spark.io import read_csv_with_quarantine

        p = tmp_path / "feed.csv"
        p.write_text("id,name\n1,ok\nnot-an-int,bad\n3,fine\n")
        valid, corrupt = read_csv_with_quarantine(
            spark, str(p), "id long, name string"
        )
        assert sorted(r["id"] for r in valid.collect()) == [1, 3]
        raws = [r["raw"] for r in corrupt.collect()]
        assert len(raws) == 1 and "not-an-int" in raws[0]
