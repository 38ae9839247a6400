"""SparkSession factory with engine defaults.

The reference pipeline (solfang/Social-Media-Data-Pipeline) is a
single-process pandas ETL with no session/config concept; this module is
the Spark-native replacement: one place that pins UTC timestamps
(reference epoch-seconds are UTC, `InstagramFeedScraper.py:219`), enables
AQE + Arrow, and sizes shuffle partitions for the local harness while
staying cluster-safe (AQE coalesces at runtime on a real cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "social_media_data_pipeline_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Defaults are chosen for correctness-portability between local[...]
    testing and a large cluster:

    - UTC session timezone: deterministic event-time semantics.
    - AQE on: runtime coalescing, skew-join splitting — the scale path.
    - Arrow on: every pandas_udf / toPandas crosses via Arrow batches.
    - shuffle.partitions: matches local cores here; on a cluster this is
      a floor — AQE re-plans the real number per stage.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_IN_DRIVER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        builder = builder.master(f"local[{cpus}]")
    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": DEFAULT_SHUFFLE_PARTITIONS,
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # zstd over the snappy default: measured at sf0.1 (SCALING.md
        # r8 codec study) 20% smaller files than snappy at identical
        # scan time and lz4-class write speed — at 100 TB the scan tax
        # is bytes, and zstd buys gzip's ratio without gzip's CPU
        "spark.sql.parquet.compression.codec": "zstd",
        # reference timestamps are naive-UTC; keep parquet NTZ inference on
        "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
        # harness events.parquet stores TIMESTAMP(NANOS) which Spark's
        # vectorized reader rejects; read as long and convert (values are
        # µs-aligned, so timestamp_micros(ns/1000) is lossless)
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
