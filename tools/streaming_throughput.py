"""Structured-Streaming throughput: measure the micro-batch pipeline
end-to-end — sf0.1 events fed through a file stream, per-batch
windowed aggregation + HLL sketch build via foreachBatch (the
streaming rollup contract the tests pin), wall-clock and rows/s
reported per shard count.

Mirrors tools/ingest_throughput.py for the streaming surface: the
claims in COVERAGE's §2.11 rows get a measured number, not just green
tests. The shard count is the micro-batch count (maxFilesPerTrigger=1),
so the sweep shows per-batch overhead amortizing — the number that
matters for sizing trigger intervals at scale.

Usage: python tools/streaming_throughput.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from social_media_data_pipeline_spark import io as eio  # noqa: E402
from social_media_data_pipeline_spark.functions import sketches  # noqa: E402
from social_media_data_pipeline_spark.session import get_spark  # noqa: E402

SCRATCH = os.path.join(REPO, "spark-warehouse", "streaming_throughput")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("streaming-throughput")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    ev = eio.read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    n = ev.count()
    print(f"{'shards':>7} {'rows':>8} {'wall s':>7} {'rows/s':>9} {'s/batch':>8}")
    for shards in (4, 8, 16):
        src = os.path.join(SCRATCH, f"src_{shards}")
        sink = os.path.join(SCRATCH, f"sink_{shards}")
        # plain repartition(n) is round-robin → exactly n part files
        ev.repartition(shards).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/part-*")
        )

        def agg_batch(batch_df, batch_id, sink=sink):
            out = (
                batch_df.groupBy(
                    F.window("ts", "1 day").alias("w"), "event_type"
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .select("event_type", "n")
            )
            sketch = sketches.hll_build(batch_df, ["event_type"], "user_id", p=8)
            out.write.mode("append").parquet(sink + "_counts")
            sketch.write.mode("append").parquet(sink + "_hll")

        t0 = time.time()
        q = (
            stream.writeStream.foreachBatch(agg_batch)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        # batches = parquet part files in src (maxFilesPerTrigger=1)
        n_files = len([f for f in os.listdir(src) if f.startswith("part-")])
        print(
            f"{n_files:>7} {n:>8} {dt:>7.2f} {n / dt:>9.0f} {dt / n_files:>8.2f}"
        )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
