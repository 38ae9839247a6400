"""Streaming event processing (SURVEY.md §2.11 mappings).

| reference behavior | here |
|---|---|
| tumbling calendar windows over post time (`plotting.py:50-67`) | `windowed_counts` (event-time window + watermark) |
| dedup-on-natural-key after merge (`InstagramFeedScraper.py:220`) | `dedup_stream` (watermarked dropDuplicates) |
| checkpoint-every-100-rows translation (`Translator.py:121-144`) | `merge_new_rows` foreachBatch idempotent keyed merge |

All helpers operate on a streaming DataFrame; tests drive them with a
parquet-dir source + `Trigger.AvailableNow` (bounded, offline). On a
cluster the same code runs continuously against kafka/files with
checkpointed offsets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based streaming source over a directory of parquet parts.

    `maxFilesPerTrigger` is the ingest throttle — the streaming analog of
    the reference's politeness sleeps (`InstagramFeedScraper.py:163`).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    extra_groups: tuple[str, ...] = (),
) -> DataFrame:
    """Tumbling event-time window + watermark for late data.

    Calendar grains (month/quarter) don't exist as stream windows —
    batch uses `date_trunc` (A1); streams use fixed-duration windows,
    rolled up to calendar grains downstream.
    """
    groups = [F.window(F.col(ts_col), window).alias("win"), *[F.col(c) for c in extra_groups]]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*groups)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *extra_groups,
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame, keys: tuple[str, ...], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exactly-once on a natural key: watermark bounds the
    dedup state so it doesn't grow forever (the batch analog is D2)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))


def merge_new_rows(
    batch_df: DataFrame, output_dir: str, key: str
) -> None:
    """foreachBatch body: idempotent keyed merge into a parquet table —
    rows whose key already exists are skipped (anti-join), so re-run /
    retry never duplicates work. This is the reference's resumable
    translation checkpoint (`Translator.py:121-144`) with the state
    made explicit.
    """
    spark = batch_df.sparkSession
    if os.path.isdir(output_dir) and any(
        f.endswith(".parquet") for f in os.listdir(output_dir)
    ):
        existing = spark.read.parquet(output_dir).select(key)
        fresh = batch_df.join(existing, key, "left_anti")
    else:
        fresh = batch_df
    fresh.write.mode("append").parquet(output_dir)


def run_incremental_merge(
    stream: DataFrame, output_dir: str, checkpoint_dir: str, key: str
) -> None:
    """Checkpointed incremental pipeline: each micro-batch merges only
    unseen keys; offsets in `checkpoint_dir` make restarts resume where
    they left off (S12 scrape-state store, engine-native)."""
    (
        stream.writeStream.foreachBatch(
            lambda df, _epoch: merge_new_rows(df, output_dir, key)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_paced_merge(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    key: str,
    interval: str = "500 milliseconds",
    idle_triggers: int = 2,
    timeout_sec: float = 120.0,
) -> int:
    """ST5 throttled continuous ingest: `Trigger.ProcessingTime` paces
    micro-batches at `interval` — the engine-native form of the
    reference's request pacing (`InstagramFeedScraper.py:163` sleeps
    between feed pages); `maxFilesPerTrigger` on the reader is the
    batch-size knob (`read_event_stream`).

    Unlike AvailableNow the query never self-terminates, so this
    wrapper watches progress and stops after `idle_triggers`
    consecutive empty micro-batches (source drained) or `timeout_sec`.
    Each batch merges idempotently via `merge_new_rows`. Returns the
    number of non-empty micro-batches processed — callers can assert
    the pacing actually split the work.
    """
    import time

    q = (
        stream.writeStream.foreachBatch(
            lambda df, _epoch: merge_new_rows(df, output_dir, key)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=interval)
        .start()
    )
    deadline = time.time() + timeout_sec
    idle = 0
    non_empty = 0
    last_batch_id = -1
    try:
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["batchId"] != last_batch_id:
                last_batch_id = p["batchId"]
                if p["numInputRows"] == 0:
                    idle += 1
                    if idle >= idle_triggers:
                        break
                else:
                    idle = 0
                    non_empty += 1
            time.sleep(0.05)
    finally:
        q.stop()
        q.awaitTermination(30)
    return non_empty


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tie_break: str | None = None,
) -> DataFrame:
    """Session windows, batch formulation: a session breaks when the gap
    to the previous event exceeds `gap_minutes` (lag + running sum of
    break flags). SQL-expressible → oracle-checkable; the streaming
    equivalent is `F.session_window(ts, gap)`.

    `tie_break`: extra unique order column for deterministic session ids
    when a user has simultaneous events.
    """
    from pyspark.sql.window import Window

    order = [ts_col] + ([tie_break] if tie_break else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    # cast through LTZ: TIMESTAMP_NTZ has no direct long cast (UTC session)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    return (
        events.withColumn(
            "is_new_session",
            F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("is_new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .drop("is_new_session")
    )


def sessionize_bounded(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tie_break: str | None = None,
    chunk_hours: int = 24,
) -> DataFrame:
    """Skew-tolerant sessionize — IDENTICAL output to `sessionize`, but
    no per-user task is ever larger than one (user, time-chunk) slice.

    `sessionize` windows on the bare user key, so a power-law user (1%
    of a 100 TB event log on one id) collapses onto a single task —
    and AQE cannot split a window partition the way it splits skewed
    join partitions. This formulation exploits session semantics: a
    session never spans a quiet gap, so sessions computed inside fixed
    time chunks are exact except at chunk boundaries, where the chain
    is repaired from per-chunk SUMMARIES (first/last event epoch +
    local session count — one row per (user, nonempty chunk), bounded
    by calendar size, not event count):

      merged(c)   = boundary gap to the user's previous nonempty chunk
                    <= gap  (lag over the summary table)
      offset(c)   = running sum of (n_sessions - merged) over chunks
      session_id  = offset(prev chunks) + local_id - merged(c)

    Cost: the big table shuffles ONCE on (user, chunk) — same order as
    `sessionize`'s user shuffle but with bounded partitions; the
    summary pass and its window are calendar-sized; the repair map
    joins back on (user, chunk), AQE-splittable. `chunk_hours` must be
    >= the session gap so a session can span at most one boundary per
    chunk transition (enforced).
    """
    from pyspark.sql.window import Window

    gap_s = gap_minutes * 60
    if chunk_hours * 3600 < gap_s:
        raise ValueError(
            f"chunk_hours ({chunk_hours}) must cover the session gap "
            f"({gap_minutes} min) so sessions span at most one boundary"
        )
    order = [ts_col] + ([tie_break] if tie_break else [])
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    chunked = events.withColumn("__epoch", epoch).withColumn(
        # floor, not cast-truncate: pre-1970 epochs are negative
        "__chunk", F.floor(F.col("__epoch") / (chunk_hours * 3600)).cast("bigint")
    )
    w_local = Window.partitionBy(user_col, "__chunk").orderBy(*order)
    local_gap = F.col("__epoch") - F.lag("__epoch").over(w_local)
    local = chunked.withColumn(
        "__new", F.when(local_gap.isNull() | (local_gap > gap_s), 1).otherwise(0)
    ).withColumn(
        "__local_id",
        F.sum("__new").over(
            w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    summ = local.groupBy(user_col, "__chunk").agg(
        F.min("__epoch").alias("__first"),
        F.max("__epoch").alias("__last"),
        F.max("__local_id").alias("__n_sessions"),
    )
    w_user = Window.partitionBy(user_col).orderBy("__chunk")
    prev_last = F.lag("__last").over(w_user)
    summ = summ.withColumn(
        "__merged",
        F.when(
            prev_last.isNotNull() & ((F.col("__first") - prev_last) <= gap_s), 1
        ).otherwise(0),
    ).withColumn(
        "__cum",
        F.sum(F.col("__n_sessions") - F.col("__merged")).over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    repair = summ.select(
        user_col,
        "__chunk",
        (F.col("__cum") - (F.col("__n_sessions") - F.col("__merged"))).alias(
            "__offset"
        ),
        "__merged",
    )
    return (
        local.join(repair, [user_col, "__chunk"])
        .withColumn(
            "session_id",
            F.col("__offset") + F.col("__local_id") - F.col("__merged"),
        )
        .drop("__epoch", "__chunk", "__new", "__local_id", "__offset", "__merged")
    )


def session_window_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """True streaming session windows (stateful, watermark-bounded)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
        )
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against
    the CURRENT static side (re-read per batch for file sources), the
    streaming analog of the batch broadcast dim join (J1). The static
    side is explicitly broadcast — per-batch hash join with no shuffle
    of the stream; stateless, so no watermark is needed.
    """
    from pyspark.sql.functions import broadcast

    return stream.join(broadcast(dim), on, how)


def join_streams_within(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: pairs rows sharing `on` whose event
    times are within `within` of each other (right at-or-after left —
    click→purchase attribution shape).

    Both sides carry watermarks and the join predicate bounds the time
    skew, so Spark can expire buffered state: without BOTH conditions a
    stream-stream join's state grows forever. State size ≈ each side's
    (watermark + within) window of data, partitioned by the equi key.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[on])
