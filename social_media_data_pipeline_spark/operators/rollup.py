"""Incrementally-maintained materialized rollup (algebraic IVM).

The daily dashboard queries (`events_daily`, `events_weekly_by_type` —
reference analog: `plotting.py:50-67` recomputes its groupbys from the
full frame every run) re-scan all of history per refresh. At 100 TB the
production shape is incremental view maintenance: keep a MATERIALIZED
per-(day, type) state table of mergeable partial aggregates and fold
each new batch into it — per-refresh cost ∝ the batch plus the touched
state rows, never history (Gray et al. 1996's algebraic-aggregate
classification is exactly what makes this sound: COUNT/SUM/MIN/MAX
state is a commutative monoid, AVG derives at read time).

Exactness: `value` is a double, and float sums are order-dependent —
a merged state could drift from a single-shot recompute past the
rounding the oracles tolerate. The state therefore carries integer
MICRO-UNITS (round(value·1e6) as bigint — the repo-wide exact-replay
pattern from PageRank/RRF/PPR), so merge order cannot change a bit and
the chunked-replay query is hash-identical to the one-shot SQL oracle.

Storage: the state table lives under a `scale` manifest and mutates
through `selective_upsert` keyed on `rollup_key` (day|type) — footer
key ranges pick the rewrite set, so a batch touching yesterday
rewrites yesterday's file, not the multi-year table (cluster the
store by key via the upsert's natural append pattern and the rewrite
set stays ~touched-days-sized). First batch bootstraps with a plain
write; the first upsert adopts the manifest-less directory — the
`streaming/curation.py:161` convention.

The monoid state also makes the rollup a drop-in foreachBatch body
(`rollup_stream_batch`): Structured Streaming's own incremental agg
keeps state in the checkpoint, private to one query — this store is a
TABLE other queries read, survives checkpoint loss, and merges exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .aggregates import time_bucket

#: micro-unit scale for exact (order-independent) value accumulation
_SCALE = 1_000_000

_STATE_SCHEMA = (
    "rollup_key bigint, day timestamp, event_type string, "
    "n bigint, sum_micro bigint, min_micro bigint, max_micro bigint"
)


def rollup_partial(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """One map-side-combinable aggregate → the batch's partial state:
    (rollup_key, day, event_type, n, sum_micro, min_micro, max_micro).
    NULL values are excluded from every measure (COUNT(value)
    semantics, matching `events_daily`)."""
    micro = F.round(F.col(value_col) * _SCALE).cast("bigint")
    day = time_bucket(ts_col, "D")
    return (
        events.filter(F.col(value_col).isNotNull())
        .select(
            day.alias("day"),
            F.col(type_col).alias("event_type"),
            micro.alias("__m"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__m").alias("sum_micro"),
            F.min("__m").alias("min_micro"),
            F.max("__m").alias("max_micro"),
        )
        .select(
            # numeric surrogate key — selective_upsert's footer-range
            # pruning needs a numeric column. A (vanishingly unlikely)
            # xxhash64 collision between two (day, type) groups is
            # still CORRECT: the merge groups by the full logical key
            # and the colliding row is rewritten verbatim — it only
            # costs one extra row in the rewrite set.
            F.xxhash64(
                F.concat_ws(
                    "|", F.date_format("day", "yyyy-MM-dd"), "event_type"
                )
            ).alias("rollup_key"),
            "day",
            "event_type",
            "n",
            "sum_micro",
            "min_micro",
            "max_micro",
        )
    )


def rollup_merge(old: DataFrame, batch: DataFrame) -> DataFrame:
    """Monoid merge of two state frames: counts and sums add, min/max
    combine — commutative and associative, so ANY batch arrival order
    produces the same state as a single-shot aggregate."""
    return (
        old.unionByName(batch)
        .groupBy("rollup_key", "day", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_micro").alias("sum_micro"),
            F.min("min_micro").alias("min_micro"),
            F.max("max_micro").alias("max_micro"),
        )
    )


def rollup_finalize(state: DataFrame) -> DataFrame:
    """Read-time derivation → (day, event_type, n_events, sum_value,
    min_value, max_value, avg_value): exact micro-units scale back to
    value units; avg divides the exact sum by the exact count, rounded
    to 6 dp (one division per group — the single float op, same rule
    as the drift/fertility monitors)."""
    return state.select(
        "day",
        "event_type",
        F.col("n").alias("n_events"),
        (F.col("sum_micro") / _SCALE).alias("sum_value"),
        (F.col("min_micro") / _SCALE).alias("min_value"),
        (F.col("max_micro") / _SCALE).alias("max_value"),
        F.round(F.col("sum_micro") / F.col("n") / _SCALE, 6).alias("avg_value"),
    )


def incremental_rollup_batch(batch: DataFrame, store_path: str) -> dict:
    """Fold one batch into the materialized state table at
    `store_path`: batch partial aggregate → merge with the AFFECTED
    existing state rows only (semi-join on rollup_key — the untouched
    history never enters the job) → `selective_upsert` rewrites only
    the files whose key range overlaps the touched keys. Returns
    {"rows_batch", "keys_touched"} plus the upsert's file stats
    ("files_total"/"files_rewritten"/"rows_written") once the store
    exists. An empty batch is a no-op (no commit, no state churn — the
    band-store lesson)."""
    from social_media_data_pipeline_spark import scale

    spark = batch.sparkSession
    partial = rollup_partial(batch).localCheckpoint(eager=True)
    keys_touched = partial.count()
    if keys_touched == 0:
        return {"rows_batch": 0, "keys_touched": 0}
    have_store = bool(scale.read_table_manifest(store_path)) or (
        os.path.isdir(store_path)
        and any(f.endswith(".parquet") for f in os.listdir(store_path))
    )
    stats: dict = {}
    if have_store:
        existing = spark.read.schema(_STATE_SCHEMA).parquet(store_path) \
            if not scale.read_table_manifest(store_path) \
            else scale.manifest_read(spark, store_path)
        affected = existing.join(
            partial.select("rollup_key"), "rollup_key", "left_semi"
        )
        merged = rollup_merge(affected, partial)
        stats = scale.selective_upsert(spark, store_path, merged, "rollup_key")
    else:
        # bootstrap: plain write; the first upsert adopts the
        # manifest-less directory (streaming/curation.py convention)
        partial.write.mode("overwrite").parquet(store_path)
    return {
        "rows_batch": batch.count(),
        "keys_touched": keys_touched,
        **stats,
    }


def read_rollup(spark: SparkSession, store_path: str) -> DataFrame:
    """The finalized rollup view over the committed state table."""
    from social_media_data_pipeline_spark import scale

    if scale.read_table_manifest(store_path):
        state = scale.manifest_read(spark, store_path)
    else:
        state = spark.read.schema(_STATE_SCHEMA).parquet(store_path)
    return rollup_finalize(state)


def rollup_stream_batch(store_path: str):
    """foreachBatch adapter: `writeStream.foreachBatch(
    rollup_stream_batch(store))` — each micro-batch folds into the
    same manifest-committed state table the batch path maintains."""

    def _fn(batch: DataFrame, _batch_id: int) -> None:
        incremental_rollup_batch(batch, store_path)

    return _fn
