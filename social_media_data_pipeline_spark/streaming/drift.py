"""Streaming distribution-drift monitoring: the incremental form of
`aggregates.histogram_drift`.

The batch operator rescans history through cumulative windows; a
stream cannot. The state that makes drift incremental is exactly the
baseline HISTOGRAM — per-(group, bin) counts, a mergeable structure
(counts add), node-count-sized in bins × groups no matter how many
events produced it (the band-store/label-store economics a third
time). Each micro-batch:

    batch → per-(group, bin) counts               — one partial agg
          → L1 vs the STORED baseline             — integer
            cross-multiplied, one division/group    (the batch
                                                     operator's
                                                     exactness rule)
          → counts MERGE into the baseline store  — manifest commit

A batch's drift is judged against everything seen BEFORE it (the same
"first batch has no baseline" contract as the batch operator), and the
store update is idempotent per batch id when the caller wires
checkpointing — the counts table commits through the same
`write_table_manifest` flip as every other store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def drift_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    baseline_path: str,
    value_col: str,
    bin_width: float,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One monitoring cycle: returns (group…, n_day, n_base, l1_drift)
    for THIS batch vs the stored baseline (empty when no baseline yet —
    unknown, not zero), then merges the batch's counts into the store.
    Returns a MATERIALIZED (collected-to-local) DataFrame so callers
    read it after the store has moved on."""
    from social_media_data_pipeline_spark import scale

    g = list(group_cols)
    bin_expr = (
        F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("bin")
    )
    counts = (
        batch_df.select(*[F.col(c) for c in g], bin_expr)
        .groupBy(*g, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    have_store = os.path.exists(baseline_path) and scale.live_files(
        baseline_path
    )
    if have_store:
        base = scale.manifest_read(spark, baseline_path)
    else:
        base = counts.limit(0).withColumnRenamed("c", "b")
    base = base.withColumnRenamed("c", "b") if "c" in base.columns else base
    joined = counts.join(base, [*g, "bin"], "full_outer").fillna(
        0, subset=["c", "b"]
    )
    totals = joined.groupBy(*g).agg(
        F.sum("c").alias("n_day"), F.sum("b").alias("n_base")
    )
    term = F.abs(F.col("c") * F.col("n_base") - F.col("b") * F.col("n_day"))
    out = (
        joined.join(totals, g) if g else joined.crossJoin(totals)
    )
    result = (
        out.groupBy(*g, "n_day", "n_base")
        .agg(F.sum(term).alias("__num"))
        .filter((F.col("n_base") > 0) & (F.col("n_day") > 0))
        .select(
            *g,
            "n_day",
            "n_base",
            F.round(
                F.col("__num") / (F.col("n_day") * F.col("n_base")), 6
            ).alias("l1_drift"),
        )
    )
    result = spark.createDataFrame(result.collect(), result.schema)
    # merge batch counts into the baseline store (counts are a
    # commutative monoid — the same mergeability the ANN fingerprint
    # and KMV/HLL sketches lean on)
    merged = (
        base.select(*g, "bin", F.col("b").alias("c"))
        .unionByName(counts)
        .groupBy(*g, "bin")
        .agg(F.sum("c").alias("c"))
    )
    _commit_counts(spark, baseline_path, merged)
    return result


def _commit_counts(spark: SparkSession, path: str, merged: DataFrame) -> None:
    """The baseline store keys on (group…, bin) — rewrite the whole
    (tiny, bins×groups-sized) table atomically: stage new files, flip
    the manifest. Simpler than a composite-key upsert, and the table is
    state-sized by construction."""
    import glob as _glob
    import uuid as _uuid

    from social_media_data_pipeline_spark import scale

    tag = _uuid.uuid4().hex[:8]
    staged = os.path.join(path, f"_staged-{tag}")
    merged.coalesce(1).write.mode("overwrite").parquet(staged)
    live = []
    for i, f in enumerate(sorted(_glob.glob(os.path.join(staged, "*.parquet")))):
        dst = os.path.join(path, f"counts-{tag}-{i}.parquet")
        os.replace(f, dst)
        live.append(dst)
    import shutil

    shutil.rmtree(staged)
    scale.write_table_manifest(path, live)
