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
    base, base_gen = _read_baseline(spark, baseline_path, counts)
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
    # and KMV/HLL sketches lean on). CAS + retry: two monitors sharing
    # one store both read generation N and both merge; without the
    # expect_generation guard the second manifest flip would silently
    # DROP the first batch's counts from the baseline forever. On a
    # lost CAS the loser un-stages, re-reads the NEW live baseline and
    # re-merges its (localCheckpoint-pinned) batch counts — counts are
    # commutative, so retried merges land every batch exactly once.
    for attempt in range(_MAX_COMMIT_RETRIES):
        merged = (
            base.select(*g, "bin", F.col("b").alias("c"))
            .unionByName(counts)
            .groupBy(*g, "bin")
            .agg(F.sum("c").alias("c"))
        )
        try:
            _commit_counts(spark, baseline_path, merged, base_gen)
            return result
        except scale.ConcurrentCommitError:
            if attempt == _MAX_COMMIT_RETRIES - 1:
                raise
            base, base_gen = _read_baseline(spark, baseline_path, counts)
    return result


_MAX_COMMIT_RETRIES = 5


def _read_baseline(
    spark: SparkSession, baseline_path: str, counts: DataFrame
):
    """(baseline counts as column `b`, live generation) — generation is
    the `EXPECT_ABSENT` sentinel when no manifest exists yet, so even
    the FIRST commit is a CAS (two monitors racing to initialize the
    store arbitrate on the generation-0 O_EXCL claim).

    The store is read STRICTLY through the manifest — never
    `live_files`' plain-directory fallback: before generation 0 lands,
    a concurrent writer's just-renamed (uncommitted) count files sit in
    the directory, and the glob fallback would count them as baseline —
    the double-merge hazard the init-race test plants."""
    from social_media_data_pipeline_spark import scale

    files = (
        scale.read_table_manifest(baseline_path)
        if os.path.exists(baseline_path)
        else None
    )
    if files:
        base = spark.read.parquet(*files)
        gen = scale._read_manifest_doc(baseline_path)["generation"]
    else:
        base = counts.limit(0).withColumnRenamed("c", "b")
        gen = scale.EXPECT_ABSENT
    base = base.withColumnRenamed("c", "b") if "c" in base.columns else base
    return base, gen


def _commit_counts(
    spark: SparkSession,
    path: str,
    merged: DataFrame,
    expect_generation: int | None,
) -> None:
    """The baseline store keys on (group…, bin) — rewrite the whole
    (tiny, bins×groups-sized) table atomically: stage new files, flip
    the manifest with a CAS against the generation the merge was
    computed from (`lexical_index._commit` discipline). A lost CAS
    un-stages this writer's files and raises `ConcurrentCommitError`
    so the caller can re-merge against the new live set."""
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
    try:
        scale.write_table_manifest(
            path, live, expect_generation=expect_generation
        )
    except scale.ConcurrentCommitError:
        for f in live:
            try:
                os.remove(f)
            except OSError:
                pass
        raise
