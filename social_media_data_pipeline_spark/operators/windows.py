"""Window-function surface (SURVEY.md §2.7).

The reference's window-shaped semantics (per-group share A9, per-year
random top-k D3) are built on these; the engine also ships the standard
ranking/analytic surface as thin, tested helpers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_row_number(
    df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column | str], name: str = "rn"
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(name, F.row_number().over(w))


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    name: str = "rank",
) -> DataFrame:
    """Per-group top-k — rank over an ordered window, filter <= k.

    Window top-k is shuffle-once and AQE-skew-splittable; never collect
    groups to the driver.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(name, F.row_number().over(w)).filter(F.col(name) <= k)


def with_lag_lead(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    offset: int = 1,
    allow_global: bool = False,
) -> DataFrame:
    """lag/lead pair over an ordered partition (delta/time-series prep).

    An empty `partition_by` is a GLOBAL window — the whole input
    collapses onto one task. That is only acceptable for provably
    bounded series (e.g. an already-aggregated daily table, one row per
    calendar day), so it must be requested explicitly with
    `allow_global=True`; reusing this helper on raw event grain without
    partition keys raises instead of silently single-tasking 100 TB.
    """
    if not partition_by and not allow_global:
        raise ValueError(
            "with_lag_lead with no partition_by is a single-task global "
            "window; pass partition keys, or allow_global=True only for "
            "a bounded (pre-aggregated) series"
        )
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(f"{col}_lag", F.lag(col, offset).over(w)).withColumn(
        f"{col}_lead", F.lead(col, offset).over(w)
    )


def running_total(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    name: str = "running_total",
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(name, F.sum(col).over(w))
