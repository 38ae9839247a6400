"""Grouped-aggregate pandas UDAF capability (SURVEY.md §2.12 note: the
reference has no UDAFs; the engine ships the pattern for aggregates the
built-ins can't express).

Example operator: per-group Gini concentration of a value column —
needs the full sorted group, so it's a genuine UDAF case (E16's gaussian
smoothing is the same shape). Arrow-batched grouped-agg pandas_udf:
one Python call per group, vectorized inside.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gini(values: pd.Series) -> float:
    """Gini coefficient of non-negative values (0=uniform, →1=concentrated)."""
    v = values.dropna().sort_values().to_numpy(dtype="float64")
    n = len(v)
    if n == 0 or v.sum() == 0:
        return 0.0
    cum = v.cumsum()
    return float(round((n + 1 - 2 * (cum / cum[-1]).sum()) / n, 6))


def gini_udaf():
    """Grouped-agg pandas UDAF (built lazily: the decorator parses its
    return-type DDL against the active session)."""
    return F.pandas_udf(_gini, "double")


def engagement_concentration(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group engagement concentration: how unevenly `value_col` is
    distributed within each group (e.g. likes across an owner's posts)."""
    return df.groupBy(group_col).agg(gini_udaf()(F.col(value_col)).alias("gini"))
