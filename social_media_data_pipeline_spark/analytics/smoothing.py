"""Series smoothing (SURVEY.md E16): the reference's
`gaussian_filter1d(y, sigma=3)` trendline (`Exploration/plotting.py:10-11,
96-98`) as a grouped-map pandas UDF over aggregated series.

Runs AFTER aggregation (series are small — one row per time bucket), so
the Python hop costs one Arrow batch per group, not per raw row. The
kernel matches scipy's gaussian_filter1d defaults (truncate=4.0,
mode='reflect') without needing scipy.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _gaussian_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_smooth_1d(values: np.ndarray, sigma: float) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d equivalent (mode='reflect')."""
    kernel = _gaussian_kernel(sigma)
    radius = len(kernel) // 2
    if len(values) == 0:
        return values
    padded = np.pad(values.astype("float64"), radius, mode="reflect")
    return np.convolve(padded, kernel, mode="valid")


def smooth_series(
    df: DataFrame,
    order_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    sigma: float = 3.0,
    out_col: str = "smoothed",
) -> DataFrame:
    """Adds a gaussian-smoothed trendline column per (group, series).

    `df` is an aggregated series table (one row per bucket). Each group's
    series is smoothed independently; with no groups the whole table is
    one series (single small group — fine, it's post-aggregation data).
    """
    group_cols = group_cols or []
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def _smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        pdf[out_col] = np.round(
            gaussian_smooth_1d(pdf[value_col].to_numpy(), sigma), 6
        )
        return pdf

    if group_cols:
        return df.groupBy(*group_cols).applyInPandas(_smooth, schema)
    return df.withColumn("__g", df[order_col].isNotNull()).groupBy("__g").applyInPandas(
        lambda pdf: _smooth(pdf.drop(columns="__g")), schema
    )
