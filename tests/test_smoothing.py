"""E16 gaussian trendline smoothing tests."""

from __future__ import annotations

import datetime as dt

import numpy as np

from social_media_data_pipeline_spark.analytics.smoothing import (
    gaussian_smooth_1d,
    smooth_series,
)


class TestSmoothing:
    def test_constant_series_unchanged(self):
        v = np.full(20, 7.0)
        assert np.allclose(gaussian_smooth_1d(v, 3.0), v)

    def test_smoothing_reduces_variance(self):
        rng = np.random.default_rng(0)
        v = rng.standard_normal(100)
        assert gaussian_smooth_1d(v, 3.0).var() < v.var()

    def test_smooth_series_grouped(self, spark):
        rows = []
        for g in ("a", "b"):
            for i in range(12):
                rows.append((g, dt.datetime(2020, 1 + i % 12, 1), float(i % 4)))
        df = spark.createDataFrame(rows, "g string, period timestamp, n double")
        out = smooth_series(df, "period", "n", group_cols=["g"], sigma=2.0)
        assert out.count() == 24
        got = out.filter("g = 'a'").orderBy("period").collect()
        vals = [r.smoothed for r in got]
        raw = [r.n for r in got]
        assert np.asarray(vals).var() < np.asarray(raw).var()

    def test_smooth_series_ungrouped(self, spark):
        df = spark.createDataFrame(
            [(i, float(i % 3)) for i in range(10)], "bucket int, v double"
        )
        out = smooth_series(df, "bucket", "v", sigma=1.0)
        assert out.count() == 10 and "smoothed" in out.columns
