"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.schema.fields) > 0


def test_every_query_has_an_oracle():
    qs = set(entry_mod.queries())
    os_ = set(entry_mod.oracle_sql())
    assert os_ <= qs
    assert qs == os_  # full differential coverage (md5-derived LSH planes)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs_at_smoke_sf(spark, sf_dir, name):
    df = entry_mod.queries()[name](spark, sf_dir)
    assert df.count() >= 0
