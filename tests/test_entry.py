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


def test_no_driver_unsafe_types_on_oracle_outputs():
    """Static guard for the r11 driver-red class: DuckDB renders
    HUGEINT/DECIMAL/TIME differently through the driver's pandas/arrow
    fetch than through fetchall (SUM over integers promotes to HUGEINT
    → float64 "145.0" vs Spark's "145"), so no oracle may emit them.
    DESCRIBE plans without executing, so this sweeps all ~170 oracles
    in seconds — the commit-time complement of the mirror's runtime
    type_police (tools/check_correctness.py)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = {}
    for name, sql in entry_mod.oracle_sql().items():
        try:
            cols = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # pragma: no cover - surface the query name
            raise AssertionError(f"{name}: DESCRIBE failed: {e}") from e
        unsafe = [
            f"{c[0]}:{c[1]}"
            for c in cols
            if any(k in str(c[1]).upper() for k in ("HUGEINT", "DECIMAL", "TIME("))
            or str(c[1]).upper() == "TIME"
        ]
        if unsafe:
            bad[name] = unsafe
    assert not bad, f"driver-unsafe oracle output types: {bad}"
