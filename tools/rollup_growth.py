"""Measure the incremental-rollup economics claim: folding a FIXED
one-day batch into the materialized state table must stay ~flat while
the HISTORY the store covers grows — versus the full recompute, whose
cost grows with history (the `operators/rollup.py` IVM contract).

    python tools/rollup_growth.py [days...]   # default 30 240 960

Synthesizes events (10k rows/day, 5 types), bootstraps the store with
H days, then times `incremental_rollup_batch` for one new day (best of
2) against `rollup_partial+finalize` over the full H+1 days.
"""

from __future__ import annotations

import datetime as dt
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from social_media_data_pipeline_spark.operators import rollup  # noqa: E402
from social_media_data_pipeline_spark.session import get_spark  # noqa: E402

ROWS_PER_DAY = 10_000
TYPES = 5
EPOCH = dt.datetime(2020, 1, 1)


def _day_events(spark, day_idx: int, days: int = 1):
    n = ROWS_PER_DAY * days
    return (
        spark.range(n)
        .select(
            (F.col("id") + day_idx * ROWS_PER_DAY).alias("event_id"),
            (
                F.lit(EPOCH)
                + F.make_interval(
                    days=(F.col("id") / ROWS_PER_DAY).cast("int") + day_idx,
                    hours=(F.col("id") % 24).cast("int"),
                )
            ).alias("ts"),
            F.concat(F.lit("t"), (F.col("id") % TYPES).cast("string")).alias(
                "event_type"
            ),
            ((F.col("id") % 1000) / 4.0).alias("value"),
        )
    )


def main() -> int:
    days_list = [int(a) for a in sys.argv[1:]] or [30, 240, 960]
    spark = get_spark("rollup-growth")
    print(f"{'hist_days':>9} {'state_rows':>10} {'fold_1day_s':>11} "
          f"{'recompute_s':>11} {'ratio':>7}")
    for days in days_list:
        store = tempfile.mkdtemp(prefix=f"rg{days}-") + "/state"
        # pin inputs on DISK, not in executor storage memory — 38M-row
        # localCheckpoints OOM the default local session, and parquet
        # is the honest input medium anyway
        data = tempfile.mkdtemp(prefix=f"rgdata{days}-")
        _day_events(spark, 0, days=days).write.parquet(data + "/hist")
        _day_events(spark, days).write.parquet(data + "/batch")
        hist = spark.read.parquet(data + "/hist")
        batch = spark.read.parquet(data + "/batch")
        rollup.incremental_rollup_batch(hist, store)
        folds = []
        for i in range(2):
            # fold into a COPY of the store state so each run starts
            # from the same generation (first fold mutates it)
            import shutil

            s2 = tempfile.mkdtemp(prefix=f"rg{days}f{i}-") + "/state"
            shutil.copytree(store, s2)
            t0 = time.time()
            rollup.incremental_rollup_batch(batch, s2)
            folds.append(time.time() - t0)
        full = hist.unionByName(batch)
        recs = []
        for _ in range(2):
            t0 = time.time()
            rollup.rollup_finalize(rollup.rollup_partial(full)).write.mode(
                "overwrite"
            ).format("noop").save()
            recs.append(time.time() - t0)
        state_rows = (days + 1) * TYPES
        fold, rec = min(folds), min(recs)
        print(f"{days:>9} {state_rows:>10} {fold:>11.2f} {rec:>11.2f} "
              f"{rec / fold:>6.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
