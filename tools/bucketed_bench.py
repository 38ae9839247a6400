"""Bucketed-layout bench: does co-locating the fact tables on orderkey
delete the join exchanges, and what does it buy in wall time?

Writes lineitem + orders bucketed by orderkey (`scale.write_bucketed`)
into a temp warehouse, registers the dim tables alongside, and runs the
two orderkey-join headline queries (`region_revenue`,
`top_revenue_orders`) against BOTH layouts through the same entry
callables (the `catalog:` scheme in `io.read_table`).

Broadcast joins are disabled for the fact⋈fact comparison: at sf0.1
orders fits under the 10 MB broadcast threshold, which would hide the
exchange either way — at 100 TB it does not, so the honest comparison
is sort-merge join on both layouts.

Usage: python tools/bucketed_bench.py  → one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["region_revenue", "top_revenue_orders"]
BUCKETED = {"lineitem": ["l_orderkey"], "orders": ["o_orderkey"]}
PLAIN = ["customer", "nation", "region"]
PREFIX = "bb_"


def orderkey_exchanges(df) -> int:
    """Count exchanges hash-partitioning on an orderkey in the final
    adaptive plan (materialize first so AQE settles)."""
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "orderkey" in line
    )


def steady(df) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warehouse = tempfile.mkdtemp(prefix="bucketed_bench_wh_")
    try:
        from social_media_data_pipeline_spark import scale
        from social_media_data_pipeline_spark.io import read_table
        from social_media_data_pipeline_spark.session import get_spark
        import __spark_entry__ as entry_mod

        spark = get_spark(
            "bucketed-bench",
            extra_conf={
                "spark.sql.warehouse.dir": warehouse,
                # force SMJ: the 100 TB fact⋈fact join can't broadcast
                "spark.sql.autoBroadcastJoinThreshold": "-1",
            },
        )
        n_buckets = int(os.environ.get("SPARK_GRAFT_BUCKETS", "32"))
        for name, cols in BUCKETED.items():
            scale.write_bucketed(
                read_table(spark, sf_dir, name), f"{PREFIX}{name}", cols, n_buckets
            )
        for name in PLAIN:
            read_table(spark, sf_dir, name).write.mode("overwrite").saveAsTable(
                f"{PREFIX}{name}"
            )

        qs = entry_mod.queries()
        out: dict[str, dict] = {}
        for q in QUERIES:
            base_df = qs[q](spark, sf_dir)
            buck_df = qs[q](spark, f"catalog:{PREFIX}")
            out[q] = {
                "plain_exchanges_on_orderkey": orderkey_exchanges(base_df),
                "bucketed_exchanges_on_orderkey": orderkey_exchanges(buck_df),
                "plain_sec": steady(base_df),
                "bucketed_sec": steady(buck_df),
            }
            assert out[q]["bucketed_exchanges_on_orderkey"] == 0, (
                f"{q}: bucketed layout still shuffles on orderkey:\n"
                + buck_df._jdf.queryExecution().executedPlan().toString()
            )
        print(
            json.dumps(
                {
                    "metric": "bucketed_layout_bench",
                    "buckets": n_buckets,
                    "sf_dir": sf_dir,
                    "queries": out,
                }
            )
        )
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


if __name__ == "__main__":
    main()
