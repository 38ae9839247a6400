"""Isolate one registered query for optimization work (guide §1):
construct + noop-sink timings + `.explain("formatted")` capture.

Usage:
    python tools/profile_query.py NAME [NAME...] [--plans-dir plans/r12] [--suffix before]

For each NAME: reports construct seconds, cold noop-write seconds,
two steady-state noop-write seconds, and (for ITERATIVE-class
queries, per bench.py's timing model) a full warm construct+write
cycle. Writes the formatted physical plan to
<plans-dir>/<name>_<suffix>.txt when --plans-dir is given.

Job-level visibility: each phase sets a job description so a Spark
UI / event log (enable with SPARK_GRAFT_PROFILE_UI=1) attributes
every job to a phase.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from bench import ITERATIVE
    from social_media_data_pipeline_spark.session import get_spark

    extra = {}
    if os.environ.get("SPARK_GRAFT_PROFILE_UI"):
        extra["spark.ui.enabled"] = "true"
    spark = get_spark("profile", extra_conf=extra)
    sc = spark.sparkContext
    qs = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in args.names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            sys.exit(2)
        rec: dict = {}
        sc.setJobDescription(f"{name}: construct")
        t0 = time.time()
        df = qs[name](spark, args.sf_dir)
        rec["construct"] = round(time.time() - t0, 3)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        sc.setJobDescription(f"{name}: cold write")
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        rec["cold"] = round(time.time() - t0, 3)
        steady = []
        for i in range(2):
            sc.setJobDescription(f"{name}: steady write {i}")
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            steady.append(round(time.time() - t0, 3))
        rec["steady"] = steady
        if name in ITERATIVE:
            sc.setJobDescription(f"{name}: warm full cycle")
            t0 = time.time()
            df2 = qs[name](spark, args.sf_dir)
            df2.write.mode("overwrite").format("noop").save()
            rec["warm_cycle"] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
