"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a noop write (full execution, no driver
collect). Session reuse across queries — JVM/session startup excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "region_revenue",
    "top_revenue_orders",
    "events_pivot",
    "running_revenue",
    "sample_per_year",
    "dedup_first_wins",
    "token_frequency",
    "docs_exact_dedup",
    "minhash_lsh_pairs",
    # the stop-shingle-pruned variant is the scale path; the unpruned
    # exact join stays available as `ngram_jaccard` but is not headline
    "ngram_jaccard_pruned",
    "simhash",
    "simhash_near_pairs",
    "sessionize",
    "docs_quality",
    "embedding_topk",
    "embedding_ivf_topk",
    "embedding_near_dup_ivf",
    # iterative CC resolution — runs real Spark jobs during query
    # construction, which the timed region includes (see below)
    "dedup_clusters",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from social_media_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        # construction is INSIDE the timed region: iterative queries
        # (dedup_clusters' CC rounds) run real Spark jobs while the
        # DataFrame is being built — timing only the final noop write
        # would hide them. For lazy queries construction is sub-ms.
        #
        # run 1 (cold): includes whole-stage-codegen compilation of the
        # query shape; run 2 (steady state): the recurring cost a
        # production pipeline pays per batch. Report steady state as the
        # headline, keep cold alongside.
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        cold[name] = round(time.time() - t0, 3)
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_total": round(sum(cold.values()), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
