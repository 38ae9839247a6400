"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a noop write (full execution, no driver
collect). Session reuse across queries — JVM/session startup excluded.

Timing model (v3 — restores round-1 comparability, see SCALING.md):
- `queries[name]`  = steady-state EXECUTION seconds (best of 2 noop
  writes of a pre-built DataFrame). This is the number that scales
  with data volume; it's what a 1000-executor cluster repeats per
  batch.
- `construct[name]` = driver-side plan construction seconds (Python →
  Py4J → Catalyst). Constant w.r.t. data volume (~0.1-1.2 s; the wide
  60-agg sketches are the high end). Round 2 folded this into
  `queries[...]`, which made every query look 1.4-2.9× slower than
  round 1 while execution was unchanged — kept separate again so
  cross-round deltas mean plan changes, not accounting changes.
- ITERATIVE queries (dedup_clusters) run real Spark jobs *during*
  construction (CC rounds + localCheckpoint); for those the honest
  per-batch cost is construct + write, so their `queries[...]` value
  includes construction and they are listed under `iterative`.
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
    "dedup_clusters",
    "docs_unigram_logprob",
    "docs_shuffle",
    # round 4: sub-document dedup + event-sequence analytics
    "docs_segment_dedup",
    "docs_duplicate_spans",
    "events_funnel",
    # round 5: skew-tolerant sessionize; zipf corpus gate (now fully
    # rank-decomposed, never a single-partition window)
    "sessionize_bounded",
    "docs_zipf_slope",
    # round 5: distribution-matching selection, bigram LM scoring,
    # map-side RAG chunking
    "docs_dsir_weights",
    "docs_bigram_logprob",
    "docs_chunks",
    # round 5 (late): semantic dedup, mergeable distinct sketch,
    # product-quantization ANN
    "embedding_semdedup",
    "events_kmv_distinct",
    "embedding_pq_topk",
    # round 6: integer-exact PageRank (iterative — rounds run at
    # construction), Z-order layout key, explicit-register HLL,
    # KMV set-operation overlap estimates
    "graph_pagerank",
    "events_zorder_key",
    "events_hll_distinct",
    "events_kmv_overlap",
    # round 7: dangling-mass PageRank, multiprobe IVF retrieval,
    # RRF hybrid retrieval, temperature mixture, training-shard packing
    "graph_pagerank_dangling",
    "embedding_ivf_topk_multiprobe",
    "docs_hybrid_rrf",
    "docs_temperature_mixture",
    "docs_training_shards",
    "docs_incremental_dedup",
    "docs_gopher_rules",
    "docs_curation_report",
    "docs_mixture_solver",
    # round 7 (late): the two full-cycle perf wins, tracked as iterative
    "docs_bpe_merges",
    "docs_llm_pipeline",
    # round 8: production-shaped multi-round batched BPE (9 rounds at
    # sf0.1 under the truncated head — the recollection path's cost)
    "docs_bpe_merges_80",
    # round 8: the composed ANN production default (trained centroids ×
    # 4-probe — dominates both single-lever configs in ann_recall.py)
    "embedding_ivf_multiprobe_trained",
    # round 8: per-doc duplication fraction (aggregate sibling of
    # docs_duplicate_spans — no occurrence-list state)
    "docs_dup_window_frac",
    # round 8 (late): degree-ordered-orientation triangle counting on
    # the support-2 co-purchase graph (iterative: edge set + oriented
    # edges are pinned at construction)
    "graph_triangles",
    # round 8 (late): CCNet per-language quality terciles (iterative:
    # the bigram-LM scored table is pinned at construction)
    "docs_ccnet_buckets",
    # round 8 (late): exact eval-overlap decontamination fraction
    # (distinct-gram reduce + broadcast eval set, fully lazy plan)
    "docs_contamination_frac",
    # round 8 (late): per-source OOV dashboard (top-V vocab broadcast)
    "docs_oov_rate",
    # round 8 (late): span-level decontamination (semi join + islands)
    "docs_decontaminate_spans",
    # round 8 (late): bounded-round k-core peeling (iterative: per-round
    # lineage cuts run at construction)
    "graph_kcore",
    # round 8 (late): best-fit-decreasing whole-document packing — the
    # one sanctioned sequential applyInPandas stage
    "docs_pack_bfd",
    # round 8 (late): hybrid skew-salted join (deterministic salt)
    "events_salted_join",
    # round 8 (late): correlated-sampling join-size estimation
    "orders_join_size_est",
    # round 8 (late): cluster-balanced corpus sample (trained cells)
    "embedding_balanced_sample",
    # round 8 (late): label-propagation communities (iterative:
    # per-round lineage cuts run at construction)
    "graph_lpa",
    # round 8 (late): exact per-group winsorization + robust outlier flags
    "events_winsorized",
    "events_robust_anomalies",
    # round 8 (late): recency-decayed engagement (dyadic-exact decay)
    "events_decayed_engagement",
    # round 8 (late): weighted PageRank (iterative)
    "graph_pagerank_weighted",
    # round 9: train-once/search-many lifecycle — the amortized search
    # cost over PERSISTED centroids (the full-cycle trained entries
    # above stay as the training benchmarks). First-ever run trains and
    # commits the artifact (ITERATIVE-class cost); steady state is a
    # fingerprint scan + broadcast search, ~1-2 s at sf0.1
    "embedding_ivf_search_persisted",
    "embedding_balanced_sample_persisted",
    # round 9: seed-local retrieval + link prediction + the lossless
    # prefix-filter similarity join
    "graph_ppr",
    "graph_link_predict",
    "docs_setsim_prefix",
    # round 9: sorted-neighborhood blocking + deterministic negative
    # sampling (both rank-table construction — ITERATIVE class)
    "docs_snm_pairs",
    "docs_negative_pairs",
    "embedding_hard_negatives",
    # round 10: the full amortized ANN stack — residual IVF-PQ
    # multiprobe search over BOTH persisted artifacts (centroids +
    # residual codebook); steady state is two fingerprint scans + two
    # tiny artifact reads + the broadcast search
    "embedding_ivf_multiprobe_searched",
    # round 10: the ER flagship — dual-channel candidates -> verify ->
    # incremental CC (edge set + per-batch labels pin at construction)
    "docs_entity_resolution",
    # round 10: split-leakage audit (lossless prefix candidates x the
    # deterministic split — the paraphrase-level eval contamination)
    "docs_split_leakage",
    # round 10: the band-planner parameter table (no corpus input;
    # LocalTableScan + codegen projection)
    "minhash_band_plan",
    # round 10: per-day L1 histogram-drift monitor (cumulative
    # baselines via (type,bin)-partitioned windows)
    "events_drift_scores",
    # round 10: per-language tokenizer fertility (BPE train + encode
    # replay + language-grain sums — ITERATIVE: training at construct)
    "docs_token_fertility",
    # round 10: privacy release audit (one hash aggregate + flags)
    "customer_k_anonymity",
    # round 10: blocking-quality evaluation (truth + 2 generators +
    # semi-join counts — ITERATIVE: pinned candidate sets + counts at
    # construction)
    "docs_blocking_quality",
    # round 10: build-once/search-many BM25 over the persisted inverted
    # index (get-or-build + fingerprint validation at construct —
    # ITERATIVE; warm search reads only the query terms' row groups)
    "docs_bm25_searched",
    # round 10: leakage-free group split (CC over the LSH candidate
    # graph → split by cluster-rep fingerprint — ITERATIVE: CC pins
    # pair/label tables at construction)
    "docs_group_split",
    # round 10: incrementally-maintained materialized rollup (3 chunked
    # selective upserts at construct — ITERATIVE; the read is a
    # state-table scan + finalize projection)
    "events_rollup_incremental",
    # round 10: Deequ-style constraint suite (one aggregate pass + one
    # broadcast FK anti-join)
    "orders_constraint_audit",
    # round 10: calendar densification (sparse daily series -> dense
    # spine with explicit zeros + per-type forward fill)
    "events_daily_dense",
    # round 10: fertility-corrected mixture (BPE train + encode + token
    # masses at construct — ITERATIVE; the kept-set plan is map-side)
    "docs_fertility_mixture",
    # round 10: 3-truss of the co-purchase graph (peel rounds at
    # construct — ITERATIVE; fixpoint measured at 2 rounds)
    "graph_ktruss",
    # round 11: the 100 TB shape of blocking evaluation — md5
    # half-sample + Wilson error bars (ITERATIVE: same pinned sets)
    "docs_blocking_quality_sampled",
    # round 11: block-sampled sibling (prefix-hash keep decision —
    # cliques survive whole; honest CI for window generators)
    "docs_blocking_quality_blocks",
    # round 11: SCD2 dimension maintenance (one key join + unions;
    # the dup/stale refusal probes run bounded collects at construct)
    "customer_scd2",
    # round 11: exact integer-micro covariance (one Gram pass; the
    # PCA/OPQ input and the embedding-drift spectrum)
    "embedding_covariance",
    # round 11: shuffle-key skew planner (counts + bounded top-k)
    "events_user_skew",
    # round 11: MMR diversity reranking (exact integer-cosine greedy)
    "embedding_mmr_rerank",
    # round 12: SCD2 as-of fact join (broadcast equi + residual range)
    "orders_scd2_asof_join",
    # round 12: OPQ rotation composed into residual IVF-PQ (literal
    # T=R·S matmul map-side; trains cells + residual codebook at
    # construct — ITERATIVE)
    "embedding_ivf_pq_opq",
    # round 12: spectrum store incremental ≡ recompute identity (3
    # CAS folds at construct — ITERATIVE; read = store-sized finalize)
    "embedding_spectrum_incremental",
    # round 12: count-preserving dedup weights (CC loop at construct —
    # ITERATIVE; read = one component aggregate)
    "docs_dedup_weights",
    # round 12: warm-path OPQ sibling (persisted cells/codebook/codes;
    # first run trains — ITERATIVE — later runs amortize)
    "embedding_ivf_pq_opq_searched",
    # round 12 (late): Markov transition matrix + temporal-halves
    # transition drift (sessionize-key window; |types|²-bounded tail)
    "events_transition_matrix",
    "events_transition_drift",
    # round 12 (late): exact-integer CUSUM changepoint over the daily
    # count series (bounded global window)
    "events_cusum_changepoint",
    # round 12 (late): session-path trigrams in ONE user-key shuffle
    "events_session_paths",
    # round 12 (late): seam-repaired transition-count IVM (3 folds x
    # 2 selective_upserts at construct -- ITERATIVE/maintenance class)
    "events_transition_incremental",
    # round 12 (late): last-touch attribution (one rows-frame window)
    "events_attribution",
    # round 12 (late): association rules (integer confidence/lift)
    "orders_basket_rules",
    # round 12 (late): activation-funnel latency (one per-user agg)
    "events_time_to_convert",
    # round 13 (optimization): budget-zeroed distributed Lloyd — keeps
    # the at-scale trainer path timed now that every other trainer row
    # fits the 8 MiB driver fast path at sf0.1 (VERDICT r12 #1/#3)
    "kmeans_train_distributed",
]

# fixed non-iterative ANCHOR set (r12, verdict #8): the ±15-25%
# session-state band (root-caused twice: ccnet r10, dsir/spans r11)
# makes raw seconds noisy across rounds, so the bench also records
# each query's RATIO to the summed steady-state seconds of these four
# stable scan/join/agg anchors measured in the SAME session — cross-
# round ratio deltas cancel the session's uniform inflation; compare
# ratios first, raw seconds second.
ANCHORS = [
    "pricing_summary",
    "region_revenue",
    "events_pivot",
    "token_frequency",
]

# queries whose construction runs real Spark jobs (iterative algorithms
# materialize intermediate rounds while the DataFrame is being built;
# docs_shuffle and docs_zipf_slope collect their bounded bucket/band
# count offsets at construction) — for these construct time IS
# execution time and is counted.
ITERATIVE = {
    "dedup_clusters",
    "docs_shuffle",
    "docs_zipf_slope",
    # pq_codebook collects its ksub seed rows at construction — a real
    # (bounded) Spark job, so construct time is counted
    "embedding_pq_topk",
    # pagerank's per-round localCheckpoints materialize during construction
    "graph_pagerank",
    "graph_pagerank_dangling",
    "graph_pagerank_weighted",
    # get-or-train centroid load (fingerprint aggregate; trains on a
    # cold artifact) runs at construction
    "embedding_ivf_search_persisted",
    "embedding_balanced_sample_persisted",
    "embedding_ivf_multiprobe_searched",
    # get-or-build index load (fingerprint aggregate; builds on a cold
    # artifact) runs at construction
    "docs_bm25_searched",
    # group split runs CC (pinned pair list + per-round jobs) at
    # construction
    "docs_group_split",
    # the rollup's 3 maintenance upserts run at construction
    "events_rollup_incremental",
    # ER flagship: snm rank table, edge-set pin and per-chunk CC labels
    # all materialize at construction
    "docs_entity_resolution",
    # triangle counting pins the undirected + oriented edge sets at
    # construction (localCheckpoint)
    "graph_triangles",
    # k-core peels with an unconditional per-round lineage cut
    "graph_kcore",
    # k-truss peels + pinned fixpoint support pass at construction
    "graph_ktruss",
    # balanced sample trains its k-means cells at construction
    "embedding_balanced_sample",
    # LPA's per-round label checkpoints materialize at construction
    "graph_lpa",
    # PPR's per-round rank checkpoints + the RA wedge join's pinned
    # undirected edge set materialize at construction
    "graph_ppr",
    "graph_link_predict",
    # bucket-count collect + pinned rank table at construction
    "docs_snm_pairs",
    "docs_negative_pairs",
    # blocking evaluation pins truth + both candidate sets and collects
    # its counts at construction
    "docs_blocking_quality",
    "docs_blocking_quality_sampled",
    "docs_blocking_quality_blocks",
    # scd2's refusal probes (dup keys / stale effective) are bounded
    # collects at construction
    "customer_scd2",
    # ccnet buckets pin the bigram-LM scored table at construction
    "docs_ccnet_buckets",
    # temperature mixture collects its source histogram at construction;
    # training shards collects its bucket-offset table
    "docs_temperature_mixture",
    "docs_training_shards",
    # incremental dedup pins its candidate pairs (localCheckpoint) at
    # construction
    "docs_incremental_dedup",
    # the mixture solver collects its histogram at construction
    "docs_mixture_solver",
    # batched BPE training runs its collection rounds at construction;
    # the flagship pins its surviving corpus at construction
    "docs_bpe_merges",
    "docs_bpe_merges_80",
    "docs_token_fertility",
    "docs_fertility_mixture",
    "docs_llm_pipeline",
    # trained-centroid multiprobe runs its 5 Lloyd rounds at
    # construction — full train+search cycle is the honest number
    "embedding_ivf_multiprobe_trained",
    # near-dup-ivf pins its co-partitioned IVF assignment at
    # construction (r7 AQE-proofing fix) — full cycle is the honest
    # per-batch number
    "embedding_near_dup_ivf",
    # the OPQ composition trains its cells (Lloyd) and residual
    # codebook at construction — full cycle is the honest number
    "embedding_ivf_pq_opq",
    # the spectrum store's 3 maintenance folds run at construction
    "embedding_spectrum_incremental",
    # the CC cluster resolution loops to a fixed point at construction
    "docs_dedup_weights",
    # cold-start trains all three artifacts at construction
    "embedding_ivf_pq_opq_searched",
    # the transition IVM's 3 seam-repaired folds (2 selective_upserts
    # each) run at construction — the maintenance cost IS the number
    "events_transition_incremental",
    # the distributed Lloyd rounds run at construction (checkpoint +
    # per-round jobs) — full train cycle is the honest number
    "kmeans_train_distributed",
}


# queries whose run-to-run variance exceeded the deltas cross-round
# comparisons reason about (r6 verdict: embedding_near_dup_ivf measured
# 3.7 vs 4.66 s across idle sessions): best-of-3 instead of best-of-2,
# and the recorded plan hash says whether a drift was a plan flip (AQE)
# or machine noise.
# embedding_balanced_sample_persisted added r13 (VERDICT r12 #2/#6): its
# r12 -25% round-over-round reading on an untouched code path needed a
# re-pin; best-of-3 keeps the artifact-read row inside the session band.
VARIANCE_PINNED = {
    "embedding_near_dup_ivf",
    "embedding_balanced_sample_persisted",
}


def plan_hash(df) -> str:
    """Stable hash of the physical plan SHAPE: operator tree with
    per-run identifiers (expression ids, plan ids, codegen stage ids,
    file sizes/paths) stripped — two runs with the same hash executed
    the same plan, so a timing delta between them is machine state,
    not Catalyst/AQE. Caveat: ITERATIVE queries' final plans reference
    run-specific localCheckpoint RDDs, so their hashes legitimately
    differ across sessions — compare hashes only for non-ITERATIVE
    queries."""
    import hashlib
    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    s = buf.getvalue()
    s = s.split("===== Subqueries =====")[0]  # subquery ids reorder freely
    s = re.sub(r"#\d+[L]?", "#x", s)
    s = re.sub(r"\[plan_id=\d+\]", "", s)
    # RDD ids are session-activity counters: any createDataFrame /
    # checkpoint scan's MapPartitionsRDD[n] shifts when EARLIER queries
    # create more or fewer RDDs, flipping the hash of an unchanged plan
    # (found in r13 when the pin work shifted ids of every later
    # LocalTableScan-backed query) — strip them like the other
    # per-run identifiers this function already promises to strip
    s = re.sub(r"RDD\[\d+\]", "RDD[x]", s)
    # higher-order-function lambda variable NAMES carry a session-global
    # counter too (lambda x_4 vs lambda x_14 for the same expression)
    s = re.sub(r"lambda ([a-z]+)_\d+", r"lambda \1_n", s)
    s = re.sub(r"\(\d+\)", "(n)", s)
    s = re.sub(r"Location:.*", "Location: <path>", s)
    s = re.sub(r"Statistics:.*", "", s)
    s = re.sub(r"\d+\.\d+ [KMG]i?B", "<size>", s)
    return hashlib.md5(s.encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from social_media_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    construct: dict[str, float] = {}
    cold: dict[str, float] = {}
    plan_hashes: dict[str, str] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        construct[name] = round(time.time() - t0, 3)
        plan_hashes[name] = plan_hash(df)
        # run 1 (cold): includes whole-stage-codegen compilation of the
        # query shape; runs 2-3 (steady state): the recurring cost a
        # production pipeline pays per batch — report the best of 2
        # (best of 3 for VARIANCE_PINNED queries).
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        cold[name] = round(time.time() - t0, 3)
        steady = []
        for _ in range(3 if name in VARIANCE_PINNED else 2):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            steady.append(time.time() - t0)
        timings[name] = round(min(steady), 3)
        if name in ITERATIVE:
            # steady state for an iterative query = a full warm
            # construct+write cycle (the first construct above paid
            # codegen/JIT cold costs for every CC round's job shape)
            t0 = time.time()
            df2 = qs[name](spark, sf_dir)
            df2.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    # session-normalized ratios (r12): each query over the summed
    # steady-state seconds of the fixed non-iterative anchor set from
    # THIS session — cross-round comparisons read these first
    anchor_total = round(sum(timings[a] for a in ANCHORS), 3)
    ratios = {
        name: round(t / anchor_total, 4) if anchor_total > 0 else None
        for name, t in timings.items()
    }
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # KEY ORDER MATTERS: the driver records only the last ~2000 chars of
    # stdout (BENCH_r07 lost its timings to head truncation). Bulky
    # diagnostic sections (plan_hashes, construct, headline) go FIRST so
    # the tail window always contains value + per-query steady-state
    # timings; a compact summary line is also printed LAST so a
    # line-oriented parser recovers the required schema intact.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "unit": "sec",
                "sf": sf_val,
                "timing_model": "v3.2: steady-state execution, best of 2 (3 for variance-pinned); construct separate except iterative; plan_hashes detect AQE flips; ratios = per-query seconds / same-session anchor_total (cross-round comparisons read ratios first)",
                "headline": HEADLINE,
                "iterative": sorted(ITERATIVE),
                "plan_hashes": plan_hashes,
                "construct": construct,
                "cold_total": round(sum(cold.values()), 3),
                "anchor_queries": ANCHORS,
                "anchor_total": anchor_total,
                "ratios": ratios,
                "value": total,
                "queries": timings,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "anchor_total": anchor_total,
                "queries": timings,
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
