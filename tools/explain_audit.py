"""Physical-plan audit: verifies that the plans Catalyst produces for the
headline queries have the shape the 100 TB design intends —

- filters reach the parquet scan (PushedFilters),
- scans read only needed columns (ReadSchema pruning),
- small dims join via BroadcastHashJoin,
- hot paths stay inside WholeStageCodegen (no row-at-a-time Python).

Usage: python tools/explain_audit.py [query ...]   (prints PASS/FAIL per rule)
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

# query → list of (rule_name, regex that must match the formatted plan)
EXPECTATIONS: dict[str, list[tuple[str, str]]] = {
    "filter_project": [
        ("filter pushed to scan", r"PushedFilters: \[.*EqualTo\(o_orderstatus,F\)"),
        ("column pruning", r"ReadSchema: [^\n]*o_orderkey[^\n]*o_totalprice"),
        ("no shuffle", r"\A(?!.*Exchange)", ),
    ],
    "pricing_summary": [
        ("shipdate filter pushed", r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate"),
        ("partial aggregation", r"HashAggregate"),
        # executed-plan toString renders WholeStageCodegenExec as *(n)
        ("codegen", r"\*\(\d+\)|WholeStageCodegen"),
    ],
    "region_revenue": [
        ("dims broadcast", r"BroadcastHashJoin"),
        ("fact join present", r"Join|ShuffledHashJoin|SortMergeJoin"),
    ],
    "top_revenue_orders": [
        ("top-k not full sort", r"TakeOrderedAndProject"),
    ],
    "embedding_topk": [
        ("query side broadcast", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
    ],
    "top_parts_per_brand": [
        ("single window shuffle", r"Window"),
    ],
    "docs_exact_dedup": [
        ("window dedup", r"Window"),
        ("scan prunes columns", r"ReadSchema: [^\n]*text"),
    ],
    "docs_split": [
        # split assignment must stay a pure map: no join, no aggregate —
        # the only exchange allowed is the final presentation sort
        ("no join or aggregate", r"\A(?!.*(?:Join|HashAggregate))"),
        ("text column not read", r"\A(?!.*ReadSchema: [^\n]*\btext\b)"),
    ],
    "docs_segment_dedup": [
        # first-occurrence selection must be the map-side-combinable
        # min(struct) HASH AGGREGATE (partials collapse duplicate
        # segments before the shuffle) — not a sort-window, not a join
        ("hash-aggregate dedup", r"HashAggregate|ObjectHashAggregate"),
        ("no window sort", r"\A(?!.*Window)"),
        ("no join", r"\A(?!.*(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin))"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_boilerplate_ngrams": [
        ("top-k not full sort", r"TakeOrderedAndProject"),
        ("partial aggregation", r"HashAggregate"),
    ],
    "docs_bloom_decontaminate": [
        # one-row bloom map rides a broadcast; confirm join broadcasts the
        # true eval set; the big train side never shuffles before the
        # per-doc distinct
        ("bloom broadcast", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "events_funnel": [
        ("no join", r"\A(?!.*(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin))"),
        ("grouped aggregation", r"HashAggregate|ObjectHashAggregate|SortAggregate"),
    ],
    "events_transition_matrix": [
        ("per-user window", r"Window"),
        ("no single-partition exchange", r"\A(?!.*Exchange SinglePartition)"),
        ("no self-join on the events subtree", r"\A(?!.*(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin))"),
    ],
    "orders_basket_rules": [
        # pair generation is the project_bipartite self-equi-join on
        # the basket key; item counts join hash-equi; the 1-row basket
        # total broadcasts — nothing cartesian beyond that 1-row cross
        ("hash-equi pair join", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("1-row total broadcast", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no window at all", r"\A(?!.*Window)"),
    ],
    "events_time_to_convert": [
        ("one per-user partial aggregate, no window", r"\A(?!.*Window)"),
        ("no join", r"\A(?!.*(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|BroadcastNestedLoopJoin))"),
        ("partial aggregation", r"HashAggregate"),
    ],
    "events_attribution": [
        # the one SinglePartition exchange feeds the total-sum window
        # over the bounded (≤ |types|+1 rows) counts table — the
        # documented bounded class; events are shuffled exactly once
        ("per-user rows-frame window, no self-join", r"Window"),
        ("no join at all", r"\A(?!.*(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|BroadcastNestedLoopJoin))"),
    ],
    "events_session_paths": [
        ("windows share the user-key sort", r"Window"),
        ("no single-partition exchange", r"\A(?!.*Exchange SinglePartition)"),
        ("no join (leads stay in-partition)", r"\A(?!.*(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|BroadcastNestedLoopJoin))"),
    ],
    "events_transition_drift": [
        ("per-user window", r"Window"),
        ("bounds broadcast, not shuffled", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("partial aggregation", r"HashAggregate"),
    ],
    "events_cusum_changepoint": [
        ("daily pre-aggregation before the global window", r"HashAggregate"),
        ("totals broadcast", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
    ],
    "events_retention": [
        ("no single-partition exchange", r"\A(?!.*Exchange SinglePartition)"),
        ("value column not read", r"\A(?!.*ReadSchema: [^\n]*\bvalue\b)"),
    ],
    "events_anomaly_days": [
        ("stats side broadcast", r"BroadcastHashJoin"),
        ("partial aggregation", r"HashAggregate"),
    ],
    "events_trailing_avg": [
        ("frame window", r"Window"),
        ("no single-partition exchange", r"\A(?!.*Exchange SinglePartition)"),
    ],
    "customer_quartiles": [
        ("ntile window", r"Window"),
        ("only needed columns read", r"\A(?!.*ReadSchema: [^\n]*c_name)"),
    ],
    "docs_zipf_slope": [
        # exact rank decomposition (log2-band offsets + partitioned
        # count-of-counts + uniform sub-buckets): every Window must carry
        # a partition spec. An unpartitioned WindowExec prints
        #   Window [exprs AS x#1], [orderSpec]      (no partition group)
        # so a group containing ASC/DESC right after the exprs group is
        # the single-task global sort this query must never have. The
        # final 1-row aggregate's Exchange SinglePartition (32 partial
        # rows) is fine and deliberately not banned.
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("bucketed window", r"Window"),
    ],
    "sessionize_bounded": [
        # the skew-tolerant formulation must never fall back to a bare
        # per-user (or global) window over raw events: every Window
        # carries a partition spec, and the event-grain window is keyed
        # (user, chunk)
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("chunked event window", r"windowspecdefinition\(user_id[^\n]*__chunk"),
    ],
    "docs_shuffle": [
        # rank decomposition: per-bucket window + tiny counts aggregate,
        # but never a single-partition global sort of the data
        ("bucketed window", r"Window"),
        ("no single-partition exchange", r"\A(?!.*Exchange SinglePartition)"),
        ("text column not read", r"\A(?!.*ReadSchema: [^\n]*\btext\b)"),
    ],
    "docs_dsir_weights": [
        # the n_buckets-row log-ratio table must broadcast back into the
        # per-gram join; feature hashing is map-side (no python)
        ("ratio table broadcast", r"BroadcastHashJoin"),
        ("partial aggregation", r"HashAggregate"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_bigram_logprob": [
        # bigram counts join on their natural key (honest shuffle join —
        # a 100 TB bigram table does not broadcast); unigram/scalar
        # factors ride broadcasts; no window anywhere
        ("context/unigram broadcast", r"BroadcastHashJoin"),
        ("no window sort", r"\A(?!.*Window)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_quality_classifier": [
        # scoring joins the 257-row weight table via broadcast; no
        # window, no python — training-loop plans are per-iteration and
        # audited implicitly by this final composed plan's shape
        ("weights broadcast", r"BroadcastHashJoin"),
        ("no window sort", r"\A(?!.*Window)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_bpe_tokens": [
        # tokens join the folded vocabulary via broadcast; per-token
        # merge replay must NOT appear (that is the OOV path)
        ("vocab broadcast", r"BroadcastHashJoin"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_bpe_merges_80": [
        # the multi-round certified trainer's OUTPUT is a driver-built
        # literal merge table: no executor work may remain in the final
        # plan (the training jobs already ran during construction)
        ("result is a local merge table", r"LocalTableScan|Scan ExistingRDD"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_chunks": [
        # one map-side projection: posexplode over transform/slice — the
        # ONLY exchange allowed is the presentation orderBy's range
        # partitioning; no aggregate, no join, no window
        ("no join/aggregate/window", r"\A(?!.*(?:Join|HashAggregate|Window))"),
        ("explode generator", r"Generate"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "embedding_semdedup": [
        # centroid assignment broadcasts the small centroid table; the
        # dominance pair join is cluster-EQUI (never cartesian); the
        # survivor filter is a broadcast anti join on dropped ids
        ("centroids broadcast", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("no cartesian pair join", r"\A(?!.*CartesianProduct)"),
        ("anti join survivors", r"LeftAnti"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "events_kmv_distinct": [
        # two-level sketch build = object-hash aggregates with map-side
        # partials; no window, no python
        ("partial aggregation", r"ObjectHashAggregate|HashAggregate"),
        ("no window sort", r"\A(?!.*Window)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "events_quantile_sketch": [
        # same two-level bounded-state shape as the KMV build: object
        # aggregates, no per-group sort window, no python
        ("partial aggregation", r"ObjectHashAggregate|HashAggregate"),
        ("no window sort", r"\A(?!.*Window)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "embedding_ivf_pq_topk": [
        # candidates come from the query's IVF cell: the pair join must
        # be cluster-EQUI (broadcast hash on the 20-query side), never a
        # cartesian or nested-loop over the whole corpus
        ("cell-equi candidate join", r"BroadcastHashJoin.*cluster|SortMergeJoin.*cluster"),
        ("no cartesian", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "embedding_ivf_topk_multiprobe": [
        # candidates bounded by probes × cell: the candidate join must
        # stay cluster-EQUI with the probed query side broadcast —
        # never a nested loop over the corpus; per-query top-k is the
        # only window
        ("cell-equi candidate join", r"BroadcastHashJoin.*cluster|SortMergeJoin.*cluster"),
        ("no cartesian", r"\A(?!.*CartesianProduct)"),
        ("no nested-loop candidate join",
         r"\A(?!.*BroadcastNestedLoopJoin[^\n]*(?:Inner|Cross)[^\n]*\n[^\n]*cluster)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_decontaminate_spans": [
        # semi join against the broadcast eval gram set (no occurrence
        # list / collect_list state at all — unlike duplicate_spans);
        # the only window is the doc-partitioned islands row_number
        ("broadcast eval semi join", r"BroadcastHashJoin.*LeftSemi"),
        ("no collect_list state", r"\A(?!.*collect_list)"),
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("doc-partitioned islands window", r"windowspecdefinition\(id"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_oov_rate": [
        # top-V vocab via TakeOrderedAndProject (never a full global
        # sort of the vocab table), broadcast into the coverage join;
        # (group, token) pre-aggregation ahead of the join; no Python
        ("top-v via TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("broadcast vocab join", r"BroadcastHashJoin"),
        ("no global sort exec", r"\A(?!.*\bSort \[n#)"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_contamination_frac": [
        # exact eval-overlap fraction: distinct gram reduction BEFORE
        # the join, eval gram set broadcast (benchmarks are small by
        # construction), no window, no Python, nothing quadratic
        ("broadcast eval gram join", r"BroadcastHashJoin"),
        ("no cartesian", r"\A(?!.*CartesianProduct)"),
        ("no nested-loop join", r"\A(?!.*BroadcastNestedLoopJoin)"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_ccnet_buckets": [
        # tercile thresholds come from the bounded distinct-(lang,
        # score) value table: the only window is lang-partitioned (no
        # per-document ntile, no global sort); thresholds broadcast
        # back; scored table pinned (Scan ExistingRDD) so the bigram-LM
        # chain isn't recomputed per consumer under AQE; no Python
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("lang-partitioned value window", r"windowspecdefinition\(lang"),
        ("broadcast threshold join", r"BroadcastHashJoin"),
        ("pinned scored table", r"Scan ExistingRDD"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "graph_triangles": [
        # degree-ordered orientation: every join hash-equi (wedge join
        # on the low endpoint, closing join on the (v1, v2) pair) —
        # never cartesian/BNLJ; oriented edges pinned (Scan ExistingRDD)
        # so the pair-aggregate isn't recomputed per branch under AQE;
        # pure integer exprs, no Python, no window
        ("no cartesian", r"\A(?!.*CartesianProduct)"),
        ("no nested-loop join", r"\A(?!.*BroadcastNestedLoopJoin)"),
        ("pinned oriented edges", r"Scan ExistingRDD"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
    ],
    "graph_kcore": [
        # bounded-round peeling with an unconditional per-round lineage
        # cut: the returned plan is a degree partial-aggregate over the
        # checkpointed final edge set — no cartesian, no window, no
        # Python; Scan ExistingRDD is the pinned (early-stopped) core
        ("pinned peeled edges", r"Scan ExistingRDD"),
        ("partial aggregation", r"HashAggregate"),
        ("no cartesian", r"\A(?!.*CartesianProduct)"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "orders_join_size_est": [
        # sketch build: key column only, hash-threshold filter BEFORE
        # the per-key count (partial agg), equi join of the two tiny
        # sampled tables; no python, no window
        ("orders scan prunes to key", r"ReadSchema: [^\n]*o_orderkey"),
        ("partial aggregation", r"HashAggregate"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
    ],
    "events_salted_join": [
        # hybrid salted join: deterministic xxhash64 salt on the fact
        # side (rand() salts corrupt results on task retry), hot-key
        # split via broadcast semi/anti probes, every join hash-equi
        ("deterministic content-hash salt", r"xxhash64"),
        ("hot-key probe broadcast", r"BroadcastHashJoin"),
        ("no cartesian", r"\A(?!.*CartesianProduct)"),
        ("no nested-loop join", r"\A(?!.*BroadcastNestedLoopJoin)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_pack_bfd": [
        # inherently sequential per-shard BFD: the ONE sanctioned
        # Pandas stage, fed by exactly one hash-partition shuffle on
        # the shard key; no join, no window, text never read
        ("per-shard pandas stage", r"FlatMapGroupsInPandas"),
        ("sharded by hash key", r"hashpartitioning\(shard"),
        ("no join", r"\A(?!.*Join)"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
        ("text column not read", r"\A(?!.*ReadSchema: [^\n]*\btext\b)"),
    ],
    "docs_pack_bfd_stats": [
        # aggregate over the per-shard pandas placements: partial agg
        # keyed on shard (already the partition key), no join/window
        ("per-shard pandas stage", r"FlatMapGroupsInPandas"),
        ("partial aggregation", r"HashAggregate"),
        ("no join", r"\A(?!.*Join)"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
    ],
    "events_decayed_engagement": [
        # pure map expressions into ONE partial-agg shuffle: no join,
        # no window, no python; ts filter evaluated at the scan level
        ("no join", r"\A(?!.*Join)"),
        ("partial aggregation", r"HashAggregate"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "events_robust_anomalies": [
        # median + MAD tables broadcast; flag is a division-free map
        # comparison; no window, no python
        ("stat tables broadcast", r"BroadcastHashJoin"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "events_winsorized": [
        # quantile table broadcast back to the fact side; clip is a
        # pure map expression; no window, no python
        ("quantile table broadcast", r"BroadcastHashJoin"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("partial aggregation", r"HashAggregate|SortAggregate|ObjectHashAggregate"),
    ],
    "graph_lpa": [
        # bounded-round sync LPA: returned plan is the pinned final
        # label table (per-round lineage cut); argmax is an aggregate
        # (max(struct)) — no window, no cartesian, no Python
        ("pinned label table", r"Scan ExistingRDD"),
        ("no cartesian", r"\A(?!.*CartesianProduct)"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_dup_window_frac": [
        # no occurrence-list state: aggregates only, no collect_list,
        # no window function, hash-equi join back
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
        ("no collect_list state", r"\A(?!.*collect_list)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "embedding_ivf_multiprobe_trained": [
        # the composed production default (trained centroids × 4-probe):
        # same bounded-candidate contract as the seeded multiprobe rule
        ("cell-equi candidate join", r"BroadcastHashJoin.*cluster|SortMergeJoin.*cluster"),
        ("no cartesian", r"\A(?!.*CartesianProduct)"),
        ("no nested-loop candidate join",
         r"\A(?!.*BroadcastNestedLoopJoin[^\n]*(?:Inner|Cross)[^\n]*\n[^\n]*cluster)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "embedding_pq_topk": [
        # encode is a pure map over the literal codebook (no join to a
        # codebook table); ADC joins the 5-query side via broadcast; the
        # only window is the per-query top-k
        ("query side broadcast", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("no equi-join to codebook table", r"\A(?!.*SortMergeJoin)"),
        ("per-query top-k window", r"Window"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_bm25": [
        # top-k is TakeOrderedAndProject; rank comes from a bounded
        # 1-row array_sort + posexplode — the plan is Window-free
        ("top-k not full sort", r"TakeOrderedAndProject"),
        ("no window at all", r"\A(?!.*Window)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_bm25_searched": [
        # persisted-index search: the query terms' IN filter reaches
        # the postings parquet scan (term-sorted row groups skip the
        # rest of the vocab); dfreq slice and stats row broadcast; the
        # top-k/rank tail is the shared Window-free shape
        ("terms IN pushed to postings scan", r"PushedFilters: \[In\(t"),
        ("dfreq broadcast", r"BroadcastHashJoin"),
        ("top-k not full sort", r"TakeOrderedAndProject"),
        ("no window at all", r"\A(?!.*Window)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_group_split": [
        # cluster labels join back on the doc id; the split itself is a
        # pure projection (md5 bucket CASE) — no window, no python, no
        # cartesian anywhere in the CC + label-join + split chain
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no window at all", r"\A(?!.*Window)"),
    ],
    "events_rollup_incremental": [
        # the returned frame reads the committed state table and
        # derives avg at projection time — no re-aggregation of events,
        # no window, no python; the maintenance path's upserts ran at
        # construction (audited by their own selective_upsert tests)
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no window at all", r"\A(?!.*Window)"),
    ],
    "events_transition_incremental": [
        # the returned frame reads the committed counts table (|types|²
        # rows); the seam-repairing folds ran at construction (their
        # upserts audited by the selective_upsert tests, the window in
        # transition_partial always user-partitioned)
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no window at all", r"\A(?!.*Window)"),
    ],
    "orders_constraint_audit": [
        # all single-table constraints fold into ONE aggregate (the
        # stack unpivot runs over a 1-row frame); the FK check is a
        # broadcast anti-join — no window, no python, no cartesian
        ("fk anti-join broadcast", r"BroadcastHashJoin LeftAnti"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no window at all", r"\A(?!.*Window)"),
    ],
    "events_daily_dense": [
        # the spine x groups cross join is two broadcast-sized frames
        # (BroadcastNestedLoopJoin is the legitimate shape there); the
        # data attaches with one equi left join; the ffill window is
        # partitioned per event_type
        ("partitioned ffill window", r"Window"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_fertility_mixture": [
        # thresholds are driver-side bigints by the time the plan
        # exists: the kept-set plan is one literal CASE filter over the
        # corpus scan — no join, no window, no python
        ("map-side threshold filter", r"\A(?!.*(?:SortMergeJoin|ShuffledHashJoin))"),
        ("no window at all", r"\A(?!.*Window)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "graph_ktruss": [
        # the returned plan (post-peel) is the final support pass over
        # the pinned fixpoint edge set: hash-equi joins only, no
        # cartesian, no window, no python
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no window at all", r"\A(?!.*Window)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "kmeans_train": [
        # the model is a driver-side literal by the time the query's
        # DataFrame exists — nothing to audit beyond "it is tiny";
        # audit the TRAINING plan shape instead via ivf_topk_trained
        ("local model relation", r"Scan ExistingRDD|LocalTableScan"),
    ],
    "embedding_ivf_topk_trained": [
        # trained centroids enter as a broadcast of a local relation;
        # assignment is map-side (no shuffle before the cluster join)
        ("centroids broadcast", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "embedding_balanced_sample": [
        # assignment is map-side against broadcast centroids; the cap
        # is the ONE partitioned window (per-cluster) — no similarity
        # join anywhere, no global window, no python
        ("centroids broadcast", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("per-cluster cap window", r"Window"),
        ("no sort-merge similarity join", r"\A(?!.*SortMergeJoin)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "embedding_ivf_search_persisted": [
        # r9 lifecycle: persisted centroids enter as a parquet scan of
        # the tiny committed artifact (or a local relation right after
        # a cold train) — search shape identical to the trained sibling
        ("cell-equi candidate join", r"BroadcastHashJoin.*cluster|SortMergeJoin.*cluster"),
        ("no cartesian", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "embedding_balanced_sample_persisted": [
        # same contract as the full-cycle sibling: map-side assignment
        # against the (broadcast) centroid table, ONE per-cluster window
        ("centroids broadcast", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("per-cluster cap window", r"Window"),
        ("no sort-merge similarity join", r"\A(?!.*SortMergeJoin)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "embedding_ivf_multiprobe_searched": [
        # r10 lifecycle: BOTH trained artifacts persisted — centroids
        # scan in as the tiny committed parquet, the codebook enters as
        # pure literals; search shape identical to the full-cycle
        # residual sibling (cluster-equi candidates, JVM-side ADC)
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("query side broadcast", r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
    ],
    "embedding_ivf_pq_residual": [
        # assignment + codebook are literals/broadcasts by execution
        # time; candidates stay a cluster-equi join, ADC is JVM-side
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("query side broadcast", r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
    ],
    "docs_dedup_weights": [
        # one map-side-combinable component aggregate after the CC
        # labeling (canonical id = MIN inside the agg — no join-back);
        # the window-free shape of the cluster family
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no window at all", r"\A(?!.*Window)"),
        ("partial aggregation", r"HashAggregate"),
    ],
    "embedding_spectrum_incremental": [
        # the read side: store-sized scan + broadcast joins over the
        # d(d+1)/2 partial table; the folds ran at construction
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("broadcast sums join", r"BroadcastHashJoin"),
        ("no window at all", r"\A(?!.*Window)"),
    ],
    "embedding_ivf_pq_opq": [
        # the skew+rotation matmul is ONE literal map-side projection
        # (composed T = R·S, no shuffle added); downstream is the same
        # residual IVF-PQ shape as the sibling
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("query side broadcast", r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
    ],
    "embedding_ivf_pq_opq_searched": [
        # warm path: rotation is the same literal map-side matmul; the
        # cells scan in as the committed parquet, codebook enters as
        # literals, search reads the persisted codes table — same
        # residual shape as the multiprobe_searched precedent
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("query side broadcast", r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
    ],
    "events_kmv_overlap": [
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("partial aggregation", r"HashAggregate|ObjectHashAggregate"),
    ],
    "graph_pagerank": [
        # rounds are checkpointed — the final plan joins the last rank
        # table against pinned nodes; nothing cartesian, nothing Python
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
    ],
    "graph_pagerank_weighted": [
        # rounds are checkpointed — the final plan joins the last rank
        # table against pinned nodes; nothing cartesian, nothing Python
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
    ],
    "graph_pagerank_dangling": [
        # the dangling share is a plan LITERAL (observe scalar folded in
        # by the driver) — same checkpointed-round shape as the sibling
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
    ],
    "graph_ppr": [
        # checkpointed rounds: the final plan joins the last (touched-
        # set-sized) rank table; integer exprs only, nothing cartesian,
        # no Python, no window
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("pinned edges/seeds", r"Scan ExistingRDD"),
    ],
    "graph_link_predict": [
        # wedge self-join and closing anti join are hash-equi (center
        # key / pair key); scores are integer divs in codegen — never
        # cartesian/BNLJ, no window, no Python
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no nested-loop join", r"\A(?!.*BroadcastNestedLoopJoin)"),
        ("pair partial aggregation", r"HashAggregate"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_setsim_prefix": [
        # candidate join keyed by prefix shingle (hash-equi with the
        # length filter as a join condition), doc-freq via partial agg,
        # per-doc rarity sort is an array expression (no window), exact
        # verification via array_intersect in codegen — no Python
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no nested-loop join", r"\A(?!.*BroadcastNestedLoopJoin)"),
        ("partial aggregation", r"HashAggregate|ObjectHashAggregate"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_incremental_clusters": [
        # per-chunk merges are checkpointed — the returned plan joins
        # docs against the pinned final labeling; CC is join+aggregate
        # only: no window, no cartesian, no Python anywhere
        ("pinned labeling", r"Scan ExistingRDD"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no window function", r"\A(?!.*WindowExec|.*\bWindow\b)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "embedding_hard_negatives": [
        # query side broadcast (20 rows) against one corpus scan; the
        # label predicate and max_cos guard prune BEFORE the per-query
        # rank window (partitioned by query_id); JVM float exprs only
        ("query side broadcast", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
    ],
    "docs_snm_pairs": [
        # the rank window is PARTITIONED by the key-prefix bucket (the
        # bucket-offset decomposition) — a bare global ORDER BY window
        # here would be the scale-killer this operator exists to avoid;
        # neighborhood join is hash-equi on the block id
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        # the rank table is pinned (localCheckpoint — both join sides
        # consume it; the partitioned window AND the r10 heavy-hitter
        # prefix probe (auto bucket rebalance, driver-side bounded
        # aggregate — see dedup._snm_bucket_prefix) ran at construction
        ("pinned rank table", r"Scan ExistingRDD"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no nested-loop join", r"\A(?!.*BroadcastNestedLoopJoin)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_blocking_quality": [
        # the final plan is the tiny counts table + ratio projections;
        # truth/candidate joins ran at construction (pinned)
        ("local counts table", r"LocalTableScan|Scan ExistingRDD"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "embedding_mmr_rerank": [
        # one grouping shuffle to per-query pandas groups (the
        # applyInPandas python IS the design: n_candidates² integer
        # ops per group); the query side broadcasts; no cartesian
        ("per-query grouping", r"FlatMapGroupsInPandas|HashAggregate"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no window at all", r"\A(?!.*Window)"),
    ],
    "events_user_skew": [
        # one partial-agg shuffle over the keys; the ONLY window runs
        # over the bounded top-k table (after limit); totals broadcast
        ("partial aggregation", r"HashAggregate|ObjectHashAggregate"),
        ("top-k bounded", r"TakeOrderedAndProject"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
    ],
    "embedding_covariance": [
        # one mapInPandas Gram pass (Arrow python is THE design here —
        # the batch matmul), then a partials-sized aggregate; the
        # n/sums joins are broadcasts; no window
        ("partials aggregate", r"HashAggregate|ObjectHashAggregate"),
        ("bounded tables broadcast", r"BroadcastHashJoin"),
        ("no window at all", r"\A(?!.*Window)"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
    ],
    "customer_scd2": [
        # one key join between the open slice and the update batch;
        # history passes through a union — no window, no python, no
        # cartesian anywhere in the maintenance cycle
        ("no window at all", r"\A(?!.*Window)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("key join present", r"Join"),
    ],
    "orders_scd2_asof_join": [
        # facts ⋈ as-of dimension: hash EQUI-join on custkey with the
        # [from, to) containment as a residual predicate — never a
        # window over the fact table, never a nested-loop join
        ("broadcast hash equi-join", r"BroadcastHashJoin.*custkey"),
        ("no window at all", r"\A(?!.*Window)"),
        ("no nested loop join", r"\A(?!.*BroadcastNestedLoopJoin)"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_blocking_quality_blocks": [
        # block-sampled sibling: same construction-time shape
        ("local counts table", r"LocalTableScan|Scan ExistingRDD"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no window at all", r"\A(?!.*Window)"),
    ],
    "docs_blocking_quality_sampled": [
        # same construction-time shape as the exact variant; the CI
        # columns are pure projections over the tiny counts table
        ("local counts table", r"LocalTableScan|Scan ExistingRDD"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no window at all", r"\A(?!.*Window)"),
    ],
    "customer_k_anonymity": [
        # one map-side-combinable hash aggregate, flags are
        # projections; only needed columns read
        ("partial aggregation", r"HashAggregate|ObjectHashAggregate"),
        ("no join or window", r"\A(?!.*(?:Join|Window))"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("name column not read", r"\A(?!.*ReadSchema: [^\n]*c_name)"),
    ],
    "docs_token_fertility": [
        # encode joins the folded vocab via broadcast (the bpe_tokens
        # contract); the language aggregate is one partial-agg shuffle
        ("vocab broadcast", r"BroadcastHashJoin"),
        ("partial aggregation", r"HashAggregate|ObjectHashAggregate"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "events_drift_scores": [
        # bounded-state windows only: cumulative baselines partition by
        # (type, bin) and (type) — day-grain rows, never event-grain;
        # value column pruned after the bin projection
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("partial aggregation", r"HashAggregate|ObjectHashAggregate"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
    ],
    "minhash_band_plan": [
        # parameter table: a local relation + one codegen'd projection;
        # the only allowed exchange is the presentation sort's range
        # partitioning — no hash shuffle, no join, no aggregate
        ("local table only", r"LocalTableScan|Scan ExistingRDD"),
        ("no hash shuffle", r"\A(?!.*Exchange hashpartitioning)"),
        ("no join or aggregate", r"\A(?!.*(?:Join|HashAggregate))"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_split_leakage": [
        # candidates = the prefix SSJoin (hash-equi); split sides join
        # map-side onto the candidate-count-sized pair table; no global
        # window, no python, no quadratic join
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("partial aggregation", r"HashAggregate|ObjectHashAggregate"),
    ],
    "docs_entity_resolution": [
        # r10 ER flagship: the final plan joins the doc spine against
        # the pinned incremental-CC labels; the rank window, edge-set
        # pin and per-chunk CC all ran at construction. No global
        # window, no quadratic join anywhere in the composition.
        ("pinned labels", r"Scan ExistingRDD"),
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_negative_pairs": [
        # dense index via the same partitioned-rank decomposition;
        # partner resolution is one hash-equi join; draws are md5
        # expressions in codegen — no rand(), no python, no cartesian
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no nested-loop join", r"\A(?!.*BroadcastNestedLoopJoin)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no rand in plan", r"\A(?!.*\brand\()"),
    ],
    "events_zorder_key": [
        # the layout key is a pure JVM bit expression: scan → project →
        # presentation sort, nothing else
        ("no join or aggregate", r"\A(?!.*(?:Join|HashAggregate))"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("props column not read", r"\A(?!.*ReadSchema: [^\n]*\bprops\b)"),
    ],
    "docs_curation_report": [
        # one scan → map-side expressions → one partial-agg shuffle on
        # source; nothing else
        ("partial aggregation", r"HashAggregate|ObjectHashAggregate"),
        ("no join", r"\A(?!.*Join)"),
        ("no window at all", r"\A(?!.*Window)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_mixture_solver": [
        # rates are plan literals by execution time (the solver runs on
        # the collected histogram): map-side filter only
        ("no join or window", r"\A(?!.*(?:Join|Window))"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_gopher_rules": [
        # one tokenize pass, pure JVM expressions: no join, no
        # aggregate, no window, no Python
        ("no join or aggregate", r"\A(?!.*(?:Join|HashAggregate))"),
        ("no window at all", r"\A(?!.*Window)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_incremental_dedup": [
        # candidates come from the band equi join between the new batch
        # and the history store — never new × history all-pairs; verify
        # explodes candidate docs only
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no nested-loop join", r"\A(?!.*BroadcastNestedLoopJoin)"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
    ],
    "docs_hybrid_rrf": [
        # the only window is brute_force_topk's per-query rank
        # (partitioned by query_id); fused rank comes from the bounded
        # array_sort+posexplode; top-n cuts are TakeOrderedAndProject
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("top-k not full sort", r"TakeOrderedAndProject"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_temperature_mixture": [
        # thresholds are plan literals by execution time: the kept-rows
        # scan is a pure map-side filter — no join, no window
        ("no join or window", r"\A(?!.*(?:Join|Window))"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
    ],
    "docs_llm_pipeline": [
        # the flagship chain ends in training-shard packing over the
        # PINNED surviving corpus (r7: the split table branches three
        # ways, and AQE drops cross-branch exchange reuse — the
        # localCheckpoint halves the full cycle, SCALING.md). The
        # decontamination broadcast therefore executes before the pin;
        # the final plan must read the pinned relation, keep per-bucket
        # windows only, and stay Python/cartesian-free.
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("pinned corpus relation", r"Scan ExistingRDD"),
    ],
    "docs_training_shards": [
        # prefix sum must stay decomposed: per-bucket windows only
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("text column not read", r"\A(?!.*ReadSchema: [^\n]*\btext\b)"),
    ],
    "events_hll_distinct": [
        # register maxima via map-side-combinable aggregation; the
        # whole sketch path stays JVM-side
        ("partial aggregation", r"HashAggregate|ObjectHashAggregate"),
        ("no python in executors", r"\A(?!.*BatchEvalPython)"),
        ("no cartesian product", r"\A(?!.*CartesianProduct)"),
        ("no unpartitioned window", r"\A(?!.*Window \[[^\n]*AS \S+\], \[[^\]\n]*(?:ASC|DESC))"),
    ],
}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    # AQE finalizes the physical plan only on execution; the executed
    # plan string carries WholeStageCodegen nodes and runtime-chosen
    # join strategies
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    return buf.getvalue() + "\n" + final


def shuffle_report(spark, qs, names: list[str]) -> None:
    """Prints exchanges/broadcasts/codegen-stage counts per query from
    the executed AQE-final plan — the 'how many shuffles am I paying'
    table behind SCALING.md."""
    print(f"{'query':26} {'exchanges':>9} {'broadcasts':>10} {'codegen':>8}")
    for name in names:
        df = qs[name](spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        ex = len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))
        bc = len(re.findall(r"BroadcastExchange|BroadcastQueryStage", plan))
        cg = len(set(re.findall(r"\*\((\d+)\)", plan)))
        print(f"{name:26} {ex:>9} {bc:>10} {cg:>8}")


def main() -> int:
    import __spark_entry__ as entry_mod
    from social_media_data_pipeline_spark.session import get_spark

    args = sys.argv[1:]
    spark = get_spark("explain_audit")
    qs = entry_mod.queries()
    if args and args[0] == "--shuffles":
        names = args[1:] or [
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
            "ngram_jaccard",
            "simhash",
            "sessionize",
            "embedding_topk",
            "embedding_ivf_topk",
        ]
        shuffle_report(spark, qs, names)
        return 0
    only = set(args)
    failures = 0
    for name, rules in EXPECTATIONS.items():
        if only and name not in only:
            continue
        plan = formatted_plan(qs[name](spark, SF_DIR))
        for rule, pattern in rules:
            ok = re.search(pattern, plan, re.MULTILINE | re.DOTALL) is not None
            print(f"{'PASS' if ok else 'FAIL'} {name}: {rule}")
            if not ok:
                failures += 1
                # show the scan/join lines for debugging
                for line in plan.splitlines():
                    if any(k in line for k in ("PushedFilters", "Join", "ReadSchema", "Exchange")):
                        print(f"      {line.strip()[:160]}")
    print(f"\n{failures} rule failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
