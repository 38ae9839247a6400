"""Empirical scale-sensitivity check for the heavy dedup/sketch queries.

The 100 TB claim for every candidate-generation operator is "work grows
~linearly in corpus size" (blocked/bucketed equi-joins, never n²). This
tool MEASURES that on this machine: replicate the sf0.1 documents and
embeddings tables at 2×/4×/8×, run each heavy operator at every scale,
and report wall-time growth exponents (log-log slope between successive
scales; 1.0 = linear, 2.0 = quadratic).

Replication preserves the workload's per-copy structure while avoiding
cross-copy near-dups (which would grow pair counts quadratically in the
copy factor and measure the DATA's quadratic-ness, not the plan's):

- documents: every token gets a copy-specific suffix → shingles/tokens
  disjoint across copies → simhash/minhash/jaccard pairs scale linearly;
- embeddings: a copy-specific ±1 sign mask (flip coordinate i iff
  popcount(i & (k+1)) is odd) — an ORTHOGONAL transform, so every
  within-copy cosine is preserved exactly (the workload's near-dup
  structure replicates verbatim) while any two copies' product mask is
  balanced ±1 → cross-copy cosines stay near zero.

Writes replicas under <repo>/spark-warehouse/scale_sensitivity/ (local
scratch; removed on rerun). Usage:

    python tools/scale_sensitivity.py             # factors 1 2 4 8
    python tools/scale_sensitivity.py 1 2 4       # custom factors
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from social_media_data_pipeline_spark import io as eio  # noqa: E402
from social_media_data_pipeline_spark.functions import (  # noqa: E402
    similarity,
    sketches,
    text as etext,
)
from social_media_data_pipeline_spark.functions import bpe as ebpe  # noqa: E402
from social_media_data_pipeline_spark.functions import classifier as eclf  # noqa: E402
from social_media_data_pipeline_spark.functions import importance as eimp  # noqa: E402
from social_media_data_pipeline_spark.functions import kmeans as ekm  # noqa: E402
from social_media_data_pipeline_spark.functions import pq as epq  # noqa: E402
from social_media_data_pipeline_spark.functions import retrieval as eretr  # noqa: E402
from social_media_data_pipeline_spark.operators import dedup as ededup  # noqa: E402
from social_media_data_pipeline_spark.operators import sampling as esamp  # noqa: E402
from social_media_data_pipeline_spark.operators import packing as epack  # noqa: E402
from social_media_data_pipeline_spark.operators import splits as esplits  # noqa: E402
from social_media_data_pipeline_spark.session import get_spark  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(REPO, "spark-warehouse", "scale_sensitivity")


def replicate(spark, factor: int, out_dir: str) -> None:
    docs = eio.read_table(spark, BASE_SF, "documents")
    emb = eio.read_table(spark, BASE_SF, "embeddings").select("vec_id", "embedding")
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    doc_parts, emb_parts = [], []
    for k in range(factor):
        # tokens get a per-copy suffix: no shingle/token collides across
        # copies, so pair structure replicates instead of cross-linking
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * n_doc)).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", r"$1x%d" % k).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        # copy-specific sign flip (orthogonal → cosines preserved
        # within a copy, decorrelated across copies)
        def _mask_fn(_k):
            def _mask(x, i):
                odd = F.bit_count(i.bitwiseAND(F.lit(_k + 1))) % 2 == 1
                return F.when(odd, -x).otherwise(x).cast("float")

            return _mask

        _mask = _mask_fn(k)
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * n_vec)).alias("vec_id"),
                F.transform("embedding", _mask).alias("embedding"),
            )
        )
    docs_out = doc_parts[0]
    for p in doc_parts[1:]:
        docs_out = docs_out.unionByName(p)
    emb_out = emb_parts[0]
    for p in emb_parts[1:]:
        emb_out = emb_out.unionByName(p)
    docs_out.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    emb_out.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))


def heavy_queries(spark, sf_dir: str):
    """The scale-path operators, built directly (not via the registry —
    the registry reads all tables; replicas hold documents+embeddings)."""
    import math

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    centroids = similarity.select_ivf_centroids(emb, k=math.isqrt(2 * n), corpus_size=n)
    copies = emb.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(2.0)).cast("float")).alias(
            "embedding"
        ),
    )
    corpus = emb.unionByName(copies)
    # thunks, not DataFrames: deterministic_shuffle runs its bucket-counts
    # job at CONSTRUCTION time, so the plan must be rebuilt inside the
    # timed region for its measured cost to be the whole operator
    max_df = max(50, docs.count() // 10)
    return {
        "simhash_near_pairs": lambda: sketches.simhash_blocked_pairs(
            docs, "doc_id", "text", tau=3
        ),
        "minhash_lsh_pairs": lambda: sketches.minhash_lsh_pairs(docs, "doc_id", "text"),
        "ngram_jaccard_pruned": lambda: sketches.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.6, max_doc_freq=max_df
        ),
        "embedding_near_dup_ivf": lambda: similarity.cosine_near_dup_via_ivf(
            corpus, centroids, threshold=0.95, probes=2
        ),
        "docs_shuffle": lambda: esplits.deterministic_shuffle(docs, "doc_id").select(
            "doc_id", "shuffle_pos"
        ),
        "docs_unigram_logprob": lambda: etext.unigram_logprob(docs),
        # round 4: sub-document dedup — per-copy token suffixes keep
        # segment/window hashes disjoint across copies, so duplicate
        # structure (and output rows) replicate linearly by construction
        "docs_segment_dedup": lambda: ededup.segment_dedup(
            docs, "doc_id", "text", seg_tokens=8
        ),
        "docs_duplicate_spans": lambda: ededup.duplicate_spans(
            docs, "doc_id", "text", k=8, min_docs=2
        ),
        # round 5: selection/scoring/chunking — per-copy token suffixes
        # replicate the gram/bucket structure linearly
        "docs_dsir_weights": lambda: eimp.dsir_logweights(
            docs, F.col("lang") == "en", n_buckets=1024, alpha=0.5
        ),
        "docs_bigram_logprob": lambda: etext.bigram_logprob(docs),
        "docs_chunks": lambda: epack.chunk_documents(
            docs, chunk_tokens=24, overlap=8
        ),
        # trainable components: the whole train(+score) cycle runs at
        # construction (argmax/weight collects per round), so the thunk
        # rebuilds it inside the timed region like dedup_clusters
        "docs_bpe_merges": lambda: ebpe.bpe_train(docs, num_merges=10),
        "docs_quality_classifier": lambda: eclf.quality_scores(
            docs,
            eclf.logreg_train(
                docs, F.col("lang") == "en", n_buckets=256, iters=5
            ),
            n_buckets=256,
        ),
        # round 6: classifier scale lever — train on a BOUNDED
        # deterministic sample (absolute size held constant across
        # factors), score the full corpus in one broadcast pass; the
        # verdict's flatness claim is about TRAINING, so the growth
        # left here is the linear scoring scan
        "docs_classifier_sampled": lambda: eclf.quality_scores(
            docs,
            eclf.logreg_train(
                docs,
                F.col("lang") == "en",
                n_buckets=256,
                iters=5,
                sample_frac=min(1.0, 4000.0 / max(1, docs.count())),
            ),
            n_buckets=256,
        ),
        # round 5 (late) / round 6: semantic dedup now swept on the
        # PRODUCTION k ≈ √n centroid rule (matches the registered
        # query since r6 — cells stay ~√n, pair join n·√n);
        # PQ ADC (codebook collect + map-side encode + top-k)
        "embedding_semdedup": lambda: similarity.semdedup(
            emb,
            similarity.select_ivf_centroids(emb, corpus_size=n),
            threshold=0.3,
        ),
        "embedding_pq_topk": lambda: (
            lambda cb: epq.pq_adc_topk(
                emb.filter("vec_id < 5"), epq.pq_encode(emb, cb), cb, k=5
            )
        )(epq.pq_codebook(emb, m=8, ksub=16)),
        # round 8: the four r7 registrations that had shootout ratios
        # but no growth exponents. multiprobe IVF: centroid count and
        # query set held constant across factors (the production shape:
        # a bounded query batch against a growing corpus) — cells grow
        # linearly, so candidates = probes x cell grow linearly too.
        "embedding_ivf_topk_multiprobe": lambda: similarity.ivf_topk_multiprobe(
            emb.filter(F.col("vec_id") < 20),
            emb,
            # fixed deterministic centroid set (copy-0 ids exist at
            # every factor): cells grow with the corpus, centroids don't
            emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 1000)),
            k=5,
            probes=4,
        ),
        # hybrid RRF: fixed query, both arms scan the growing corpus,
        # fusion joins two bounded top-n lists — expected ~linear
        # terms carry the copy-0 suffix the replicator stamps on every
        # token, so the lexical arm matches copy 0 (fixed postings)
        # while both arms SCAN the growing corpus
        "docs_hybrid_rrf": lambda: eretr.hybrid_rrf_topk(
            docs, emb, ["sparkx0", "windowx0", "hashx0"],
            query_vec_id=7, k=10,
        ),
        # temperature mixture: histogram aggregate + map-side draw —
        # expected ~linear (histogram collect is per-source, bounded)
        "docs_temperature_mixture": lambda: esamp.temperature_mixture_sample(
            docs, "source", "doc_id"
        ).select("doc_id", "source"),
        # gopher rules: one tokenize pass, pure JVM expressions —
        # expected ~linear (the flattest legitimate shape here)
        "docs_ccnet_buckets": lambda: etext.ccnet_buckets(docs),
        # eval split = md5-bucket 5% of the replicated corpus (doc_ids
        # are offset per copy, so the eval set grows linearly too)
        "docs_contamination_frac": lambda: ededup.contamination_fraction(
            docs.filter(
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                    16, 10,
                ).cast("bigint") % 20 != 0
            ),
            docs.filter(
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                    16, 10,
                ).cast("bigint") % 20 == 0
            ),
            "doc_id", "text", k=8,
        ),
        "docs_decontaminate_spans": lambda: ededup.decontaminate_spans(
            docs.filter(
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                    16, 10,
                ).cast("bigint") % 20 != 0
            ),
            docs.filter(
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                    16, 10,
                ).cast("bigint") % 20 == 0
            ),
            "doc_id", "text", k=4,
        ),
        "docs_gopher_rules": lambda: docs.select(
            "doc_id", etext.gopher_quality_flags("text").alias("g")
        ).select("doc_id", "g.word_count", "g.passes"),
        # round 8 (late): per-shard sequential BFD — 32 shards so the
        # Arrow batches stay bounded while replicas grow; expected
        # exponent ~1 (per-shard work linear in shard size)
        "docs_pack_bfd": lambda: epack.pack_bestfit(
            docs.select("doc_id", "n_chars"),
            "doc_id",
            F.greatest(F.lit(1), F.expr("n_chars div 4")),
            budget=512,
            n_shards=32,
        ),
        # round 6: distributed Lloyd training — fixed rounds, each a
        # full assignment scan + (cluster, dim) partial agg: expected
        # exponent ~1 (linear per round), the honest k-means shape
        "kmeans_train": lambda: ekm.kmeans_model_df(emb, iters=3),
        # round 8 (late): cluster-balanced sample — trained cells +
        # broadcast argmax assignment + per-cluster window cap; the
        # output is capped at 5 x cells, so work is assignment-linear
        "embedding_balanced_sample": lambda: esamp.sample_n_per_group(
            similarity.ivf_assign(
                emb, ekm.kmeans_centroids(emb, iters=3)
            ).select("vec_id", "cluster"),
            F.col("cluster"),
            "vec_id",
            5,
            seed="balanced-v1",
        ),
    }


def skew_mode(spark, factor: int = 8, hot_frac: float = 0.10) -> int:
    """Planted power-law key demonstration for the sessionize/funnel
    family: replicate sf0.1 events `factor`× (event_id/ts offsets keep
    per-copy structure), then reassign `hot_frac` of ALL events to one
    user id. Times each operator on the uniform vs skewed variant —
    the 100 TB question is whether wall-time stays bounded when one key
    concentrates (AQE cannot split a Window partition, so the bare
    sessionize is expected to degrade; sessionize_bounded and the
    (user, day)-keyed funnel must not)."""
    from social_media_data_pipeline_spark.operators import aggregates as eagg
    from social_media_data_pipeline_spark.streaming import events as sev

    ev = eio.read_table(spark, BASE_SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n = ev.count()
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(k * n)).alias("event_id"),
            # shift each copy by its own year so copies do not merge
            # into the same sessions/user-days
            (F.col("ts") + F.expr(f"INTERVAL {k * 366} DAYS")).alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        for k in range(factor)
    ]
    uniform = parts[0]
    for p in parts[1:]:
        uniform = uniform.unionByName(p)
    skew_dir = os.path.join(SCRATCH, "skew")
    uniform.write.mode("overwrite").parquet(os.path.join(skew_dir, "uniform.parquet"))
    # plant the power-law user: hot_frac of all events on ONE key,
    # selected by a deterministic fingerprint of the event id
    skewed = uniform.withColumn(
        "user_id",
        F.when(
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 1000
            < int(hot_frac * 1000),
            F.lit(1),
        ).otherwise(F.col("user_id")),
    )
    skewed.write.mode("overwrite").parquet(os.path.join(skew_dir, "skewed.parquet"))

    queries = {
        "sessionize_window": lambda df: sev.sessionize(
            df, gap_minutes=30, tie_break="event_id"
        ).select("event_id", "session_id"),
        "sessionize_bounded": lambda df: sev.sessionize_bounded(
            df, gap_minutes=30, tie_break="event_id", chunk_hours=6
        ).select("event_id", "session_id"),
        "events_funnel": lambda df: eagg.funnel_stages(df),
    }
    print(
        f"skew sweep: {factor}x events ({n * factor} rows), hot user holds "
        f"{hot_frac:.0%} of all events\n"
    )
    print(f"{'query':22s} {'uniform':>9s} {'skewed':>9s} {'ratio':>7s}")
    for name, make in queries.items():
        times = {}
        for variant in ("uniform", "skewed"):
            df_in = spark.read.parquet(os.path.join(skew_dir, f"{variant}.parquet"))
            make(df_in).write.mode("overwrite").format("noop").save()  # warm
            times[variant] = min(
                _timed(
                    lambda: make(df_in).write.mode("overwrite").format("noop").save()
                )
                for _ in range(2)
            )
        ratio = times["skewed"] / times["uniform"]
        print(
            f"{name:22s} {times['uniform']:>8.2f}s {times['skewed']:>8.2f}s "
            f"{ratio:>6.2f}x"
        )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


def skew_join_mode(spark, factor: int = 8, hot_frac: float = 0.30) -> int:
    """Planted hot-JOIN-key demonstration for `joins.salted_join`:
    replicate sf0.1 events `factor`×, plant `hot_frac` of all rows on
    ONE user id, join against a per-user dim with broadcast DISABLED
    (forcing the shuffle join a big dim would force at 100 TB). Three
    configurations:

    - plain / AQE-skew-off — the baseline straggler: the hot key's
      rows land in one sort-merge partition.
    - salted (hybrid, 32 salts) / AQE-skew-off — the operator under
      test: hot key spread by content hash, dim replicated per salt.
    - plain / AQE-skew-on — Spark's built-in repair, with the local
      thresholds lowered so the split actually triggers at this data
      size (defaults need a 256 MB partition).

    The honest claim is NOT "salting beats AQE" — it's that salting
    matches AQE where AQE applies, and remains available where it
    does not (stream-stream joins, downstream agg skew, AQE-off
    engines)."""
    from social_media_data_pipeline_spark.operators import joins as ejoins

    ev = eio.read_table(spark, BASE_SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n = ev.count()
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(k * n)).alias("event_id"),
            "user_id",
            "value",
        )
        for k in range(factor)
    ]
    fact = parts[0]
    for p in parts[1:]:
        fact = fact.unionByName(p)
    skewed = fact.withColumn(
        "user_id",
        F.when(
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 1000
            < int(hot_frac * 1000),
            F.lit(1),
        ).otherwise(F.col("user_id")),
    )
    skew_dir = os.path.join(SCRATCH, "skewjoin")
    skewed.write.mode("overwrite").parquet(os.path.join(skew_dir, "fact.parquet"))
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("segment", F.concat(F.lit("seg-"), (F.col("user_id") % 7)))
    )
    dim.write.mode("overwrite").parquet(os.path.join(skew_dir, "dim.parquet"))

    fact_df = spark.read.parquet(os.path.join(skew_dir, "fact.parquet"))
    dim_df = spark.read.parquet(os.path.join(skew_dir, "dim.parquet"))
    hot = spark.createDataFrame([(1,)], "user_id bigint")

    def plain():
        return fact_df.join(dim_df, "user_id")

    def salted():
        return ejoins.salted_join(fact_df, dim_df, "user_id", n_salts=32, hot_keys=hot)

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    print(
        f"skew-join sweep: {factor}x events ({n * factor} rows), hot user holds "
        f"{hot_frac:.0%} of fact rows; broadcast disabled\n"
    )
    print(f"{'configuration':28s} {'seconds':>8s}")
    results = {}
    cases = [
        ("plain, AQE skew off", plain, False),
        ("salted_join(32), skew off", salted, False),
        ("plain, AQE skew on", plain, True),
    ]
    for label, make, aqe_skew in cases:
        conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        if aqe_skew:
            conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
            )
            conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        make().write.mode("overwrite").format("noop").save()  # warm
        best = min(
            _timed(lambda: make().write.mode("overwrite").format("noop").save())
            for _ in range(2)
        )
        results[label] = best
        print(f"{label:28s} {best:>7.2f}s")
    for k, v in saved.items():
        if v is None:
            conf.unset(k)
        else:
            conf.set(k, v)
    # row-identity spot check while the frames are in hand
    assert sorted(map(tuple, plain().collect())) == sorted(
        map(tuple, salted().collect())
    ), "salted_join result diverged from plain join"
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


def skew_dedup_mode(spark, factor: int = 4, hot_frac: float = 0.05) -> int:
    """Planted hot-key demonstration for the DEDUP PAIR JOINS — the
    paths where the hot key is a JOIN key (LSH band bucket, shingle),
    not a window key. The plant is the realistic one: `hot_frac` of all
    documents become byte-identical boilerplate, so one band bucket and
    every boilerplate shingle go hot.

    What the rows demonstrate:
    - lsh_pairs (naive): a hot bucket of h identical docs emits h²/2
      candidate pairs — the blow-up is the OUTPUT, so no join strategy
      (AQE skew-split, salting) can bound it. The quadratic ratio
      printed here is the disease, measured.
    - lsh_pairs_dedup_first: the structural cure — collapse identical
      texts first (md5 groupBy, linear), run LSH over the ~h× smaller
      representative set; duplicate membership stays a linear column.
      Ratio vs uniform must stay bounded.
    - ngram_jaccard (pruned): hot shingles are stop-shingles; the
      max_doc_freq prefilter drops them BEFORE the self-join. Bounded.
      (The unpruned variant is the same disease as naive LSH and is
      omitted — its output alone is quadratic.)

    AQE's skew-join split (spark.sql.adaptive.skewJoin.*) stays enabled
    throughout; it splits oversized JOIN partitions at real partition
    sizes (256 MB-class), which this local corpus never reaches — the
    measured levers here are the structural ones, which is the point:
    for dedup pair joins, partition splitting cannot fix a quadratic
    pair OUTPUT, only composition (dedup-first) and pruning can.
    """
    docs = eio.read_table(spark, BASE_SF, "documents").select("doc_id", "text")
    n = docs.count()
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
            # copy-suffix tokens: cross-copy shingles stay disjoint
            F.regexp_replace("text", r"(\w+)", rf"$1x{k}").alias("text")
            if k
            else F.col("text"),
        )
        for k in range(factor)
    ]
    uniform = parts[0]
    for p in parts[1:]:
        uniform = uniform.unionByName(p)
    skew_dir = os.path.join(SCRATCH, "skew_dedup")
    uniform.write.mode("overwrite").parquet(os.path.join(skew_dir, "uniform.parquet"))
    boiler = "subscribe to our newsletter for updates terms of service apply all rights reserved"
    skewed = uniform.withColumn(
        "text",
        F.when(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 1000
            < int(hot_frac * 1000),
            F.lit(boiler),
        ).otherwise(F.col("text")),
    )
    skewed.write.mode("overwrite").parquet(os.path.join(skew_dir, "skewed.parquet"))

    def lsh_naive(df):
        return sketches.minhash_lsh_pairs(df, "doc_id", "text", num_hashes=16, bands=4)

    def lsh_dedup_first(df):
        reps = (
            df.groupBy(F.md5("text").alias("__h"))
            .agg(F.min("doc_id").alias("doc_id"), F.first("text").alias("text"))
            .drop("__h")
        )
        return sketches.minhash_lsh_pairs(reps, "doc_id", "text", num_hashes=16, bands=4)

    def jaccard_pruned(df):
        return sketches.ngram_jaccard_pairs(
            df, "doc_id", "text", shingle_k=3, threshold=0.8, max_doc_freq=50
        )

    def jaccard_prefix(df):
        # the LOSSLESS cure for the same hot-shingle disease: exact
        # result (boilerplate dup pairs INCLUDED — h²/2 of them here,
        # so its output is the honest quadratic the pruned variant
        # silently drops), but the join fans out only on prefix
        # membership: a stop-shingle enters a doc's prefix only when
        # the doc has nothing rarer
        return sketches.ngram_jaccard_pairs_prefix(
            df, "doc_id", "text", shingle_k=3, threshold=0.8
        )

    queries = {
        "lsh_pairs_naive": lsh_naive,
        "lsh_pairs_dedup_first": lsh_dedup_first,
        "ngram_jaccard_pruned": jaccard_pruned,
        "ngram_jaccard_prefix": jaccard_prefix,
    }
    print(
        f"dedup skew sweep: {factor}x documents ({n * factor} rows), "
        f"{hot_frac:.0%} of docs are one identical boilerplate text\n"
    )
    print(f"{'query':24s} {'uniform':>9s} {'skewed':>9s} {'ratio':>7s}  rows(u/s)")
    for name, make in queries.items():
        times, counts = {}, {}
        for variant in ("uniform", "skewed"):
            df_in = spark.read.parquet(os.path.join(skew_dir, f"{variant}.parquet"))
            make(df_in).write.mode("overwrite").format("noop").save()  # warm
            times[variant] = min(
                _timed(
                    lambda: make(df_in).write.mode("overwrite").format("noop").save()
                )
                for _ in range(2)
            )
            counts[variant] = make(df_in).count()
        ratio = times["skewed"] / times["uniform"]
        print(
            f"{name:24s} {times['uniform']:>8.2f}s {times['skewed']:>8.2f}s "
            f"{ratio:>6.2f}x  {counts['uniform']}/{counts['skewed']}"
        )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


def _stage_straggler(spark, min_stage: int) -> tuple[float, int]:
    """Worst within-stage task imbalance (p100/p50 executorRunTime)
    over stages with id > `min_stage`, via the UI REST API (the
    skew-graph session enables the UI for exactly this). Returns
    (ratio, max_stage_id_seen); (nan, min_stage) if unavailable.
    Stages with < 4 tasks or a sub-200ms max task are skipped — a
    2-task stage's p100/p50 is noise, not a straggler."""
    import json
    import urllib.request

    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{app}/stages?status=complete"
            "&withSummaries=true&quantiles=0.0,0.5,1.0",
            timeout=10,
        ) as r:
            stages = json.load(r)
    except Exception:
        return float("nan"), min_stage
    worst, top = 0.0, min_stage
    for st in stages:
        sid = st.get("stageId", -1)
        top = max(top, sid)
        if sid <= min_stage or st.get("numCompleteTasks", 0) < 4:
            continue
        dist = (st.get("taskMetricsDistributions") or {}).get(
            "executorRunTime"
        )
        if not dist or len(dist) < 3:
            continue
        _, p50, p100 = dist[0], dist[1], dist[2]
        if p100 < 200 or p50 <= 0:
            continue
        worst = max(worst, p100 / p50)
    return worst, top


def skew_graph_mode(
    spark, n_nodes: int = 400_000, m_edges: int = 1_200_000
) -> int:
    """Planted power-law-hub sweep for the GRAPH family (r8 verdict
    Next #5): triangles, k-core, LPA, and weighted PageRank are argued
    skew-safe by construction (degree-ordered orientation, partial
    degree aggregates, (node,label) pre-agg, src-partitioned
    contributions) but were measured only on near-uniform co-purchase
    graphs. This plants the celebrity: a synthetic uniform random
    graph (deterministic xxhash64 endpoints — no rand(), the salted-
    join lesson) vs the same graph plus ONE hub node receiving 10% /
    30% of all edge rows from random sources.

    Reported per cell: wall seconds, wall per million edge rows (the
    hub variants carry more edges — the honest comparison is
    per-edge), and the worst within-stage p100/p50 task-time ratio
    from the REST API (the straggler itself, not just its wall-clock
    shadow).

    A hub holding 30% of edge rows concentrates ~n(1-e^-λ) DISTINCT
    neighbors after dedup (λ = hub_rows/n_nodes) — at the default
    sizes ≈ 290k of 400k nodes, i.e. a degree ~10⁵× the mean. The
    'curse of the last reducer' contrast (Suri–Vassilvitskii): a
    separate small config additionally times the NAIVE wedge join
    (wedges generated at every center node — the hub center alone
    emits deg²/2 wedges) against the degree-ordered implementation on
    the identical graph; the naive cell is kept small because its hub
    wedge count is ~10⁸ already at a 14k-degree hub.
    """
    from social_media_data_pipeline_spark.functions import graph as egraph

    skew_dir = os.path.join(SCRATCH, "skew_graph")

    def gen(n: int, m: int, hub_frac: float, path: str) -> None:
        base = spark.range(m).select(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n)).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n)).alias("dst"),
        )
        if hub_frac > 0.0:
            h = int(m * hub_frac / (1.0 - hub_frac))
            hub = spark.range(h).select(
                F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n)).alias("src"),
                F.lit(n).cast("bigint").alias("dst"),
            )
            base = base.unionByName(hub)
        base.write.mode("overwrite").parquet(path)

    def tri(df):
        return egraph.triangle_counts(df)

    def tri_naive(df):
        und = (
            df.select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        sym = und.selectExpr("a AS u", "b AS v").unionByName(
            und.selectExpr("b AS u", "a AS v")
        )
        wedges = (
            sym.selectExpr("u", "v AS v1")
            .join(sym.selectExpr("u", "v AS v2"), "u")
            .filter(F.col("v1") < F.col("v2"))
        )
        tri_ = wedges.join(
            und.selectExpr("a AS v1", "b AS v2"), ["v1", "v2"]
        )
        return (
            tri_.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("tri_cnt"))
        )

    def kcore(df):
        return egraph.kcore(df, k=3, rounds=8)

    def lpa(df):
        return egraph.label_propagation(df, rounds=4)

    def pr_w(df):
        return egraph.pagerank(
            df.withColumn("w", F.lit(1)), iters=5, weight_col="w"
        )

    ops = {
        "triangles_oriented": tri,
        "kcore_k3": kcore,
        "lpa_r4": lpa,
        "pagerank_weighted": pr_w,
    }
    fracs = [0.0, 0.10, 0.30]
    print(
        f"graph hub-skew sweep: n={n_nodes} nodes, m={m_edges} uniform "
        f"edge rows; hub variants add rows until the hub holds "
        f"10% / 30% of all edge rows\n"
    )
    print(
        f"{'op':20s} {'hub':>5s} {'Medges':>7s} {'wall':>7s} "
        f"{'s/Medge':>8s} {'straggle':>9s}"
    )
    stage_hi = -1
    for frac in fracs:
        path = os.path.join(skew_dir, f"hub{int(frac * 100)}")
        gen(n_nodes, m_edges, frac, path)
        edges = spark.read.parquet(path)
        m_rows = edges.count()
        for name, make in ops.items():
            make(edges).write.mode("overwrite").format("noop").save()  # warm
            _, stage_hi = _stage_straggler(spark, stage_hi)
            t = min(
                _timed(
                    lambda: make(edges)
                    .write.mode("overwrite")
                    .format("noop")
                    .save()
                )
                for _ in range(2)
            )
            straggle, stage_hi = _stage_straggler(spark, stage_hi)
            print(
                f"{name:20s} {frac:>4.0%} {m_rows / 1e6:>6.2f}M "
                f"{t:>6.2f}s {t / (m_rows / 1e6):>7.2f}s "
                f"{straggle:>8.1f}x",
                flush=True,
            )
    # --- curse-of-the-last-reducer contrast, small config ---
    n_s, m_s = (
        int(x)
        for x in os.environ.get("SMDP_GRAPH_SMALL", "50000,150000").split(",")
    )
    import math

    h_s = int(m_s * 0.10 / 0.90)
    deg_s = int(n_s * (1.0 - math.exp(-h_s / n_s)))
    print(
        f"\nnaive-wedge contrast: n={n_s}, m={m_s} (hub degree after "
        f"dedup ~{deg_s}; naive hub wedge count ~{deg_s * deg_s // 2:.1e})"
    )
    print(f"{'op':20s} {'hub':>5s} {'wall':>7s} {'straggle':>9s}")
    for frac in (0.0, 0.10):
        path = os.path.join(skew_dir, f"small{int(frac * 100)}")
        gen(n_s, m_s, frac, path)
        edges = spark.read.parquet(path)
        def ra_uncapped(df):
            return egraph.link_predict_ra(df)

        def ra_capped(df):
            # the cap is ALSO the metric's logic: a 14k-degree center
            # contributes ra ≈ 1e6/14000 ≈ 71 micro per pair — noise —
            # while costing deg²/2 wedge rows
            return egraph.link_predict_ra(df, max_center_degree=256)

        for name, make in (
            ("triangles_oriented", tri),
            ("triangles_naive", tri_naive),
            ("link_ra_uncapped", ra_uncapped),
            ("link_ra_capped256", ra_capped),
        ):
            _, stage_hi = _stage_straggler(spark, stage_hi)
            t = _timed(
                lambda: make(edges).write.mode("overwrite").format("noop").save()
            )
            straggle, stage_hi = _stage_straggler(spark, stage_hi)
            print(
                f"{name:20s} {frac:>4.0%} {t:>6.2f}s {straggle:>8.1f}x",
                flush=True,
            )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


def ppr_growth_mode(spark, factors=(1, 4, 8)) -> int:
    """Seed-locality growth check for `personalized_pagerank` vs global
    `pagerank` (both weighted, 4 rounds) on N× disjoint replicas of the
    sf0.1 co-purchase graph, seeds fixed to Brand#11's copy-0 parts.

    The claim under test: PPR's per-round rank table stays TOUCHED-SET
    sized while global PR's is |V|-sized — so as the graph grows ×N
    with the workload (new independent regions), PPR pays only the
    edge-scan side of each round's join, and its output stays constant
    where global PR's output (and rank shuffle) grows ×N."""
    from social_media_data_pipeline_spark.functions import graph as egraph

    li0 = eio.read_table(spark, BASE_SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = eio.read_table(spark, BASE_SF, "part")
    seeds = part.filter(F.col("p_brand") == "Brand#11").select(
        F.col("p_partkey").alias("node")
    )
    n_ord = li0.agg(F.max("l_orderkey")).collect()[0][0] + 1
    n_part = li0.agg(F.max("l_partkey")).collect()[0][0] + 1
    print(f"{'variant':16s} {'N':>3s} {'edges':>9s} {'wall':>7s} {'out_rows':>9s}")
    for n in factors:
        reps = [
            li0.select(
                (F.col("l_orderkey") + F.lit(k * n_ord)).alias("l_orderkey"),
                (F.col("l_partkey") + F.lit(k * n_part)).alias("l_partkey"),
            )
            for k in range(n)
        ]
        li = reps[0]
        for p in reps[1:]:
            li = li.unionByName(p)
        path = os.path.join(SCRATCH, f"ppr_{n}")
        li.write.mode("overwrite").parquet(path)
        li = spark.read.parquet(path)
        und = egraph.project_bipartite(
            li, "l_orderkey", "l_partkey", min_support=2, keep_support=True
        )
        sym = und.unionByName(
            und.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "sup"
            )
        ).localCheckpoint(eager=True)
        m = sym.count()
        for label, make in (
            ("ppr_seeded", lambda: egraph.personalized_pagerank(
                sym, seeds, iters=4, weight_col="sup")),
            ("pagerank_global", lambda: egraph.pagerank(
                sym, iters=4, weight_col="sup")),
        ):
            t = _timed(
                lambda: make().write.mode("overwrite").format("noop").save()
            )
            rows = make().count()
            print(
                f"{label:16s} {n:>3d} {m:>9d} {t:>6.2f}s {rows:>9d}",
                flush=True,
            )
        shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


def layout_mode(spark, factor: int = 8) -> int:
    """Z-order layout pruning demo on the REAL events table: replicate
    sf0.1 events `factor`× (per-copy day offsets), write (a) the naive
    arrival layout (sorted by ts — tight stats on day, none on user) and
    (b) the Morton layout on (user_id, day), same file count. Then probe
    a 2-D box (one user decile × one month) through the file-skipping
    index and report files read + wall time for each layout. The file
    fraction IS the 100 TB scan saving — the layout job is a one-time
    linear write, exactly Delta/Iceberg OPTIMIZE ZORDER."""
    from social_media_data_pipeline_spark import scale as escale

    ev = eio.read_table(spark, BASE_SF, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    n = ev.count()
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(k * n)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {k * 31} DAYS")).alias("ts"),
            "user_id",
            "value",
        )
        for k in range(factor)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.withColumn(
        "day", F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    )
    num_files = 64
    nat_path = os.path.join(SCRATCH, "layout_natural")
    z_path = os.path.join(SCRATCH, "layout_zorder")
    t0 = time.time()
    (
        big.repartitionByRange(num_files, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(nat_path)
    )
    t_nat = time.time() - t0
    t0 = time.time()
    escale.write_zordered(
        big, z_path, ["user_id", "day"], bits=16, num_files=num_files
    )
    t_z = time.time() - t0
    lo_u, hi_u = 10, 19
    day0 = big.agg(F.min("day")).collect()[0][0]
    preds = {"user_id": (lo_u, hi_u), "day": (day0 + 40, day0 + 69)}
    print(
        f"layout demo: {n * factor} events, {num_files} files each; "
        f"write natural {t_nat:.1f}s vs zorder {t_z:.1f}s"
    )
    print(f"box predicate: user_id in [{lo_u},{hi_u}], one month of days\n")
    print(f"{'layout':10s} {'files read':>10s} {'of':>4s} {'scan_s':>7s} {'rows':>8s}")
    for label, path in (("natural", nat_path), ("zorder", z_path)):
        idx = escale.file_skipping_index(spark, path, ["user_id", "day"])
        pruned = escale.pruned_read(spark, idx, preds)
        pruned.write.mode("overwrite").format("noop").save()  # warm
        t0 = time.time()
        pruned = escale.pruned_read(spark, idx, preds)
        pruned.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        n_files = idx.count()
        cond = F.lit(True)
        for c, (lo, hi) in preds.items():
            cond = cond & (F.col(f"max_{c}") >= lo) & (F.col(f"min_{c}") <= hi)
        hit = idx.filter(cond).count()
        rows = pruned.count()
        print(f"{label:10s} {hit:>10d} {n_files:>4d} {dt:>6.2f}s {rows:>8d}")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--layout":
        spark = get_spark(
            "scale-sensitivity",
            extra_conf={
                "spark.driver.memory": os.environ.get("SMDP_SCALE_MEM", "12g")
            },
        )
        shutil.rmtree(SCRATCH, ignore_errors=True)
        factor = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        return layout_mode(spark, factor)
    if len(sys.argv) > 1 and sys.argv[1] == "--skew-join":
        spark = get_spark(
            "scale-sensitivity",
            extra_conf={
                "spark.driver.memory": os.environ.get("SMDP_SCALE_MEM", "12g")
            },
        )
        shutil.rmtree(SCRATCH, ignore_errors=True)
        factor = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.30
        return skew_join_mode(spark, factor, frac)
    if len(sys.argv) > 1 and sys.argv[1] == "--skew-graph":
        spark = get_spark(
            "scale-sensitivity",
            extra_conf={
                "spark.driver.memory": os.environ.get("SMDP_SCALE_MEM", "12g"),
                # the straggler probe reads task-time quantiles off the
                # UI REST API — this mode alone pays the UI overhead
                "spark.ui.enabled": "true",
            },
        )
        shutil.rmtree(SCRATCH, ignore_errors=True)
        n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
        m_edges = int(sys.argv[3]) if len(sys.argv) > 3 else 1_200_000
        return skew_graph_mode(spark, n_nodes, m_edges)
    if len(sys.argv) > 1 and sys.argv[1] == "--ppr-growth":
        spark = get_spark(
            "scale-sensitivity",
            extra_conf={
                "spark.driver.memory": os.environ.get("SMDP_SCALE_MEM", "12g")
            },
        )
        shutil.rmtree(SCRATCH, ignore_errors=True)
        factors = tuple(int(a) for a in sys.argv[2:]) or (1, 4, 8)
        return ppr_growth_mode(spark, factors)
    if len(sys.argv) > 1 and sys.argv[1] == "--skew-dedup":
        spark = get_spark(
            "scale-sensitivity",
            extra_conf={
                "spark.driver.memory": os.environ.get("SMDP_SCALE_MEM", "12g")
            },
        )
        shutil.rmtree(SCRATCH, ignore_errors=True)
        factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
        return skew_dedup_mode(spark, factor, frac)
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        spark = get_spark(
            "scale-sensitivity",
            extra_conf={
                "spark.driver.memory": os.environ.get("SMDP_SCALE_MEM", "12g")
            },
        )
        shutil.rmtree(SCRATCH, ignore_errors=True)
        factor = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.10
        return skew_mode(spark, factor, frac)
    factors = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    # the default 1g driver heap OOMs on the 8x pair joins (local[...]
    # runs executors in the driver JVM); must be set before JVM launch
    spark = get_spark(
        "scale-sensitivity",
        extra_conf={"spark.driver.memory": os.environ.get("SMDP_SCALE_MEM", "12g")},
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    results: dict[str, dict[int, float]] = {}
    rows: dict[str, dict[int, int]] = {}
    only = {
        s for s in os.environ.get("SMDP_SCALE_ONLY", "").split(",") if s.strip()
    }
    for f in factors:
        sf_dir = os.path.join(SCRATCH, f"x{f}")
        replicate(spark, f, sf_dir)
        for name, make in heavy_queries(spark, sf_dir).items():
            if only and name not in only:
                continue
            df = make()
            df.write.mode("overwrite").format("noop").save()  # warm codegen
            best = min(
                _timed(lambda: make().write.mode("overwrite").format("noop").save())
                for _ in range(2)
            )
            results.setdefault(name, {})[f] = best
            rows.setdefault(name, {})[f] = df.count()
            print(f"  x{f} {name}: {best:.2f}s {rows[name][f]} rows", flush=True)
    print(f"\nbase={BASE_SF}  factors={factors}  (seconds, best of 2; rows)")
    print(f"{'query':26s} " + " ".join(f"{f:>10d}x" for f in factors) + "   growth-exp")
    import math

    for name, times in results.items():
        exps = [
            math.log(times[factors[i + 1]] / times[factors[i]])
            / math.log(factors[i + 1] / factors[i])
            for i in range(len(factors) - 1)
            if times[factors[i]] > 0
        ]
        cells = " ".join(f"{times[f]:>10.2f}" for f in factors)
        rcells = "/".join(str(rows[name][f]) for f in factors)
        print(f"{name:26s} {cells}   {max(exps):.2f}  rows {rcells}")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    sys.exit(main())
