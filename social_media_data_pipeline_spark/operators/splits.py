"""Train/val/test splitting and deterministic shuffling — the two
ordering-sensitive steps a training-data pipeline runs after filtering
and dedup (SURVEY.md §2 training-pipeline extensions).

Both are keyed on a salted md5 fingerprint of a stable id, NOT on
`rand()`: re-running the pipeline on the same corpus (or an appended
corpus) must assign every existing document to the same split and the
same relative shuffle order, or downstream eval sets silently churn.

Scale notes
-----------
`assign_split` is pure map-side (no shuffle, no state): at 100 TB it
pipelines into whatever scan/filter precedes it and costs one md5 per
row. `deterministic_shuffle` needs a global order; Spark's
`row_number()` over an unpartitioned window would collapse to ONE task,
so positions are computed the scale-honest way: range-repartition on
the shuffle key (distributed sort), count rows per partition, and add
the (tiny, num-partitions-sized, driver-collected) running offsets to a
per-partition local rank. One shuffle total — the same exchange the
sort itself needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: salted 32-bit fingerprint in [0, 2^32): first 8 md5 hex chars.
#: Cross-engine reproducible — DuckDB spells it
#: ('0x' || substr(md5(seed || ':' || id), 1, 8))::bigint.


def fingerprint32(id_col: str, seed: str) -> F.Column:
    hexpart = F.substring(
        F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))), 1, 8
    )
    return F.conv(hexpart, 16, 10).cast("bigint")


_fingerprint = fingerprint32  # internal alias used below


def assign_split(
    df: DataFrame,
    id_col: str,
    seed: str = "split-v1",
    splits: Sequence[tuple[str, int]] = (("train", 80), ("val", 10), ("test", 10)),
) -> DataFrame:
    """Deterministic hash split: bucket = fingerprint % 100, carved by
    cumulative `splits` percentages (must sum to 100). Adding documents
    never moves an existing one between splits (per-doc, not rank-based).
    """
    total = sum(p for _, p in splits)
    if total != 100:
        raise ValueError(f"split percentages must sum to 100, got {total}")
    bucket = _fingerprint(id_col, seed) % 100
    expr = None
    acc = 0
    for name, pct in splits:
        acc += pct
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "shuffle-v1",
    num_buckets: int | None = None,
    pos_col: str = "shuffle_pos",
) -> DataFrame:
    """Global deterministic shuffle order: 1-based position of each row
    under `ORDER BY md5(seed:id), id` — what you write training shards
    in.

    The global rank is decomposed with fixed equal-width key ranges
    (md5 is uniform, so buckets are balanced) rather than
    `repartitionByRange`, whose sampled boundaries differ per
    execution and would desync the counts pass from the rank pass:

      bucket     = _skey // ceil(2^32 / num_buckets)   (pure function)
      offsets    = rows in all lower buckets (num_buckets-row collect,
                   map-side-combined aggregate, broadcast back as a map)
      pos        = offsets[bucket] + rank within bucket

    Ties broken by id, so positions are exact and reproducible. Cost at
    scale: one shuffle for the per-bucket window plus a negligible
    pre-aggregated counts pass over the pruned (_skey-only) scan.
    """
    n = num_buckets or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    width = (1 << 32) // n + 1
    keyed = df.withColumn("_skey", _fingerprint(id_col, seed)).withColumn(
        "_bucket", (F.col("_skey") / width).cast("int")
    )
    counts = keyed.groupBy("_bucket").count().collect()
    offsets = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["_bucket"]):
        offsets[r["_bucket"]] = acc
        acc += r["count"]
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    local = Window.partitionBy("_bucket").orderBy("_skey", id_col)
    return (
        keyed.withColumn(
            pos_col,
            (F.row_number().over(local) + off[F.col("_bucket")]).cast("bigint"),
        )
        .drop("_skey", "_bucket")
    )


def group_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    seed: str = "split-v1",
    splits: Sequence[tuple[str, int]] = (
        ("train", 80), ("val", 10), ("test", 10),
    ),
) -> DataFrame:
    """Leakage-FREE split constructor → (id, rep, split): every
    document is assigned by the salted fingerprint of its near-dup
    CLUSTER REPRESENTATIVE (min reachable id over the candidate `pairs`
    graph, via `connected_components`), so an entire near-dup clique
    lands in ONE split and the straddling pairs `split_leakage` audits
    for cannot exist by construction — the constructor/auditor pair
    (sklearn calls the idea GroupShuffleSplit; Lee et al. 2022 §6.2 is
    why it matters for training corpora: near-dups of held-out docs
    inflate eval scores unless the clique splits together).

    `pairs` is any (id_a, id_b) candidate frame — the caller picks the
    generator and its recall/cost point (lossless prefix filter, LSH
    bands, SNM, …; the blocking_quality query prices that choice).
    Documents untouched by any pair are their own representative (a
    left join + coalesce — singleton nodes never enter the CC).

    Append stability inherits from both ingredients: re-running on a
    grown corpus keeps every existing clique's min-id representative
    unless a NEW pair merges two cliques — in which case the merged
    clique genuinely must land in one split (re-keyed by the smaller
    rep), which is the correct churn, and exactly the churn
    `incremental_components` computes incrementally.

    Scale shape (100 TB): CC runs over the candidate-pair graph
    (pair-count-sized, never corpus-sized); the label join back is one
    hash join keyed on the doc id; the split itself stays the pure
    map-side md5 of `assign_split`."""
    from social_media_data_pipeline_spark.functions import graph

    comp = graph.connected_components(pairs, src="id_a", dst="id_b")
    labeled = (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("rep"),
        )
    )
    return assign_split(labeled, "rep", seed=seed, splits=splits)


def split_leakage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seed: str = "split-v1",
    splits: Sequence[tuple[str, int]] = (
        ("train", 80), ("val", 10), ("test", 10),
    ),
    jaccard_threshold: float = 0.6,
    shingle_k: int = 3,
) -> DataFrame:
    """Split-LEAKAGE audit → (train_id, holdout_id, holdout_split,
    jaccard): near-duplicate pairs that STRADDLE the train/holdout
    boundary — the eval-contamination mode that exact n-gram
    decontamination (`decontaminate`, `contamination_frac`) cannot
    see, because the leaked document is a PARAPHRASE-level near-dup of
    a held-out one, not a verbatim n-gram carrier (Lee et al. 2022 §6.2
    measure exactly this: near-dups of validation data inflate eval
    scores). The reference has no split tooling at all; this completes
    the engine's split family (assign_split / deterministic_shuffle /
    docs_split) with its integrity gate.

    Candidates come from the LOSSLESS prefix-filter Jaccard join
    (`ngram_jaccard_pairs_prefix` — every true pair ≥ threshold, hot
    shingles included), so a leak cannot hide behind doc-frequency
    pruning; the split sides are the deterministic `assign_split`
    buckets, map-side joined onto the candidate-count-sized pair set.
    Pairs inside one side (train↔train, holdout↔holdout) are dropped —
    they are dedup work, not leakage.

    Scale shape (100 TB): the pair join is the measured-flat prefix
    SSJoin; the split predicate is two broadcast-free map-side hash
    joins against the pair table (candidate-count-sized). Acting on
    the result is policy: drop the train member, or re-assign it to
    the holdout side (never the reverse — moving eval docs into train
    is the leak).
    """
    from social_media_data_pipeline_spark.functions import sketches

    pairs = sketches.ngram_jaccard_pairs_prefix(
        df, id_col, text_col, shingle_k=shingle_k,
        threshold=jaccard_threshold,
    )
    side = assign_split(
        df.select(id_col), id_col, seed=seed, splits=splits
    )
    sa = side.select(
        F.col(id_col).alias("id_a"), F.col("split").alias("__sa")
    )
    sb = side.select(
        F.col(id_col).alias("id_b"), F.col("split").alias("__sb")
    )
    joined = pairs.join(sa, "id_a").join(sb, "id_b").filter(
        (F.col("__sa") == "train") != (F.col("__sb") == "train")
    )
    train_first = F.col("__sa") == "train"
    return joined.select(
        F.when(train_first, F.col("id_a")).otherwise(F.col("id_b")).alias(
            "train_id"
        ),
        F.when(train_first, F.col("id_b")).otherwise(F.col("id_a")).alias(
            "holdout_id"
        ),
        F.when(train_first, F.col("__sb")).otherwise(F.col("__sa")).alias(
            "holdout_split"
        ),
        "jaccard",
    )
