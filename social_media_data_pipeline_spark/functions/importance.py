"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
public paper): select raw-corpus documents whose hashed n-gram profile
looks like a TARGET corpus, by importance weights under bag-of-hashed-
n-grams unigram models of target vs raw.

The reference pipeline filters rows by predicates only
(`Preprocessor.py`); DSIR is the distribution-matching selection step a
pretraining-data pipeline runs before mixing. Everything here is
deterministic and md5-derived so the DuckDB oracle can replay it
bit-for-bit (same policy as `functions/sketches.py`).

Scale shape (100 TB): one map-side explode of hashed grams feeds
(a) the two bucket-count aggregates — both map-side combinable,
shuffling at most `n_buckets` partials per map partition — and (b) the
per-doc weight sum. The bucket log-ratio table is `n_buckets` rows
(constant, default 1024) and broadcasts; the per-doc sum groups on
doc_id. No join is ever bigger than corpus × 1 broadcast row; nothing
is quadratic. Resampling adds a Gumbel key per doc (map-side md5 draw,
the `fingerprint32` pattern from `operators/splits.py`) and a global
top-k, which Spark executes as TakeOrderedAndProject (per-partition
heaps, no full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from social_media_data_pipeline_spark.functions.text import tokenize
from social_media_data_pipeline_spark.operators.splits import fingerprint32


def hashed_grams(text_col: str | Column, n_buckets: int = 1024) -> Column:
    """text → array<int> of hashed-(uni+bi)gram feature buckets.

    Buckets are `conv(substr(md5(gram), 1, 8), 16, 10) % n_buckets` —
    replayable in DuckDB as `('0x' || substr(md5(g), 1, 8))::BIGINT %
    n_buckets`. Map-side only (no shuffle to build features).
    """
    toks = tokenize(text_col)
    n_bi = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n_bi),
        F.slice(toks, 2, n_bi),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams,
        lambda g: (F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint") % n_buckets).cast(
            "int"
        ),
    )


def dsir_logweights(
    df: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document DSIR log importance weight.

    Fits two smoothed unigram models over hashed n-gram buckets — the
    TARGET model on rows where `target_pred` holds, the RAW model on
    every row — and scores EVERY document with

        logw(d) = Σ_{g ∈ grams(d)} [ ln((t_b + α)/(T + αB))
                                     - ln((r_b + α)/(R + αB)) ]

    (b = bucket(g); t/r = bucket occurrence counts; T/R = totals;
    B = n_buckets). High logw ⇒ the document looks more like the target
    distribution than the raw one.

    Returns (id_col, n_grams, dsir_logw) with the weight rounded 4 dp
    after the aggregate (cross-engine fp policy).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"smoothing alpha must be > 0, got {alpha}")
    feats = df.select(
        F.col(id_col),
        target_pred.alias("__is_target"),
        F.explode(hashed_grams(text_col, n_buckets)).alias("b"),
    )
    # pre-aggregate to (doc, bucket) counts FIRST: the per_doc exchange
    # subtree is identical in both consumers below, so ReuseExchange
    # computes the explode+md5 feature pass ONCE (the flat-feats form
    # re-ran it per consumer — measured 2.17 s → 1.72 s at sf0.1), and
    # everything downstream shuffles (doc, bucket) partials instead of
    # raw gram occurrences
    per_doc = feats.groupBy(id_col, "__is_target", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    raw = per_doc.groupBy("b").agg(
        F.sum("cnt").alias("r_cnt"),
        F.sum(F.when(F.col("__is_target"), F.col("cnt")).otherwise(0)).alias("t_cnt"),
    )
    totals = raw.agg(
        F.sum("r_cnt").alias("r_tot"), F.sum("t_cnt").alias("t_tot")
    )  # 1 row
    aB = float(alpha) * n_buckets
    ratio = raw.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log(F.col("t_cnt") + alpha)
            - F.log(F.col("t_tot") + aB)
            - F.log(F.col("r_cnt") + alpha)
            + F.log(F.col("r_tot") + aB)
        ).alias("lam"),
    )
    return (
        per_doc.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.round(F.sum(F.col("cnt") * F.col("lam")), 4).alias("dsir_logw"),
        )
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "dsir_logw",
    seed: str = "dsir",
) -> DataFrame:
    """Gumbel-top-k resampling: sample k docs WITHOUT replacement with
    probability ∝ exp(logw), derandomized — the Gumbel noise comes from
    the md5 fingerprint of (seed, id), so the draw is reproducible and
    oracle-replayable (A-Res analog: `operators/sampling.py`).

    key = logw − ln(−ln(u)),  u = (fingerprint32 + 0.5) / 2³²

    Global top-k by key executes as TakeOrderedAndProject.
    Returns (…weights columns, gumbel_key) — the k selected rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (fingerprint32(id_col, seed) + F.lit(0.5)) / F.lit(float(1 << 32))
    key = F.col(logw_col) - F.log(-F.log(u))
    return (
        weights.withColumn("gumbel_key", F.round(key, 4))
        .orderBy(F.desc("gumbel_key"), id_col)
        .limit(k)
    )
