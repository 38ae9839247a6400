"""Trainable quality classifier: distributed logistic regression over
hashed n-gram features (the fasttext-style quality filter of the GPT-3 /
CCNet data pipelines, public papers) — batch gradient descent expressed
as DataFrame aggregates, deterministic end to end.

Why not MLlib: LBFGS is solver-dependent and not replayable in another
engine. Fixed-step batch GD with a fixed iteration count is exactly as
expressive for a linear filter, and every iteration is two joins + two
aggregates whose results a DuckDB oracle reproduces bit-for-bit (same
generated-CTE pattern as `functions/bpe.py`).

Scale shape (100 TB): features are the `functions/importance.py` hashed
(uni+bi)gram buckets — one map-side explode + a (doc, bucket) count
aggregate, computed ONCE and checkpointed (vocabulary-independent:
`n_buckets`+1 model parameters). Each GD iteration shuffles (a) the
broadcast-joined per-doc logits grouped by doc and (b) the error-
weighted gradient grouped by bucket — both map-side combinable; the
weight vector itself is a driver-side array of `n_buckets`+1 floats
(the bounded per-round collect, same class as BPE's argmax row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from social_media_data_pipeline_spark.functions.importance import hashed_grams

#: bias pseudo-bucket id (outside the [0, n_buckets) hash range)
_BIAS = -1


def doc_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """(id, b, x): tf-normalized hashed-gram bucket counts plus a bias
    feature (b = -1, x = 1) per document. One corpus pass."""
    feats = df.select(
        F.col(id_col).alias("id"),
        F.explode(hashed_grams(text_col, n_buckets)).alias("b"),
    )
    per_doc = feats.groupBy("id", "b").agg(F.count(F.lit(1)).alias("cnt"))
    totals = per_doc.groupBy("id").agg(F.sum("cnt").alias("n_grams"))
    x = per_doc.join(totals, "id").select(
        "id", "b", (F.col("cnt") / F.col("n_grams")).alias("x")
    )
    bias = totals.select("id", F.lit(_BIAS).alias("b"), F.lit(1.0).alias("x"))
    return x.unionByName(bias)


def logreg_train(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    iters: int = 10,
    lr: float = 1.0,
    sample_frac: float | None = None,
    sample_seed: str = "logreg",
) -> list[tuple[int, float]]:
    """Batch-GD logistic regression: returns [(bucket, weight)] with the
    bias at bucket -1. Deterministic: zero init, fixed step, fixed
    iteration count; w_b ← w_b − lr · Σ_d (σ(s_d) − y_d)·x_db / N.

    `sample_frac` is the SCALE lever: train on a bounded deterministic
    sample (the `operators/splits.py` salted-md5 draw — reproducible,
    partitioning-independent) and score everything in one broadcast
    pass afterwards. A linear filter's weights converge long before the
    corpus does, so each GD iteration rescans sample_frac·N feature
    rows instead of N — at 100 TB that is the difference between 10
    corpus scans and 10 sample scans. Full-corpus training
    (sample_frac=None) remains the default and the oracle path."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if sample_frac is not None and not 0.0 < sample_frac <= 1.0:
        raise ValueError(f"sample_frac must be in (0, 1], got {sample_frac}")
    if sample_frac is not None and sample_frac < 1.0:
        from social_media_data_pipeline_spark.operators.splits import fingerprint32

        cut = int(sample_frac * 4294967296)
        df = df.filter(fingerprint32(id_col, sample_seed) < cut)
    spark = df.sparkSession
    labeled = df.select(
        F.col(id_col).alias("id"), label.cast("double").alias("y")
    )
    feats = doc_features(df, id_col, text_col, n_buckets).localCheckpoint()
    n_docs = labeled.count()
    weights = {b: 0.0 for b in range(-1, n_buckets)}
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(b, w) for b, w in weights.items()], "b int, w double"
        )
        scored = (
            feats.join(F.broadcast(wdf), "b")
            .groupBy("id")
            .agg(F.sum(F.col("x") * F.col("w")).alias("logit"))
            .join(labeled, "id")
            .select("id", (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))) - F.col("y")).alias("err"))
        )
        grad = (
            feats.join(scored, "id")
            .groupBy("b")
            .agg((F.sum(F.col("err") * F.col("x")) / F.lit(float(n_docs))).alias("g"))
            .collect()
        )
        for row in grad:
            weights[row["b"]] -= lr * row["g"]
    return sorted(weights.items())


def quality_scores(
    df: DataFrame,
    weights: list[tuple[int, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Score every document with a trained model: (id, score=σ(w·x)).
    The model is a broadcast (n_buckets+1)-row join; scoring is one
    aggregate per doc."""
    spark = df.sparkSession
    wdf = spark.createDataFrame(list(weights), "b int, w double")
    feats = doc_features(df, id_col, text_col, n_buckets)
    return (
        feats.join(F.broadcast(wdf), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.col("x") * F.col("w")).alias("logit"),
        )
        .select(
            "id",
            "n_feats",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit")))).alias("score"),
        )
    )


def build_logreg_oracle_sql(
    n_buckets: int = 256, iters: int = 10, lr: float = 1.0
) -> str:
    """Generated DuckDB SQL replaying the training loop and final
    scoring exactly (zero init, same update rule), with the lang='en'
    proxy label; outputs (doc_id, n_feats, score) rounded 4 dp."""
    parts = [
        f"""WITH base AS MATERIALIZED (
    SELECT doc_id, (lang = 'en')::DOUBLE AS y,
           string_split_regex(lower(trim(coalesce(text, ''))), '\\s+') AS toks
    FROM documents
), grams AS MATERIALIZED (
    SELECT doc_id,
           unnest(list_concat(toks,
               list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                              i -> toks[i] || ' ' || toks[i + 1]))) AS g
    FROM base
), per_doc AS MATERIALIZED (
    SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % {n_buckets} AS b,
           COUNT(*)::DOUBLE AS cnt
    FROM grams GROUP BY doc_id, b
), feats AS MATERIALIZED (
    SELECT doc_id, b, cnt / n_grams AS x
    FROM (SELECT *, SUM(cnt) OVER (PARTITION BY doc_id) AS n_grams FROM per_doc)
    UNION ALL
    SELECT DISTINCT doc_id, -1 AS b, 1.0 AS x FROM per_doc
), labels AS MATERIALIZED (
    SELECT doc_id, (lang = 'en')::DOUBLE AS y FROM documents
), n AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents
), w0 AS MATERIALIZED (
    SELECT unnest(generate_series(-1, {n_buckets - 1})) AS b, 0.0::DOUBLE AS w
)"""
    ]
    for k in range(iters):
        parts.append(
            f""", s{k} AS MATERIALIZED (
    SELECT doc_id, 1.0 / (1.0 + exp(-SUM(x * w))) - ANY_VALUE(y) AS err
    FROM feats JOIN w{k} USING (b) JOIN labels USING (doc_id)
    GROUP BY doc_id
), w{k + 1} AS MATERIALIZED (
    SELECT w.b, w.w - {lr!r} * COALESCE(g.g, 0.0) AS w
    FROM w{k} w LEFT JOIN (
        SELECT b, SUM(err * x) / ANY_VALUE(n_docs) AS g
        FROM feats JOIN s{k} USING (doc_id), n
        GROUP BY b
    ) g USING (b)
)"""
        )
    parts.append(
        f"""
SELECT doc_id, COUNT(*)::BIGINT AS n_feats,
       ROUND(1.0 / (1.0 + exp(-SUM(x * w))), 4) AS score
FROM feats JOIN w{iters} USING (b)
GROUP BY doc_id
ORDER BY doc_id"""
    )
    return "".join(parts)
