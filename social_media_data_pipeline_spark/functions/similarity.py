"""Similarity search over embedding columns (array<float>).

Reference analog: DIR feature vectors + cosine retrieval
(`Preprocessing/FeatureVectors/readme.md`, `DIRAdapter.py`). Engine
surface:

- `cosine` / `dot` — JVM-side zip_with/aggregate expressions (no UDF).
- `brute_force_topk` — exact top-k neighbors; the correctness baseline.
- `lsh_bucketed_topk` — sign-random-projection LSH; the 100 TB path:
  candidates share a bucket, so the join is bucket-equi, never n².

Floating point: element products accumulate in double, in index order,
in both Spark and DuckDB (`list_cosine_similarity` on ::DOUBLE[] lists)
— results are rounded (6dp) where they feed equality checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (double accumulate).

    zip_with + aggregate beats a statically-unrolled 64-term
    element_at expression by ~4× (measured at sf0.1: the wide flat
    expression breaks whole-stage codegen into interpreted per-term
    evaluation, while the higher-order functions get a tight
    specialized loop) — don't "optimize" this into an unroll.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (self-match excluded). Returns (query_id, neighbor_id, cos, rank).

    Plan shape: broadcast the (small) query side against the corpus scan,
    score JVM-side, then per-query top-k via window. Corpus never
    shuffles for scoring; the only shuffle is the per-query rank (keyed
    by query_id, perfectly parallel).
    """
    from pyspark.sql.window import Window

    # norms are precomputed per vector BEFORE the pair join — per pair
    # only the dot product remains (3× fewer 64-element aggregates)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    denom = F.col("q_norm") * F.col("c_norm")
    cos = F.when(denom > 0, dot(F.col("q_vec"), F.col("c_vec")) / denom).otherwise(F.lit(0.0))
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cos, 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def srp_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: one bit per hyperplane
    (sign of dot(vec, plane)), packed into a long. `planes` is a small
    driver-side list (broadcast as literals into the plan)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec_col, lit_plane) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def deterministic_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Engine-portable hyperplanes for SRP-LSH: md5-derived uniform
    weights in [-0.5, 0.5) (sign hashing only needs symmetric weights,
    not Gaussian). Because derivation is pure md5 of (seed, plane, dim),
    the DuckDB oracle can embed the identical literals — the ANN variant
    is differential-checkable end-to-end."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def cosine_near_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos >= τ).

    The exact formulation (block-nested-loop over the broadcast smaller
    side). At corpus scale, run the SAME pair contract through
    `ivf_topk`/`lsh_bucketed_topk` candidates instead of the full cross
    product.
    """
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def ivf_assign_multiprobe(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 2,
) -> DataFrame:
    """Multi-probe IVF assignment: each vector → its top-`probes`
    max-cosine cells (probes=1 degenerates to `ivf_assign`).

    Centroids broadcast; the rank is a window keyed by the vector id —
    each window holds exactly K (≤ few hundred) rows, perfectly
    parallel, no global shuffle beyond the per-vector key.
    """
    from pyspark.sql.window import Window

    c = centroids.select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    with_norm = vectors.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("v_norm")
    )
    denom = F.col("v_norm") * F.col("c_norm")
    cos = F.when(denom > 0, dot(F.col(vec_col), F.col("c_vec")) / denom).otherwise(F.lit(0.0))
    scored = with_norm.crossJoin(F.broadcast(c)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("v_norm"),
        F.col("centroid_id"),
        F.round(cos, 6).alias("c_cos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("c_cos"), F.asc("centroid_id"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= probes)
        .select(id_col, vec_col, "v_norm", F.col("centroid_id").cast("int").alias("cluster"))
    )


def cosine_near_dup_via_ivf(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    probes: int = 2,
) -> DataFrame:
    """Candidate-composed near-dup: IVF multi-probe candidate generation
    → exact cosine verification. Same (id_a, id_b, cos) contract as
    `cosine_near_dup_pairs`, but the pair join is EQUI on the cell id —
    never the n² theta join.

    Recall: a pair is found iff the two vectors share ≥1 of their
    `probes` cells. For true near-dups (cos ≥ 0.9, angle ≤ 26°) the
    pair's vectors rank their cells near-identically, so co-assignment
    probability → 1 as cos → 1 and probes=2 captures boundary cases.
    On NEAR-ORTHOGONAL data (this testdata: max pair cos 0.51, angle
    59°) co-assignment is structurally unlikely — measured at sf0.01,
    K=10 centroids: probes=2 → recall 0.65, probes=4 → recall 1.0 at
    τ=0.4 (115k candidates vs 125k exact pairs: on random vectors at
    low τ, NO candidate scheme prunes much — LSH collision prob per
    SRP bit is only 1−θ/π ≈ 0.61 there). The oracle query pins the
    recall-1.0 config and hash-matches the EXACT all-pairs result.

    At 100 TB: K grows to ~√n cells, candidates become n·(n/K)·P²
    within-cell pairs ≪ n², and the corpus is written partitioned by
    `cluster`, so candidate generation is a co-partitioned self-join
    with no extra shuffle. Verification cost is candidates × one
    64-float dot — the pruning ratio IS the speedup.
    """
    assigned = ivf_assign_multiprobe(vectors, centroids, id_col, vec_col, probes)
    # candidate generation and dedup carry ONLY ids: a pair sharing c
    # cells would otherwise be verified c (≤ probes²) times, and a
    # distinct that carries the vectors shuffles |pairs| × 2×dim floats
    # (measured 4× the whole query's runtime at sf0.1) — ids are 16 B
    cand = (
        assigned.select(F.col(id_col).alias("id_a"), "cluster")
        .join(assigned.select(F.col(id_col).alias("id_b"), "cluster"), "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # re-attach vectors+norms by id join (auto-broadcast when the vector
    # table is small; an id-keyed shuffle join at corpus scale — still
    # only |pairs| + |corpus| rows moved, never |pairs| × vectors twice)
    side = vectors.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("n")
    )
    cand = (
        cand.join(
            side.select(
                F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("n").alias("na")
            ),
            "id_a",
        )
        .join(
            side.select(
                F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("n").alias("nb")
            ),
            "id_b",
        )
    )
    denom = F.col("na") * F.col("nb")
    cos = F.when(denom > 0, dot(F.col("va"), F.col("vb")) / denom).otherwise(F.lit(0.0))
    return (
        cand.select("id_a", "id_b", F.round(cos, 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: each vector → its max-cosine centroid.

    `centroids` is a small (id, vector) table — broadcast; assignment is
    an argmax via max_by over the broadcast join (no window shuffle).
    """
    c = centroids.select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    with_norm = vectors.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("v_norm")
    )
    denom = F.col("v_norm") * F.col("c_norm")
    cos = F.when(denom > 0, dot(F.col(vec_col), F.col("c_vec")) / denom).otherwise(F.lit(0.0))
    scored = with_norm.crossJoin(F.broadcast(c)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("v_norm"),
        F.col("centroid_id"),
        F.round(cos, 6).alias("c_cos"),
    )
    # deterministic argmax via one struct-max aggregate: (cos, -cid) is
    # unique per (vector, centroid), so the vector payload rides along
    # without ever being compared — and the groupBy key stays a scalar id
    best = scored.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("c_cos"),
                (-F.col("centroid_id")).alias("neg_id"),
                F.col(vec_col).alias("vec"),
                F.col("v_norm").alias("v_norm"),
            )
        ).alias("best")
    )
    return best.select(
        id_col,
        F.col("best.vec").alias(vec_col),
        F.col("best.v_norm").alias("v_norm"),
        (-F.col("best.neg_id")).cast("int").alias("cluster"),
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """IVF approximate top-k: score only corpus vectors in the query's
    cell. At 100 TB the corpus is written partitioned by `cluster`, so a
    probe reads one partition (scan pruning, not just join pruning);
    multi-probe = assign queries to their top-P cells upstream.
    """
    from pyspark.sql.window import Window

    c_assigned = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("v_norm").alias("c_norm"),
        "cluster",
    )
    q_assigned = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("v_norm").alias("q_norm"),
        "cluster",
    )
    scored = c_assigned.join(F.broadcast(q_assigned), "cluster").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    denom = F.col("q_norm") * F.col("c_norm")
    cos = F.when(denom > 0, dot(F.col("q_vec"), F.col("c_vec")) / denom).otherwise(F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", F.round(cos, 6).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: score only pairs sharing an SRP bucket.

    At scale the corpus is written bucketed/partitioned by `bucket`, so a
    query probes one partition — the scan itself is pruned, not just the
    join. Recall < 1.0 by design; multi-probe = widen with neighboring
    buckets upstream.
    """
    from pyspark.sql.window import Window

    planes = deterministic_planes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
