"""Distributed deterministic k-means (Lloyd) for vector clustering —
the trained-centroid upgrade for IVF cells (`similarity.ivf_assign`),
PQ codebooks (`functions/pq.py`), and SemDeDup clusters.

Why not MLlib KMeans: its k-means|| init and per-partition float
accumulation are run-order dependent — not replayable in another
engine. Fixed-seed Lloyd with a fixed round count is exactly as
expressive, and here every quantity is BIT-EXACT across engines:

- Vectors are quantized ONCE to integer micro-units (round(x·1e6) —
  the `pq._adc_micro` discipline): all distances are int64 sums of
  squared integer differences, so assignment has no float rounding
  anywhere, in any engine.
- Centroid update is floor(Σx / count) back into micro-units: integer
  sums are exact, and the one double division is the same IEEE op on
  the same operands in Spark and DuckDB.
- Seeds are the `select_ivf_centroids` id-stride rule (k ≈ √n), so the
  oracle replays the whole run from the raw table (generated
  round-chain CTE SQL — the `classifier.build_logreg_oracle_sql` /
  `bpe.build_oracle_sql` bounded-state pattern).

Scale shape (100 TB): per round, assignment is MAP-SIDE — the K
centroids collapse to one broadcast row of (cid, c) structs (the
`ivf_assign_multiprobe` shape), each vector scores all K in a
higher-order expression with no shuffle and no UDF; the only shuffle
is the (cluster, dim) partial-aggregated mean update (map-side
combine, k·dim result rows). Driver state is the model itself —
k·dim micro-ints (the bounded per-round collect, same class as the
classifier's 257 weights and BPE's 1-row argmax).

Reference semantics: the reference retrieves by exact cosine over DIR
feature vectors (Preprocessing/FeatureVectors/readme.md); k-means is
how the IVF/PQ/SemDeDup approximations of that contract earn their
recall at scale (Jégou et al. 2011 trains exactly these codebooks).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def quantize_micro(vec_col: Column | str) -> Column:
    """array<float|double> → array<long> in 1e-6 units (exact integer
    space: every downstream distance/sum is engine-exact)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: F.round(x.cast("double") * float(MICRO), 0).cast("long"))


def _assign_expr(cents_col: str = "__cents", xq_col: str = "xq") -> Column:
    """argmin_c Σ_j (xq_j − c_j)² over a broadcast struct array —
    int64 arithmetic, ties to the lower centroid id."""
    return F.array_min(
        F.transform(
            F.col(cents_col),
            lambda ct: F.struct(
                F.aggregate(
                    F.zip_with(F.col(xq_col), ct["c"], lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d"),
                ct["centroid_id"].alias("cid"),
            ),
        )
    )["cid"]


DRIVER_TRAIN_BYTES_CONF = "spark.graft.trainer.driverCollectBytes"
# default sits BELOW the measured driver-vs-distributed crossover: with
# K ≈ √n the driver Lloyd loop is O(n^1.5) single-threaded (~200M int64
# ops/s), matching the ~1 s/round distributed scheduling floor around
# n ≈ 20k vectors ≈ 8 MiB of parquet backing (scale_sensitivity r12:
# driver path still 3-5× ahead at 16k vectors / 6.4 MiB). PQ/BPE driver
# costs are linear in n and clear the bar with more headroom; one
# shared conservative budget keeps every trainer in its winning regime.
DRIVER_TRAIN_BYTES_DEFAULT = 8 * 1024 * 1024


def _driver_train_budget(spark) -> int:
    from social_media_data_pipeline_spark.io import _parse_bytes

    return _parse_bytes(
        spark.conf.get(
            DRIVER_TRAIN_BYTES_CONF, str(DRIVER_TRAIN_BYTES_DEFAULT)
        ),
        fallback=DRIVER_TRAIN_BYTES_DEFAULT,
    )


def _spark_rem(a: int, b: int) -> int:
    """Spark/Java `%` (truncated remainder, sign of the dividend) —
    Python's `%` floors instead; they differ on negative dividends.
    Pure integer ops: `int(a / b)` would round through a double and
    lose exactness for |a| >= 2^53."""
    r = a % b
    return r - b if a < 0 and r != 0 else r


def _lloyd_rounds_driver(
    xq_rows: "list[tuple[int, list[int]]]",
    cents: "list[tuple[int, list[int]]]",
    iters: int,
) -> tuple[list[tuple[int, list[int]]], dict[int, int]]:
    """All Lloyd rounds driver-side over the ALREADY-Spark-quantized
    micro vectors — bit-identical to the distributed per-round jobs:
    int64 squared-L2 with two's-complement wrap (numpy int64 ≡ Java
    long, and integer addition is associative mod 2⁶⁴ so partial-agg
    order is irrelevant), argmin ties to the LOWER centroid id
    (np.argmin takes the first minimum; row index == cid because cids
    are contiguous 0..K-1), and re-center as floor(Σx/count) with the
    division performed on Python ints — the same IEEE double op on the
    same exact operands the collect-based path feeds `math.floor`.
    Empty clusters keep their previous centroid; returned counts are
    the FINAL round's memberships (the distributed contract)."""
    import numpy as np

    X = np.array([x for _, x in xq_rows], dtype=np.int64)
    counts: dict[int, int] = {}
    k = len(cents)
    with np.errstate(over="ignore"):
        for _ in range(iters):
            C = np.array([c for _, c in cents], dtype=np.int64)
            dists = np.empty((X.shape[0], k), dtype=np.int64)
            for ci in range(k):
                diff = X - C[ci]
                dists[:, ci] = (diff * diff).sum(axis=1)
            labels = dists.argmin(axis=1)
            cnt = np.bincount(labels, minlength=k)
            sums = np.zeros((k, X.shape[1]), dtype=np.int64)
            np.add.at(sums, labels, X)
            new_cents = []
            counts = {}
            for cid, old in cents:
                c = int(cnt[cid])
                if c == 0:
                    counts[cid] = 0
                    new_cents.append((cid, old))
                    continue
                counts[cid] = c
                new_cents.append(
                    (cid, [math.floor(int(s) / c) for s in sums[cid]])
                )
            cents = new_cents
    return cents, counts


def kmeans_train(
    vectors: DataFrame,
    k: int | None = None,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_size: int | None = None,
) -> list[tuple[int, int, list[int]]]:
    """Train Lloyd k-means; returns the model as a driver-side list of
    (centroid_id, n_members, centroid_micro) — n_members from the final
    assignment round, centroids in integer micro-units.

    Seeds: id-stride (stride = max(1, n // k), k defaults to
    max(4, floor(√n)) — the `select_ivf_centroids` scale rule), indexed
    0..len(seeds)-1 in id order. Each round assigns every vector to its
    nearest centroid by integer squared-L2 in micro space (ties → lower
    cid) and re-centers with floor(Σx/count); empty clusters keep their
    previous centroid.

    Execution is scale-adaptive: when the backing files are within
    `spark.graft.trainer.driverCollectBytes` (default
    `DRIVER_TRAIN_BYTES_DEFAULT` = 8 MiB, the measured crossover — a
    metadata-only decision, no job), the Spark-quantized training view
    is collected ONCE and every Lloyd round runs driver-side in int64
    numpy (`_lloyd_rounds_driver` — bit-identical model, asserted by
    tests against the distributed path). That replaces the checkpoint
    + count + seed-collect + one-job-per-round shape (~3+iters jobs,
    each paying the local-mode scheduling floor) with a single collect.
    Larger corpora — the 100 TB case — take the distributed path
    below unchanged: broadcast-centroid map-side assignment, one
    (cluster, dim)-partial-aggregated shuffle per round.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    spark = vectors.sparkSession
    xq_src = vectors.select(
        F.col(id_col).alias("id"), quantize_micro(vec_col).alias("xq")
    )
    from social_media_data_pipeline_spark.io import input_backing_bytes

    backing = input_backing_bytes(vectors)
    if backing is not None and backing <= _driver_train_budget(spark):
        rows = [(r["id"], list(r["xq"])) for r in xq_src.collect()]
        n = corpus_size if corpus_size is not None else len(rows)
        if k is None:
            k = max(4, math.floor(math.sqrt(n)))
        stride = max(1, n // k)
        seeds = sorted(
            (i, x) for i, x in rows if _spark_rem(i, stride) == 0
        )
        if not seeds:
            raise ValueError("no seed vectors selected — empty corpus?")
        cents0 = [(ci, list(x)) for ci, (_i, x) in enumerate(seeds)]
        cents, counts = _lloyd_rounds_driver(rows, cents0, iters)
        return [(cid, counts[cid], c) for cid, c in cents]
    # the per-round assignment is CPU-bound (K×dim interpreted
    # higher-order arithmetic per vector); a single-file corpus scan
    # arrives as ONE partition (unsplittable small parquet — guide
    # §2.5: repartition right after the read), which would run every
    # Lloyd round on one core. Spread the materialized training view
    # to one partition per core before checkpointing: the repartition
    # rides the materialization the checkpoint pays anyway, every
    # Lloyd round amortizes it, and integer sums are partitioning-
    # invariant so the model is bit-identical. (No .rdd partition-count
    # probe here — touching .rdd on an AQE plan materializes its query
    # stages eagerly, re-running upstream jobs.)
    par = max(1, spark.sparkContext.defaultParallelism)
    xq_df = xq_src.repartition(par, F.col("id")).localCheckpoint()
    n = corpus_size if corpus_size is not None else xq_df.count()
    if k is None:
        k = max(4, math.floor(math.sqrt(n)))
    stride = max(1, n // k)
    seed_rows = xq_df.filter(F.col("id") % stride == 0).orderBy("id").collect()
    if not seed_rows:
        raise ValueError("no seed vectors selected — empty corpus?")
    cents: list[tuple[int, list[int]]] = [
        (i, list(r["xq"])) for i, r in enumerate(seed_rows)
    ]
    dim = len(cents[0][1])
    counts: dict[int, int] = {}
    for _ in range(iters):
        # the broadcast centroid row is built directly as a one-row
        # local relation: the previous collect_list aggregate over a
        # LocalTableScan scheduled a real (driver-blocking) sub-job
        # inside every round's broadcast materialization; a
        # LocalTableScan broadcasts job-free. Order is irrelevant —
        # _assign_expr takes array_min over (d, cid) structs.
        c_row = spark.createDataFrame(
            [(list(cents),)],
            "__cents array<struct<centroid_id:int,c:array<bigint>>>",
        )
        assigned = xq_df.crossJoin(F.broadcast(c_row)).select(
            "id", "xq", _assign_expr().alias("cluster")
        )
        # per-cluster per-dimension sums WITHOUT row inflation: the r6
        # formulation posexploded to dim×n rows before the partial agg;
        # here each dimension is its own sum column, so map-side combine
        # runs on unexploded rows and the shuffle carries K rows of
        # (cnt, dim sums) — identical integer sums, dim× fewer shuffle
        # rows (measured in SCALING.md)
        stats = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[
                    F.sum(F.element_at("xq", j + 1)).alias(f"s{j}")
                    for j in range(dim)
                ],
            )
            .collect()
        )
        by_cid = {r["cluster"]: r for r in stats}
        new_cents = []
        counts = {}
        for cid, old in cents:
            row = by_cid.get(cid)
            if row is None:
                counts[cid] = 0
                new_cents.append((cid, old))
                continue
            counts[cid] = row["cnt"]
            # floor of the SAME IEEE double division the oracle performs
            new_cents.append(
                (cid, [math.floor(row[f"s{j}"] / row["cnt"]) for j in range(dim)])
            )
        cents = new_cents
    return [(cid, counts[cid], c) for cid, c in cents]


def kmeans_centroids(
    vectors: DataFrame,
    k: int | None = None,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_size: int | None = None,
) -> DataFrame:
    """Trained centroids as a (id_col, vec_col) DataFrame of DOUBLES
    (micro/1e6) — drop-in for every `centroids=` parameter
    (`ivf_assign`, `ivf_topk`, `semdedup`, ...)."""
    model = kmeans_train(vectors, k, iters, id_col, vec_col, corpus_size)
    spark = vectors.sparkSession
    rows = [(cid, [v / MICRO for v in c]) for cid, _n, c in model]
    return spark.createDataFrame(rows, f"{id_col} int, {vec_col} array<double>")


def kmeans_model_df(
    vectors: DataFrame,
    k: int | None = None,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Flat oracle-comparable model view: (centroid_id, j, c,
    n_members) — one row per centroid × dimension, c in doubles."""
    model = kmeans_train(vectors, k, iters, id_col, vec_col)
    spark = vectors.sparkSession
    rows = [
        (cid, j, c[j] / MICRO, n)
        for cid, n, c in model
        for j in range(len(c))
    ]
    return spark.createDataFrame(
        rows, "centroid_id int, j int, c double, n_members bigint"
    )


def build_kmeans_chain_sql(
    iters: int = 5, dim: int = 64, table: str = "embeddings"
) -> str:
    """The WITH-chain prefix replaying the training run (CTEs v, params,
    c0, a0..a{iters-1}, c1..c{iters}) — compose a final SELECT onto it,
    or a `cent(centroid_id, c_vec)` CTE for downstream IVF oracles."""
    parts = [
        f"""WITH v AS MATERIALIZED (
    SELECT vec_id AS id, j,
           CAST(ROUND(embedding[j + 1]::DOUBLE * 1000000, 0) AS BIGINT) AS x
    FROM {table}, (SELECT unnest(generate_series(0, {dim - 1})) AS j) js
), params AS MATERIALIZED (
    SELECT GREATEST(n // GREATEST(CAST(FLOOR(SQRT(n::DOUBLE)) AS BIGINT), 4), 1) AS stride
    FROM (SELECT COUNT(*) AS n FROM {table})
), c0 AS MATERIALIZED (
    SELECT CAST(row_number() OVER (PARTITION BY j ORDER BY id) - 1 AS INT) AS cid, j, x AS c
    FROM v, params WHERE id % stride = 0
)"""
    ]
    for r in range(iters):
        parts.append(
            f""", a{r} AS MATERIALIZED (
    SELECT id, cid FROM (
        SELECT v.id, c.cid, SUM((v.x - c.c) * (v.x - c.c)) AS d
        FROM v JOIN c{r} c USING (j)
        GROUP BY v.id, c.cid
    ) QUALIFY row_number() OVER (PARTITION BY id ORDER BY d, cid) = 1
), c{r + 1} AS MATERIALIZED (
    SELECT c.cid, c.j,
           COALESCE(CAST(FLOOR(m.s::DOUBLE / m.cnt) AS BIGINT), c.c) AS c
    FROM c{r} c LEFT JOIN (
        SELECT a.cid, v.j, SUM(v.x)::BIGINT AS s, COUNT(*) AS cnt
        FROM a{r} a JOIN v USING (id) GROUP BY a.cid, v.j
    ) m ON m.cid = c.cid AND m.j = c.j
)"""
        )
    return "".join(parts)


def build_kmeans_oracle_sql(
    iters: int = 5, dim: int = 64, table: str = "embeddings"
) -> str:
    """Generated DuckDB SQL replaying the exact training run from the
    raw table: same micro quantization, same id-stride seeds with the
    √n scale rule, same int64 distances, same floor-mean update, same
    tie-breaks. Output matches `kmeans_model_df`."""
    return (
        build_kmeans_chain_sql(iters, dim, table)
        + f"""
SELECT c.cid AS centroid_id, c.j, c.c / 1000000.0 AS c,
       COALESCE(m.n_members, 0) AS n_members
FROM c{iters} c LEFT JOIN (
    SELECT cid, COUNT(*) AS n_members FROM a{iters - 1} GROUP BY cid
) m USING (cid)
ORDER BY centroid_id, j"""
    )


def build_kmeans_centroid_cte(
    iters: int = 5, dim: int = 64, table: str = "embeddings"
) -> str:
    """Chain prefix plus `cent(centroid_id, c_vec)` — trained centroids
    as DOUBLE lists (micro / 1e6), the exact values
    `kmeans_centroids` hands to Spark-side IVF callers."""
    return (
        build_kmeans_chain_sql(iters, dim, table)
        + f""", cent AS MATERIALIZED (
    SELECT CAST(cid AS INT) AS centroid_id, list(c / 1000000.0 ORDER BY j) AS c_vec
    FROM c{iters} GROUP BY cid
)"""
    )
