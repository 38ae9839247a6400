"""Product Quantization (PQ) for embedding compression + ADC search.

Jégou et al. 2011 ("Product quantization for nearest neighbor
search"): split each D-dim vector into M subvectors, quantize each
subvector to one of K_sub codewords, store M small codes instead of D
floats. Asymmetric Distance Computation (ADC) scores an UNCOMPRESSED
query against COMPRESSED corpus codes by summing per-subspace
query↔codeword distances.

This is the missing piece between the repo's other embedding-scale
tools: IVF (`similarity.py`) prunes WHICH vectors to score; SQ8
(`quantize.py`) shrinks floats 4×; PQ shrinks them 16-64× (64 floats →
8 nibble codes here) so a 100 TB embedding corpus's codes fit hot
storage and scans stream codes, not vectors. IVF-PQ (assign cells via
`ivf_assign`, PQ-encode residuals per cell) composes from these two
pieces without new machinery.

Codebooks here are DETERMINISTIC — subvectors of the first `ksub`
corpus vectors (id order), the same oracle-reproducible convention as
`select_ivf_centroids`'s id-stride. Production swaps per-subspace
k-means codebooks without touching encode/ADC. The codebook is tiny
(m × ksub × dsub doubles ≤ a few KB) and is embedded as a LITERAL in
the plan (the `deterministic_planes` pattern): encode and ADC are pure
map-side column expressions — zero shuffle, no UDF, whole-stage
codegen eligible.

Cross-engine float discipline (see module docstring in
`similarity.py`): all distances use the dot-product identity
‖a−b‖² = a·a − 2a·b + b·b so Spark's fold matches DuckDB's
`list_dot_product`; per-subspace terms are rounded to 6dp before
summing and ADC totals to 4dp where they feed equality checks.

Reference: the reference pipeline retrieves by exact cosine over DIR
feature vectors (`Preprocessing/FeatureVectors/readme.md`); PQ is the
LLM-pipeline scale path for the same retrieval contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from social_media_data_pipeline_spark.functions.similarity import dot
from social_media_data_pipeline_spark.io import spread_small_input


def _normsq(xs: list[float]) -> float:
    """Driver-side ‖x‖²: a left-fold over doubles — the same sequence
    of operations Spark's `dot(x, x)` fold and DuckDB's
    list_dot_product perform, so the literal is engine-exact."""
    acc = 0.0
    for v in xs:
        acc = acc + v * v
    return acc


def _lit_vec(xs: list[float]) -> Column:
    """Double-array literal via ONE server-side parsed expression.
    `F.lit(list)` builds the tree element-by-element over py4j — for
    codebook-sized literals that round-trip chatter dominated plan
    construction (measured ~3 s per PQ query build at m=8, ksub=16).
    repr() round-trips doubles exactly and Spark's `<repr>D` literal
    parses back to the identical bits (verified incl. -0.0, 1e-300)."""
    return F.expr("array(" + ",".join(repr(float(v)) + "D" for v in xs) + ")")


def _lit_mat(rows: list[list[float]]) -> Column:
    """Nested double-array literal, single parsed expression."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(v)) + "D" for v in r) + ")" for r in rows
        )
        + ")"
    )


#: codebook memo — the collect is deterministic per (plan, m, ksub), so
#: repeated construct/execute cycles (bench loops, retries) skip the job
_CODEBOOK_CACHE: dict[tuple, list[list[list[float]]]] = {}


def pq_codebook(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic codebook: CB[j][c] = subvector j of the corpus
    vector with the c-th smallest id among `id < ksub`. Returns nested
    Python lists (doubles) — a driver-side LITERAL, not a DataFrame:
    ksub rows is a bounded collect by construction. Memoized on the
    DataFrame's semantic hash: the collect is deterministic per corpus,
    so repeat construct cycles pay zero jobs."""
    try:
        key = (vectors.semanticHash(), m, ksub, id_col, vec_col)
    except Exception:
        key = None
    if key is not None and key in _CODEBOOK_CACHE:
        return _CODEBOOK_CACHE[key]
    rows = (
        vectors.filter(F.col(id_col) < ksub)
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"need {ksub} seed vectors with {id_col} < {ksub}, got {len(rows)}")
    dim = len(rows[0][0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    cb = [
        [[float(v) for v in rows[c][0][j * dsub : (j + 1) * dsub]] for c in range(ksub)]
        for j in range(m)
    ]
    if key is not None:
        if len(_CODEBOOK_CACHE) >= 8:
            _CODEBOOK_CACHE.pop(next(iter(_CODEBOOK_CACHE)))
        _CODEBOOK_CACHE[key] = cb
    return cb


def _subvec(vec: Column, j: int, dsub: int) -> Column:
    return F.slice(vec, j * dsub + 1, dsub)


def pq_encode(
    vectors: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Vector → array<int> of M codes (argmin codeword per subspace,
    ties to the lower code). Pure map-side expression over the literal
    codebook: encoding 100 TB is an embarrassingly parallel scan.
    `keep_cols` ride through (e.g. the IVF cell id for IVF-PQ)."""
    m, dsub = len(codebook), len(codebook[0][0])
    # ‖a−b‖² = a·a − 2a·b + b·b, VECTORIZED over the codeword axis: one
    # F.transform over the literal ksub-codeword array computes all
    # candidate dots per subspace (a single higher-order expression
    # instead of ksub separate folds — both plan-construction time and
    # codegen size drop ~10×); b·b comes from a driver-side literal
    # array, a·a is computed once per subspace.
    with_subs = vectors.select(
        F.col(id_col),
        *(keep_cols or []),
        *[_subvec(F.col(vec_col), j, dsub).alias(f"__s{j}") for j in range(m)],
    )

    def _code(j: int) -> Column:
        sub = F.col(f"__s{j}")
        sn = dot(sub, sub)
        norms = _lit_vec([_normsq(cw) for cw in codebook[j]])
        cands = F.transform(
            _lit_mat(codebook[j]),
            lambda cw, i: F.struct(
                F.round(
                    sn - 2.0 * dot(sub, cw) + F.element_at(norms, i + 1), 6
                ).alias("d"),
                i.cast("int").alias("c"),
            ),
        )
        return F.array_min(cands)["c"]

    return with_subs.select(
        F.col(id_col),
        *(keep_cols or []),
        F.array(*[_code(j) for j in range(m)]).alias("codes"),
    )


def _adc_micro(codebook: list[list[list[float]]], q_vec: str = "q_vec") -> Column:
    """ADC distance in exact integer MICRO-units (1e-6) between an
    uncompressed query column and a `codes` column: Σ_j round(1e6 ·
    ‖q_j − CB[j][code_j]‖²), each term a literal codebook lookup. The
    per-term round-to-integer makes the SUM order-independent and
    bit-exact across engines — summing 6dp-rounded DOUBLES is not
    (different accumulation orders differ by 1 ulp, which flips a
    final decimal round at a half boundary)."""
    m, dsub = len(codebook), len(codebook[0][0])
    code_j = lambda j: (F.element_at("codes", j + 1) + 1).cast("int")  # noqa: E731
    terms = [
        F.round(
            (
                dot(_subvec(F.col(q_vec), j, dsub), _subvec(F.col(q_vec), j, dsub))
                - 2.0
                * dot(
                    _subvec(F.col(q_vec), j, dsub),
                    F.element_at(_lit_mat(codebook[j]), code_j(j)),
                )
                + F.element_at(_lit_vec([_normsq(cw) for cw in codebook[j]]), code_j(j))
            )
            * 1000000.0,
            0,
        ).cast("long")
        for j in range(m)
    ]
    return sum(terms[1:], terms[0])


def _adc_dist(codebook: list[list[list[float]]], q_vec: str = "q_vec") -> Column:
    """ADC distance as a double: exact integer micro-unit sum / 1e6 —
    the division of the SAME integer yields a bit-identical double in
    every engine, so no lossy final round is needed."""
    return _adc_micro(codebook, q_vec) / F.lit(1000000.0)


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: uncompressed queries vs PQ codes. Per (query,
    neighbor) the distance is Σ_j ‖q_j − CB[j][code_j]‖² — each term a
    lookup into the literal codebook, each rounded to 6dp so the sum
    is engine-exact. Broadcast the query side; the corpus side streams
    codes map-side; per-query top-k is the only window.

    Returns (query_id, neighbor_id, adc_dist, rank) — ADC is an
    APPROXIMATION of true distance (quantization error), which is the
    16-64× compression trade; rank by (adc, neighbor_id) is
    deterministic."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        codes.select(F.col(id_col).alias("neighbor_id"), "codes")
        .crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _adc_dist(codebook).alias("adc_dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    codebook: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the production ANN architecture at 100 TB — IVF cell
    pruning (scan one cell per query, corpus written partitioned by
    `cluster`) × PQ compression (the scanned cell is CODES, 16-64×
    smaller than vectors). Composes `similarity.ivf_assign` with
    `pq_encode`/ADC untouched: candidates = the query's cell only, each
    scored against codes via the literal-codebook ADC expression. In
    full IVF-PQ the codebook quantizes cell RESIDUALS (vector −
    centroid); here it quantizes raw vectors so the composition stays
    exactly the two audited pieces — the residual variant changes only
    what `pq_codebook` is trained on."""
    from pyspark.sql.window import Window

    from social_media_data_pipeline_spark.functions.similarity import ivf_assign

    c_codes = pq_encode(
        ivf_assign(corpus, centroids, id_col, vec_col),
        codebook,
        id_col,
        vec_col,
        keep_cols=["cluster"],
    ).select(F.col(id_col).alias("neighbor_id"), "cluster", "codes")
    q_assigned = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "cluster",
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        c_codes.join(F.broadcast(q_assigned), "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _adc_dist(codebook).alias("adc_dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_codebook_kmeans(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """TRAINED codebook: per-subspace Lloyd k-means in exact integer
    micro-space (the `functions/kmeans.py` discipline), all M subspaces
    batched into ONE distributed job per round. Seeds are the
    `pq_codebook` convention (subvectors of the ksub lowest-id
    vectors); assignment is an int64 argmin over a broadcast struct
    array joined on the subspace id; update is floor(Σx/count); empty
    codewords keep their previous value. Driver state is the codebook
    itself (m·ksub·dsub micro-ints). Returns nested float lists
    (micro/1e6) — a drop-in for `pq_encode`/`pq_adc_topk`, whose
    literal-codebook plans do not change shape.

    Replayable: `build_pq_kmeans_chain_sql` regenerates the exact run
    as a DuckDB CTE chain ending in a `cw(c, j, csub)` codeword table.
    """
    import math as _math

    from social_media_data_pipeline_spark.functions.kmeans import (
        MICRO,
        _assign_expr,
        quantize_micro,
    )

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    spark = vectors.sparkSession
    # scale-adaptive (the kmeans_train discipline): a driver-sized
    # corpus — metadata-only backing-bytes decision — is collected
    # ONCE (Spark-quantized; subvector quantization is element-wise so
    # slicing the quantized full vector is identical) and every
    # per-subspace Lloyd round runs driver-side in int64 numpy,
    # bit-identical to the distributed rounds. Replaces first() +
    # checkpoint + seed collect + iters round jobs with one collect.
    # Large corpora take the distributed path below unchanged.
    from social_media_data_pipeline_spark.functions.kmeans import (
        _driver_train_budget,
        _lloyd_rounds_driver,
    )
    from social_media_data_pipeline_spark.io import input_backing_bytes

    backing = input_backing_bytes(vectors)
    if backing is not None and backing <= _driver_train_budget(spark):
        from social_media_data_pipeline_spark.functions.kmeans import (
            MICRO as _MICRO,
        )
        from social_media_data_pipeline_spark.functions.kmeans import (
            quantize_micro as _qm,
        )

        rows = [
            (r["id"], list(r["xq"]))
            for r in vectors.select(
                F.col(id_col).alias("id"), _qm(vec_col).alias("xq")
            ).collect()
        ]
        if rows:
            dim = len(rows[0][1])
            if dim % m:
                raise ValueError(
                    f"dim {dim} not divisible by m={m} subspaces"
                )
            dsub = dim // m
            seed_ids = sorted(i for i, _x in rows if i < ksub)
            if len(seed_ids) < ksub:
                raise ValueError(
                    f"need {ksub} seed vectors with {id_col} < {ksub},"
                    f" got {len(seed_ids)}"
                )
            out: list[list[list[float]]] = []
            for j in range(m):
                sub_rows = [
                    (i, x[j * dsub : (j + 1) * dsub]) for i, x in rows
                ]
                by_id = dict(sub_rows)
                cents0 = [
                    (ci, list(by_id[i])) for ci, i in enumerate(seed_ids)
                ]
                cents_j, _counts = _lloyd_rounds_driver(
                    sub_rows, cents0, iters
                )
                out.append(
                    [[v / _MICRO for v in c] for _cid, c in cents_j]
                )
            return out
    first = vectors.select(vec_col).first()
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    sub_src = (
        vectors.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.array(
                    *[
                        quantize_micro(_subvec(F.col(vec_col), j, dsub))
                        for j in range(m)
                    ]
                )
            ).alias("j", "sq"),
        )
    )
    # same single-partition hazard as kmeans_train: a single-file scan
    # would run every per-round assignment on one core (guide §2.5 —
    # repartition after an unsplittable read). The repartition rides
    # the checkpoint's materialization; integer sums make the codebook
    # partitioning-invariant. (No .rdd partition probe — see
    # kmeans_train: it materializes AQE stages eagerly.)
    _par = max(1, spark.sparkContext.defaultParallelism)
    sub_df = sub_src.repartition(_par, F.col("id"), F.col("j")).localCheckpoint()
    seed_rows = sub_df.filter(F.col("id") < ksub).orderBy("id", "j").collect()
    if len(seed_rows) < m * ksub:
        raise ValueError(
            f"need {ksub} seed vectors with {id_col} < {ksub}, got {len(seed_rows) // m}"
        )
    seed_ids = sorted({r["id"] for r in seed_rows})
    rank_of = {vid: i for i, vid in enumerate(seed_ids)}
    cents: dict[tuple[int, int], list[int]] = {
        (r["j"], rank_of[r["id"]]): list(r["sq"]) for r in seed_rows
    }
    for _ in range(iters):
        # m-row local relation instead of a groupBy/collect_list over
        # one (kmeans_train: that aggregate schedules a real sub-job
        # inside every round's broadcast build; a LocalTableScan
        # broadcasts job-free). Order inside __cents is irrelevant —
        # _assign_expr takes array_min over (d, cid) structs.
        crow = spark.createDataFrame(
            [
                (j, [(cid, c) for (jj, cid), c in sorted(cents.items()) if jj == j])
                for j in range(m)
            ],
            "j int, __cents array<struct<centroid_id:int,c:array<bigint>>>",
        )
        assigned = sub_df.join(F.broadcast(crow), "j").select(
            "id", "j", "sq", _assign_expr("__cents", "sq").alias("cid")
        )
        # per-subdim sums WITHOUT row inflation (the kmeans_train r6
        # fix): the previous shape posexploded to dsub×(n·m) rows
        # before the partial agg; each subdimension as its own sum
        # column keeps map-side combine on unexploded rows and the
        # shuffle carries m·ksub rows of (cnt, dsub sums) — identical
        # integer sums, dsub× fewer shuffle rows
        stats = (
            assigned.groupBy("j", "cid")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[
                    F.sum(F.element_at("sq", p + 1)).alias(f"s{p}")
                    for p in range(dsub)
                ],
            )
            .collect()
        )
        by_key: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
        for r in stats:
            by_key[(r["j"], r["cid"])] = {
                p: (r[f"s{p}"], r["cnt"]) for p in range(dsub)
            }
        new_cents = {}
        for key, old in cents.items():
            dims = by_key.get(key)
            if not dims:
                new_cents[key] = old
                continue
            new_cents[key] = [
                _math.floor(dims[p][0] / dims[p][1]) for p in range(dsub)
            ]
        cents = new_cents
    return [
        [[v / MICRO for v in cents[(j, c)]] for c in range(ksub)] for j in range(m)
    ]


def build_pq_kmeans_chain_sql(
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    dim: int = 64,
    table: str = "embeddings",
    continue_chain: bool = False,
) -> str:
    """Generated WITH-chain replaying `pq_codebook_kmeans` exactly,
    ending in `cw(c, j, csub)` — codeword id, subspace, DOUBLE[] —
    the same shape the hand-written PQ oracles build from id-seeds.
    `continue_chain=True` emits `, sv AS ...` instead of `WITH sv AS`
    so the chain can extend an existing WITH list (e.g. a residual CTE
    for `ivf_pq_residual_topk`'s oracle)."""
    dsub = dim // m
    head = ", sv AS MATERIALIZED (" if continue_chain else "WITH sv AS MATERIALIZED ("
    parts = [
        head
        + f"""
    SELECT vec_id AS id, j, p,
           CAST(ROUND(embedding[j * {dsub} + p + 1]::DOUBLE * 1000000, 0) AS BIGINT) AS x
    FROM {table},
         (SELECT unnest(generate_series(0, {m - 1})) AS j) js,
         (SELECT unnest(generate_series(0, {dsub - 1})) AS p) ps
), k0 AS MATERIALIZED (
    SELECT CAST(dense_rank() OVER (ORDER BY id) - 1 AS INT) AS cid, j, p, x AS cv
    FROM sv WHERE id < {ksub}
)"""
    ]
    for r in range(iters):
        parts.append(
            f""", ka{r} AS MATERIALIZED (
    SELECT id, j, cid FROM (
        SELECT sv.id, sv.j, k.cid, SUM((sv.x - k.cv) * (sv.x - k.cv)) AS d
        FROM sv JOIN k{r} k ON k.j = sv.j AND k.p = sv.p
        GROUP BY sv.id, sv.j, k.cid
    ) QUALIFY row_number() OVER (PARTITION BY id, j ORDER BY d, cid) = 1
), k{r + 1} AS MATERIALIZED (
    SELECT k.cid, k.j, k.p,
           COALESCE(CAST(FLOOR(mm.s::DOUBLE / mm.cnt) AS BIGINT), k.cv) AS cv
    FROM k{r} k LEFT JOIN (
        SELECT a.cid, sv.j, sv.p, SUM(sv.x)::BIGINT AS s, COUNT(*) AS cnt
        FROM ka{r} a JOIN sv ON sv.id = a.id AND sv.j = a.j
        GROUP BY a.cid, sv.j, sv.p
    ) mm ON mm.cid = k.cid AND mm.j = k.j AND mm.p = k.p
)"""
        )
    parts.append(
        f""", cw AS MATERIALIZED (
    SELECT cid AS c, j, list(cv / 1000000.0 ORDER BY p) AS csub
    FROM k{iters} GROUP BY cid, j
)"""
    )
    return "".join(parts)


def residual_table(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, __resid): each vector's IVF cell and its residual
    vector − cell centroid — the training input for the residual PQ
    codebook and the encode input of `ivf_pq_residual_topk`.
    Assignment is map-side (broadcast centroid row via `ivf_assign`);
    the residual is a zip_with projection — no shuffle."""
    from social_media_data_pipeline_spark.functions.similarity import (
        ivf_assign,
    )

    cents = centroids.select(
        F.col(id_col).cast("int").alias("cluster"),
        F.col(vec_col).alias("__cent"),
    )
    return (
        ivf_assign(spread_small_input(corpus, key=id_col), centroids, id_col, vec_col)
        .join(F.broadcast(cents), "cluster")
        .select(
            id_col,
            "cluster",
            F.zip_with(
                F.col(vec_col), F.col("__cent"),
                lambda a, b: (a - b).cast("double"),
            ).alias("__resid"),
        )
    )


def ivf_pq_residual_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    k: int = 5,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """FULL residual IVF-PQ (Jégou et al. 2011 §IV-A): the codebook
    quantizes RESIDUALS (vector − its cell centroid), not raw vectors —
    residual energy ≪ vector energy, so the same m×ksub code budget
    spends its precision on the part IVF didn't already explain; a
    query is compared in each probed cell against ITS residual in that
    cell. This is the deployed 100 TB vector-search architecture in
    final form; the raw-vector `ivf_pq_topk` stays as the
    oracle-replayable composition of the two audited pieces.

    Plan shape: assignment map-side (broadcast centroid row), residuals
    a zip_with projection, codebook trained by the batched Lloyd job
    (`pq_codebook_kmeans` on the residual column), encode/ADC pure
    literal-codebook expressions, candidates = cluster-equi join
    against ≤`probes` cells, per-query top-k the only window. Recall is
    MEASURED against brute force in `tools/ann_recall.py`.

    `codebook` (r10): a pre-trained residual codebook (the nested-list
    shape `pq_codebook_kmeans` returns, e.g. loaded from the persisted
    `ann_index.pq_residual_codebook_for` artifact) skips the per-call
    Lloyd training — the train-once/search-many path; `m` and `ksub`
    are then taken from its shape and `iters` is ignored.

    `codes` (r10): a pre-ENCODED corpus table (`id_col`, cluster,
    codes) — e.g. `ann_index.pq_codes_for`'s persisted artifact —
    skips the corpus assign/residual/encode scan entirely: search then
    touches only the m-byte-per-vector codes table, which IS the
    production IVF-PQ index layout (the compressed corpus). Must have
    been encoded with the SAME centroids and codebook.
    """
    from pyspark.sql.window import Window

    from social_media_data_pipeline_spark.functions.similarity import (
        ivf_assign,
        ivf_assign_multiprobe,
    )

    cents = centroids.select(
        F.col(id_col).cast("int").alias("cluster"),
        F.col(vec_col).alias("__cent"),
    )
    _res = lambda v: F.zip_with(  # noqa: E731
        v, F.col("__cent"), lambda a, b: (a - b).cast("double")
    )
    c_res = residual_table(corpus, centroids, id_col, vec_col)
    if codebook is None:
        codebook = pq_codebook_kmeans(
            c_res, m=m, ksub=ksub, iters=iters, id_col=id_col,
            vec_col="__resid",
        )
    else:
        m = len(codebook)
    if codes is None:
        codes = pq_encode(
            c_res, codebook, id_col, "__resid", keep_cols=["cluster"]
        ).select(F.col(id_col).alias("neighbor_id"), "cluster", "codes")
    else:
        codes = codes.select(
            F.col(id_col).alias("neighbor_id"), "cluster", "codes"
        )
    q_cells = (
        ivf_assign_multiprobe(queries, centroids, id_col, vec_col, probes=probes)
        if probes > 1
        else ivf_assign(queries, centroids, id_col, vec_col)
    )
    q_res = (
        q_cells.join(F.broadcast(cents), "cluster")
        .select(
            F.col(id_col).alias("query_id"),
            "cluster",
            _res(F.col(vec_col)).alias("q_res"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        codes.join(F.broadcast(q_res), "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", _adc_dist(codebook, "q_res").alias("adc_dist")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
