"""PCA for embedding columns: exact covariance accumulation + driver-
side eigendecomposition + Arrow-batched projection.

Why a 100 TB embedding pipeline wants this: IVF/PQ quality rides on
energy compaction (PQ subspaces carry equal bit budget, so rotating
into the principal basis before quantization is the standard lever —
the public OPQ/ITQ motivation), dimensionality reduction shrinks every
downstream ANN artifact, and the covariance spectrum is the
monitoring signal for embedding drift. The reference has no linear-
algebra surface at all; this is pure extension territory.

Scale shape: the ONLY corpus-sized work is one pass that reduces each
partition to a d×d integer Gram matrix + a d-vector of sums
(`mapInPandas` over Arrow batches, numpy matmul per batch); what
shuffles is partitions × d(d+1)/2 rows, never corpus × d². The d×d
covariance is driver-collected (the bounded-collect class: 64×64),
eigendecomposed with numpy, and the k components broadcast back into
a vectorized projection.

Exactness discipline: inputs quantize to integer micro-units
(round-half-away-from-zero of x·1e6 — the house integer-micro rule),
so Gram partial sums are EXACT integers and merge associatively: the
distributed sum is bit-identical to any serial replay, and the SQL
oracle reproduces the registered covariance query hash-for-hash with
a per-vector pair join. int64 headroom: |x|≤~10 ⇒ |x_micro|≤1e7 ⇒
per-row product ≤1e14 ⇒ ~9·10⁴ rows per PARTITION overflow-free per
(i,j) cell at worst-case magnitudes (real embeddings are O(1): ~1e9
rows/partition); the cross-partition merge in Spark aggregates the
per-partition partials as int64 too — size partitions accordingly, or
widen the merge to DECIMAL(38,0) at cluster scale (the
`upsert_rewrite_set` precedent).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MICRO = 1_000_000.0


def _micro(x: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero of x·1e6 → int64 (matches Spark and
    DuckDB ROUND on the double product; numpy's rint is banker's and
    would disagree on exact halves)."""
    p = np.asarray(x, dtype=np.float64) * MICRO
    return np.where(
        p >= 0, np.floor(p + 0.5), -np.floor(-p + 0.5)
    ).astype(np.int64)


def gram_partials(
    df: DataFrame, vec_col: str = "embedding", d: int | None = None
) -> DataFrame:
    """Merged EXACT integer Gram partials of a fixed-dim vector column
    → one row per upper-triangle cell (i, j >= i, sxy, n) plus the
    per-dimension micro-sum vector riding as j == -1 rows. ONE corpus
    pass reducing each Arrow batch to a d×d int64 Gram + sum vector;
    the shuffle carries partitions × d(d+1)/2 rows, never corpus ×
    d². This is the shared monoid under `covariance_micro`,
    `pca_components`, and the streaming spectrum store
    (`streaming/spectrum.py`)."""
    if d is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
        if not first:
            raise ValueError("gram_partials: empty input")
        d = int(first[0]["d"])
    dd = int(d)
    iu, ju = np.triu_indices(dd)

    out_schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("sxy", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def _gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.zeros((dd, dd), dtype=np.int64)
        s = np.zeros(dd, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = _micro(np.stack(pdf[vec_col].to_numpy()))
            if x.shape[1] != dd:
                raise ValueError(
                    f"gram_partials: vector of dim {x.shape[1]} != {dd}"
                )
            g += x.T @ x
            s += x.sum(axis=0)
            n += x.shape[0]
        if n == 0:
            yield pd.DataFrame(
                {"i": [], "j": [], "sxy": [], "n": []}
            ).astype({"i": "int32", "j": "int32", "sxy": "int64", "n": "int64"})
            return
        # upper triangle of the Gram + the sum vector rides as j == -1
        rows = pd.DataFrame(
            {
                "i": np.concatenate([iu, np.arange(dd)]).astype("int32"),
                "j": np.concatenate(
                    [ju, np.full(dd, -1)]
                ).astype("int32"),
                "sxy": np.concatenate([g[iu, ju], s]),
                "n": np.int64(n),
            }
        )
        yield rows

    partials = df.select(vec_col).mapInPandas(_gram, out_schema)
    return partials.groupBy("i", "j").agg(
        F.sum("sxy").alias("sxy"), F.sum("n").alias("n")
    )


def covariance_micro(
    df: DataFrame, vec_col: str = "embedding", d: int | None = None
) -> DataFrame:
    """Upper-triangle covariance of a fixed-dim vector column →
    (i, j, cov) with i <= j, 0-based, cov rounded 6 dp. One corpus
    pass (`gram_partials`); the final cov = (Σxy)/n − (Σx/n)(Σy/n)
    is evaluated in doubles FROM the exact integer sums with a fixed
    operation order, so the SQL oracle replays it bit-for-bit."""
    merged = gram_partials(df, vec_col, d).withColumnRenamed("n", "n_part")
    n_total = merged.filter(
        (F.col("i") == 0) & (F.col("j") == -1)
    ).select("n_part")
    sums = merged.filter(F.col("j") == -1).select(
        F.col("i").alias("si"), F.col("sxy").alias("sx")
    )
    pairs = merged.filter(F.col("j") >= 0).select("i", "j", "sxy")
    n_lit = F.col("__n").cast("bigint")
    return (
        pairs.crossJoin(F.broadcast(n_total.withColumnRenamed("n_part", "__n")))
        .join(F.broadcast(sums).withColumnRenamed("si", "i"), "i")
        .withColumnRenamed("sx", "sx_i")
        .join(
            F.broadcast(sums)
            .withColumnRenamed("si", "j")
            .withColumnRenamed("sx", "sx_j"),
            "j",
        )
        .select(
            "i",
            "j",
            # + 0.0 canonicalizes IEEE -0.0 to +0.0: Spark's BigDecimal
            # round drops the sign of a tiny negative while DuckDB's
            # double round keeps it — without this the engines emit
            # 0.0 vs -0.0 for exactly-cancelled cells (caught by the
            # r12 type-tagged mirror)
            (
                F.round(
                    (
                        F.col("sxy").cast("double") / n_lit
                        - (F.col("sx_i").cast("double") / n_lit)
                        * (F.col("sx_j").cast("double") / n_lit)
                    )
                    / F.lit(1e12),
                    6,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def cov_from_gram_rows(rows) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean[d], cov[d, d]) from collected `gram_partials` rows —
    the fixed-operation-order driver-side finalize (mean = (Σx/n)/1e6;
    cov = (Σxy)/n − (Σx/n)(Σy/n), unrounded). Every input is an exact
    integer, so the result is bit-invariant under any partitioning.
    Accepts Row objects or any mapping with i/j/sxy/n; `sxy` may be a
    Decimal (the streaming spectrum store's widened column)."""
    if not rows:
        raise ValueError("cov_from_gram_rows: no partial rows")
    d = max(r["j"] for r in rows) + 1
    n = next(int(r["n"]) for r in rows if r["i"] == 0 and r["j"] == -1)
    sx = np.zeros(d)
    for r in rows:
        if r["j"] == -1:
            sx[r["i"]] = float(r["sxy"]) / n
    mean = sx / MICRO
    cov = np.zeros((d, d))
    for r in rows:
        if r["j"] >= 0:
            c = (float(r["sxy"]) / n - sx[r["i"]] * sx[r["j"]]) / 1e12
            cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = c
    return n, mean, cov


def pca_components(
    df: DataFrame, vec_col: str = "embedding", k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean, components[k, d], explained_variance[k]) — ONE exact
    integer Gram pass (`gram_partials`, driver-collected:
    d(d+1)/2 + d + 1 rows, the bounded-collect class), then mean and
    covariance derived driver-side FROM the exact sums in a fixed
    operation order (mean = (Σx / n) / 1e6; cov = (Σxy)/n −
    (Σx/n)(Σy/n), unrounded — the registered oracle query rounds, the
    eigensolver should not), eigendecomposed with numpy's symmetric
    solver, components sign-canonicalized (largest-|loading|
    coordinate made positive) so runs are reproducible. Because every
    input to the float fold is an exact int64, the result is
    bit-invariant under any partitioning — the r11 F.avg mean was the
    one partition-order-dependent fold in this module."""
    rows = gram_partials(df, vec_col).collect()
    if not rows:
        raise ValueError("pca_components: empty input")
    n, mean, cov = cov_from_gram_rows(rows)
    d = cov.shape[0]
    if not 1 <= k <= d:
        raise ValueError(f"pca_components: k must be in [1, {d}], got {k}")
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, d)
    for r_i in range(comps.shape[0]):
        lead = np.argmax(np.abs(comps[r_i]))
        if comps[r_i, lead] < 0:
            comps[r_i] = -comps[r_i]
    return mean, comps, w[order]


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project `vec_col` onto the broadcast principal basis:
    out = (x − mean) @ components.T — one vectorized numpy matmul per
    Arrow batch, map-side only (no shuffle)."""
    mu = np.asarray(mean, dtype=np.float64)
    comp = np.asarray(components, dtype=np.float64)
    cols = df.columns

    fields = [df.schema[c] for c in cols]
    out_schema = T.StructType(
        fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def _proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            y = (x - mu) @ comp.T
            pdf = pdf.copy()
            pdf[out_col] = [row.astype(np.float32) for row in y]
            yield pdf

    return df.mapInPandas(_proj, out_schema)


def rotation_select_sql(t_mat, vec_col: str = "embedding") -> str:
    """The literal-matrix rotation `out_i = Σ_j T[i][j] · x_j` as ONE
    SQL expression string for `selectExpr` — semantically identical to
    the Column-by-Column build (same left-to-right IEEE addition
    chain, literals round-tripped through repr so each parses to the
    exact same double), but a single parse instead of ~2·d² Py4J
    round-trips (measured 2.46 → 0.31 s at d=16 per construct).

    Literals go through `repr(float(...))`: callers pass numpy arrays,
    and under numpy >= 2.0 `repr(np.float64(x))` is "np.float64(x)" —
    which would CAST to NULL in non-ANSI Spark. `float()` keeps the
    shortest-roundtrip repr version-independent (same IEEE double)."""
    d = len(t_mat)
    terms = [
        " + ".join(
            f"CAST('{float(t_mat[i][j])!r}' AS DOUBLE)"
            f" * CAST({vec_col}[{j}] AS DOUBLE)"
            for j in range(d)
        )
        for i in range(d)
    ]
    return "array(" + ", ".join(terms) + ") AS " + vec_col


def eigenvalue_allocation(eigvals: np.ndarray, m: int) -> np.ndarray:
    """OPQ-style eigenvalue allocation (Ge et al. 2013, the public
    parametric-free variant): distribute principal directions over `m`
    product-quantizer subspaces so every subspace carries a BALANCED
    variance product — greedy: take eigenvalues in descending order,
    assign each to the unfilled bucket with the smallest running
    Σ log λ. Returns a permutation of range(d): position p·dsub+s is
    the index (into the eigen-order) of subspace p's s-th direction.

    Why: plain PCA rotation CONCENTRATES energy in the first
    subspace, which starves the others' bit budget; balancing the
    log-variance sums is what makes a rotation help PQ instead of
    hurting it."""
    ev = np.asarray(eigvals, dtype=np.float64)
    d = ev.shape[0]
    if d % m:
        raise ValueError(f"d={d} not divisible by m={m}")
    cap = d // m
    order = np.argsort(ev)[::-1]
    sums = np.zeros(m)
    fill: list[list[int]] = [[] for _ in range(m)]
    for idx in order:
        open_b = [b for b in range(m) if len(fill[b]) < cap]
        b = min(open_b, key=lambda b: sums[b])
        fill[b].append(idx)
        sums[b] += np.log(max(ev[idx], 1e-12))
    return np.concatenate(fill)


def opq_rotation(
    df: DataFrame, vec_col: str = "embedding", m: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """(mean, R[d, d]): the full-rank PCA basis with its rows permuted
    by `eigenvalue_allocation`, ready for `pca_project` — project the
    corpus AND the queries, then train/encode/search PQ on the rotated
    vectors exactly as before (rotation is orthogonal, so true L2
    neighbors are UNCHANGED; only the quantization error drops,
    because subspaces are decorrelated and variance-balanced)."""
    first = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if not first:
        raise ValueError("opq_rotation: empty input")
    d = int(first[0]["d"])
    mean, comps, ev = pca_components(df, vec_col, k=d)
    perm = eigenvalue_allocation(ev, m)
    return mean, comps[perm]


def opq_rotation_from_cov(
    cov: np.ndarray, m: int
) -> tuple[np.ndarray, np.ndarray]:
    """(R[d, d], eigvals desc) from an explicit covariance matrix —
    the numpy core `opq_rotation` wraps: symmetric eigendecomposition,
    descending eigen-order, sign canonicalization (largest-|loading|
    coordinate positive), rows permuted by `eigenvalue_allocation` so
    PQ subspaces carry balanced Σ log λ. Exposed separately so the
    rotation can be trained on ANY covariance source: the corpus Gram
    pass (`gram_partials`), the streaming spectrum store, or a
    deterministic distribution-matched sample (the registered
    `embedding_ivf_pq_opq` fixture)."""
    c = np.asarray(cov, dtype=np.float64)
    d = c.shape[0]
    w, v = np.linalg.eigh(c)
    order = np.argsort(w)[::-1]
    comps = v[:, order].T
    for r_i in range(comps.shape[0]):
        lead = np.argmax(np.abs(comps[r_i]))
        if comps[r_i, lead] < 0:
            comps[r_i] = -comps[r_i]
    perm = eigenvalue_allocation(w[order], m)
    return comps[perm], w[order]


def _md5_uniform(tag: str, n: int) -> np.ndarray:
    """n engine-portable uniforms in [-0.5, 0.5) — pure md5 of
    (tag, index), the same derivation rule as the SRP-LSH planes."""
    import hashlib

    return np.array(
        [
            int(hashlib.md5(f"{tag}|{i}".encode()).hexdigest()[:8], 16)
            / 2**32
            - 0.5
            for i in range(n)
        ]
    )


_FIXTURE_CACHE: dict = {}


def opq_demo_fixture(
    d: int = 16, m: int = 4, n: int = 2048, seed: str = "opq-fixture-r12"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(S, R, T=R@S): the deterministic anisotropic fixture behind the
    registered `embedding_ivf_pq_opq` query. The bench embeddings are
    ISOTROPIC (measured r11: rotation moves recall 0.195 → 0.195), so
    the query manufactures anisotropy with a fixed skew S = Q·diag(
    scales) (Q an md5-derived orthonormal basis, scales log-linear
    e² → e⁻², ratio ~55) and trains the OPQ rotation OFFLINE on a deterministic
    distribution-matched sample X = G·Sᵀ (G md5-derived iid,
    CLT-normalized) — the production pattern of training the rotation
    on a held-out sample and shipping it as a literal artifact. Both
    the Spark query and the DuckDB oracle embed the SAME T literals,
    so the differential verifies the composed matmul → kmeans →
    residual-PQ → ADC chain end to end; the rotation TRAINING itself
    is covered by `opq_rotation`'s pytest recall measurements and the
    persisted-artifact tests (eigendecomposition is not
    SQL-expressible)."""
    key = (d, m, n, seed)
    if key in _FIXTURE_CACHE:
        return _FIXTURE_CACHE[key]
    q_raw = _md5_uniform(f"{seed}|Q", d * d).reshape(d, d)
    q, _ = np.linalg.qr(q_raw)
    # log-linear spectrum spanning e² → e⁻² (ratio ~55) — the regime
    # where the r11 measurement showed the allocation's recall win
    # (TestOpqRotation's fixture); a flatter spectrum (first draft:
    # geomspace 8 → 0.4) measurably gains nothing
    scales = np.exp(np.linspace(2.0, -2.0, d))
    s_mat = q @ np.diag(scales)
    # iid approx-normal via CLT over 4 md5 uniforms (engine-portable,
    # deterministic; normality only shapes the sample, exactness is
    # irrelevant here — the rotation ships as literals)
    g = sum(
        _md5_uniform(f"{seed}|G{t}", n * d) for t in range(4)
    ).reshape(n, d) * np.sqrt(3.0)
    x = g @ s_mat.T
    cov = (x - x.mean(axis=0)).T @ (x - x.mean(axis=0)) / n
    r_mat, _ = opq_rotation_from_cov(cov, m)
    out = (s_mat, r_mat, r_mat @ s_mat)
    _FIXTURE_CACHE[key] = out
    return out
