"""Stratified / capped sampling (SURVEY.md §2.3 D3).

Reference: `select_n_images_per_year` (`Preprocessor.py:198-217`) draws
`np.random.choice` n rows per year without replacement and FLAGS (not
deletes) the non-selected rows via `scrape_image=False`. That is a
per-group random top-k — exactly `row_number` over a random order.

The engine makes the draw deterministic: ordering by a keyed hash
(md5 of the row key + seed) is a fixed uniform-ish permutation, so tests
and the DuckDB oracle reproduce it bit-for-bit (SURVEY.md §7.2 risk
item). One shuffle on the stratum key; no driver-side per-group loop
(the reference loops over `df[ts].dt.year.unique()` on the driver).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _keyed_hash(key_col: str, seed: str) -> Column:
    return F.md5(F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string")))


def weighted_mixture_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    id_col: str,
    seed: str = "mix-v1",
    default_rate: float = 1.0,
) -> DataFrame:
    """Training mixture weights: keep each row with its group's rate,
    decided by a salted 32-bit fingerprint of the row id — so the draw
    is deterministic, re-run-stable, and append-stable (a kept document
    stays kept when the corpus grows), unlike `df.sample`.

    Pure map-side (no shuffle, no state): rate comparison against
    fingerprint % 1e6 inlines into the scan at any scale. Rates are
    per-ROW keep probabilities; for token-weighted mixtures, compose
    with a token-count column upstream and solve rates offline.
    """
    from social_media_data_pipeline_spark.operators.splits import fingerprint32

    for g, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {g!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    draw = fingerprint32(id_col, seed) % 1_000_000
    thresh = F.lit(int(default_rate * 1_000_000))
    for g, r in sorted(rates.items()):
        thresh = F.when(
            F.col(group_col) == g, F.lit(int(r * 1_000_000))
        ).otherwise(thresh)
    return df.filter(draw < thresh)


def sample_n_per_group(
    df: DataFrame,
    group_expr: Column,
    key_col: str,
    n: int,
    seed: str = "42",
    flag_col: str | None = None,
) -> DataFrame:
    """Per-group cap: keep (or flag) at most `n` rows per group.

    - `flag_col=None`: rows beyond the cap are dropped.
    - `flag_col="scrape_image"`: reference semantics — all rows kept,
      selected ones flagged True (`Preprocessor.py:214-216`).
    - `n < 0`: no-op cap (reference `max_images_per_year -1` disables).
    """
    if n < 0:
        return df.withColumn(flag_col, F.lit(True)) if flag_col else df
    w = Window.partitionBy(group_expr).orderBy(
        _keyed_hash(key_col, seed), F.col(key_col)
    )
    ranked = df.withColumn("__rn", F.row_number().over(w))
    if flag_col is not None:
        return ranked.withColumn(flag_col, F.col("__rn") <= F.lit(n)).drop("__rn")
    return ranked.filter(F.col("__rn") <= F.lit(n)).drop("__rn")


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    seed: str = "wsample-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, derandomized: the
    Efraimidis-Spirakis A-Res scheme (IPL 2006, public paper) — each
    row draws u in (0,1] and ranks by u^(1/w), equivalently
    ln(u)/w; the top-k ranks are the sample. Higher-weight rows get
    keys nearer zero, so inclusion probability is proportional to
    weight, and the whole draw is one ordering — no rejection loop.

    The draw is keyed (salted md5 fingerprint of the id), not rand():
    re-runs and appends reproduce the same sample (the mixture-sample
    contract), and the DuckDB oracle replays it exactly. The sample
    key is rounded to 8 dp before ranking so both engines compare the
    same values (ties broken by id; sub-1e-8 ln() ulp differences
    cannot flip an order).

    Scale shape: key evaluation is map-side; top-k is
    TakeOrderedAndProject (per-partition heads + one k-row merge), so
    nothing global ever sorts. Output: (id, weight, sample_key),
    ordered by rank.
    """
    from social_media_data_pipeline_spark.operators.splits import fingerprint32

    # A-Res is only defined for w > 0: a negative weight flips ln(u)/w
    # positive and would rank that row above every valid row; zero/NULL
    # yields a NULL key. Such rows have no meaningful inclusion
    # probability, so they are excluded from the draw (mirroring the
    # eager rate validation in weighted_mixture_sample, which validates
    # its Python-side rates; weights here are data, so the guard is a
    # map-side filter, not a driver check).
    df = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    u = (fingerprint32(id_col, seed) + F.lit(1)) / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col(weight_col), 8)
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col),
            key.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
    )


def _reject_null_groups(hist: dict, op: str, group_col: str) -> None:
    """NULL group values have no bucket in the threshold map: the
    equality CASE chain and the broadcast join would both silently DROP
    those rows, and `sorted()` over the collected histogram would crash
    on the None key. Refuse loudly instead (coalesce to a sentinel
    source upstream if NULL sources are expected) — checked on the
    already-collected histogram, so it costs no extra job."""
    if any(g is None for g in hist):
        raise ValueError(
            f"{op}: group column {group_col!r} contains NULL; mixture "
            "sampling has no NULL bucket and would silently drop those "
            "rows — coalesce to a sentinel source first"
        )


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    target_frac: float = 0.5,
    seed: str = "temp-mix-v1",
    weights: dict | None = None,
) -> DataFrame:
    """α=0.5 temperature source balancing — the standard multilingual /
    multi-source data-mixing rule (sampling distribution ∝ p_source^α,
    the mT5/XLM-R recipe; public formulation): high-resource sources
    are downsampled, low-resource ones kept, with the expected total
    kept fraction ≈ `target_frac`.

    Per-source keep probability r_i = target_frac · N · q_i / n_i
    (capped at 1), q_i = √n_i / Σ_j √n_j. EXACT integer arithmetic end
    to end: s_i = floor(√n_i · 1e6 + 0.5) (IEEE sqrt/multiply are
    correctly rounded in every engine, unlike pow — which is why the
    registered α is ½), S = Σ s_i, keep iff
        fingerprint(id) % 1e6 < min(1e6, (TM · N · s_i) div (S · n_i))
    with TM = round(target_frac · 1e6). The threshold products exceed
    int64 at petabyte counts, so they are computed in Python
    arbitrary-precision integers from the collected source histogram
    (sources ≪ rows — the same bounded-collect class as the library's
    other driver scalars) and the oracle replays them with HUGEINT
    division; both are exact, so the draw replays bit-for-bit.
    Deterministic, re-run-stable, append-biased only by the count
    refresh (same contract as `weighted_mixture_sample`, which stays
    the arbitrary-rate tool; this operator COMPUTES the rates from the
    live source histogram).

    Plan: one map-side-combinable groupBy(source).count() (collected:
    one row per source), then a pure map-side fingerprint comparison
    against the broadcast threshold map. No window, no big shuffle.
    """
    import math as _math

    if not 0.0 < target_frac <= 1.0:
        raise ValueError(f"target_frac must be in (0,1], got {target_frac}")
    from social_media_data_pipeline_spark.operators.splits import fingerprint32

    tm = int(round(target_frac * 1_000_000))
    if weights is not None:
        # caller-supplied exact integer masses per group (e.g. BPE
        # TOKEN counts — `docs_fertility_mixture` balances the token
        # budget, not the doc count: fertility-corrected mixing, Rust
        # et al. 2021). The draw stays per-ROW, so the kept TOKEN mass
        # per group is calibrated in expectation at the group grain.
        bad = {g: w for g, w in weights.items() if not isinstance(w, int) or w <= 0}
        if bad:
            raise ValueError(
                f"temperature_mixture_sample: weights must be positive "
                f"integers, got {bad}"
            )
        # a group present in df but absent from weights has no CASE
        # branch (default threshold 0) / no join match — its rows would
        # be SILENTLY dropped, unlike the histogram path which covers
        # every live group by construction. Refuse loudly; the distinct
        # scan is group-count-bounded (same class as the histogram job).
        live = {
            r[group_col] for r in df.select(group_col).distinct().collect()
        }
        uncovered = sorted(g for g in live if g is not None and g not in weights)
        if uncovered:
            raise ValueError(
                f"temperature_mixture_sample: weights missing groups "
                f"present in df: {uncovered[:10]}{'…' if len(uncovered) > 10 else ''} "
                "— every live group needs a weight (rows in uncovered "
                "groups would be silently dropped)"
            )
        if None in live:
            _reject_null_groups({None: 1}, "temperature_mixture_sample", group_col)
        hist = dict(weights)
    else:
        hist = {
            r[group_col]: int(r["__n"])
            for r in df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n")).collect()
        }
    if not hist:
        return df
    _reject_null_groups(hist, "temperature_mixture_sample", group_col)
    s_by_g = {g: _math.floor(_math.sqrt(n) * 1_000_000.0 + 0.5) for g, n in hist.items()}
    big_n = sum(hist.values())
    big_s = sum(s_by_g.values())
    thresh = {
        g: min(1_000_000, (tm * big_n * s_by_g[g]) // (big_s * n))
        for g, n in hist.items()
    }
    draw = fingerprint32(id_col, seed) % 1_000_000
    if len(thresh) <= 64:
        # literal CASE chain: pure map-side, zero joins (the audited
        # plan for source-count-bounded corpora)
        tcol = F.lit(0)
        for g in sorted(thresh):
            tcol = F.when(F.col(group_col) == g, F.lit(thresh[g])).otherwise(tcol)
        return df.filter(draw < tcol)
    # many sources (e.g. per-domain balancing): a 100k-branch CASE
    # would blow up the plan — broadcast-join the threshold table
    spark = df.sparkSession
    rates = spark.createDataFrame(
        sorted(thresh.items()), f"{group_col} string, __thresh bigint"
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(draw < F.col("__thresh"))
        .drop("__thresh")
    )


def solve_mixture_rates(
    counts: dict, targets_micro: dict, budget_rows: int
) -> dict:
    """Capped waterfilling: per-group keep-rate thresholds (micro-units)
    so kept rows hit `budget_rows` split by `targets_micro` RELATIVE
    weights (only ratios matter — no normalization required) — except a group cannot yield more rows than it has:
    capped groups keep everything and their unmet share redistributes
    to the others, proportionally to their targets (the standard
    waterfilling fixed point, reached in ≤ |groups| rounds).

    Exact integer arithmetic (Python big ints) round for round:
    per round, kc = rows kept by capped groups, tt = Σ targets of
    uncapped groups, want_g = (max(budget − kc, 0) · t_g) div tt; a
    group with want ≥ n caps. Final rate_g = capped → 1e6 else
    clamp((want_g · 1e6) div n_g). `build_mixture_rates_sql` emits the
    identical chain for the differential oracle."""
    groups = sorted(counts)
    capped: set = set()
    for _ in range(len(groups)):
        kc = sum(counts[g] for g in capped)
        tt = sum(targets_micro.get(g, 0) for g in groups if g not in capped)
        if tt == 0:
            break
        newly = False
        for g in groups:
            if g in capped:
                continue
            want = (max(budget_rows - kc, 0) * targets_micro.get(g, 0)) // tt
            if want >= counts[g]:
                capped.add(g)
                newly = True
        if not newly:
            break
    kc = sum(counts[g] for g in capped)
    tt = sum(targets_micro.get(g, 0) for g in groups if g not in capped)
    rates = {}
    for g in groups:
        if g in capped:
            rates[g] = 1_000_000
        elif tt == 0:
            rates[g] = 0
        else:
            want = (max(budget_rows - kc, 0) * targets_micro.get(g, 0)) // tt
            rates[g] = max(0, min(1_000_000, (want * 1_000_000) // counts[g]))
    return rates


def build_mixture_rates_sql(
    targets_micro: dict, budget_rows: int, n_rounds: int, table: str = "documents",
    group_col: str = "source",
) -> str:
    """Generated DuckDB CTE chain replaying `solve_mixture_rates`
    exactly (`n_rounds` unconditional rounds — the fixed point is
    stable, so running all |groups| rounds matches the early-exit
    Python loop bit-for-bit). Emits CTEs ending in `rates(source,
    rate)`; HUGEINT keeps the products exact at any corpus size."""
    vals = ", ".join(
        f"('{g}', {t})" for g, t in sorted(targets_micro.items())
    )
    parts = [
        f"""WITH tgt(grp, t) AS (VALUES {vals}),
cnt AS MATERIALIZED (
    SELECT {group_col} AS grp, COUNT(*)::BIGINT AS n FROM {table} GROUP BY {group_col}
), w0 AS MATERIALIZED (
    SELECT c.grp, c.n, COALESCE(tgt.t, 0)::BIGINT AS t, FALSE AS capped
    FROM cnt c LEFT JOIN tgt USING (grp)
)"""
    ]
    for r in range(1, n_rounds + 1):
        parts.append(
            f""", s{r} AS MATERIALIZED (
    SELECT COALESCE(SUM(CASE WHEN capped THEN n END), 0)::HUGEINT AS kc,
           COALESCE(SUM(CASE WHEN NOT capped THEN t END), 0)::HUGEINT AS tt
    FROM w{r - 1}
), w{r} AS MATERIALIZED (
    SELECT grp, n, t,
           capped OR (s{r}.tt > 0 AND
               ((GREATEST({budget_rows} - s{r}.kc, 0) * t) // s{r}.tt) >= n) AS capped
    FROM w{r - 1}, s{r}
)"""
        )
    parts.append(
        f""", sf AS MATERIALIZED (
    SELECT COALESCE(SUM(CASE WHEN capped THEN n END), 0)::HUGEINT AS kc,
           COALESCE(SUM(CASE WHEN NOT capped THEN t END), 0)::HUGEINT AS tt
    FROM w{n_rounds}
), rates AS MATERIALIZED (
    SELECT grp,
           CASE WHEN capped THEN 1000000
                WHEN sf.tt = 0 THEN 0
                ELSE LEAST(1000000, GREATEST(0,
                    (((GREATEST({budget_rows} - sf.kc, 0) * t) // sf.tt)
                     * 1000000) // n)) END::BIGINT AS rate
    FROM w{n_rounds}, sf
)"""
    )
    return "".join(parts)


def mixture_sample_to_targets(
    df: DataFrame,
    group_col: str,
    id_col: str,
    targets: dict,
    budget_rows: int,
    seed: str = "target-mix-v1",
    weight_col: str | None = None,
) -> DataFrame:
    """Target-proportion mixture sampling — the solver-backed member of
    the mixture family (fixed rates → `weighted_mixture_sample`,
    α-balancing → `temperature_mixture_sample`, THIS → "hit these
    per-source proportions within this row budget"): keep rates come
    from `solve_mixture_rates` over the live histogram, so scarce
    sources cap at 100% and their unmet share flows to the rest.
    Deterministic salted-fingerprint draw; one histogram aggregate +
    a map-side filter (literal CASE ≤64 groups, broadcast join above,
    the `temperature_mixture_sample` pattern)."""
    from social_media_data_pipeline_spark.operators.splits import fingerprint32

    if budget_rows < 0:
        raise ValueError(f"budget_rows must be >= 0, got {budget_rows}")
    tm = {g: int(round(t * 1_000_000)) for g, t in targets.items()}
    # `weight_col` switches the budget's unit: the histogram becomes
    # per-source MASS (e.g. token counts) instead of rows, so
    # `budget_rows` is then a token budget — keep probability stays
    # uniform within a source, expectations solve identically
    mass = (
        F.count(F.lit(1)) if weight_col is None
        else F.sum(F.col(weight_col).cast("bigint"))
    )
    counts = {
        r[group_col]: int(r["__n"])
        for r in df.groupBy(group_col).agg(mass.alias("__n")).collect()
    }
    if not counts:
        return df
    _reject_null_groups(counts, "mixture_sample_to_targets", group_col)
    rates = solve_mixture_rates(counts, tm, budget_rows)
    draw = fingerprint32(id_col, seed) % 1_000_000
    if len(rates) <= 64:
        tcol = F.lit(0)
        for g in sorted(rates):
            tcol = F.when(F.col(group_col) == g, F.lit(rates[g])).otherwise(tcol)
        return df.filter(draw < tcol)
    spark = df.sparkSession
    rdf = spark.createDataFrame(
        sorted(rates.items()), f"{group_col} string, __thresh bigint"
    )
    return (
        df.join(F.broadcast(rdf), group_col)
        .filter(draw < F.col("__thresh"))
        .drop("__thresh")
    )


#: the registered docs_mixture_solver configuration: heavy targets on
#: three sources (which cap at this budget — the waterfilling path is
#: exercised, not just proportional scaling), the rest split evenly.
#: Shared by the entry query and the generated oracle so both sides
#: always agree literally.
DOC_MIXTURE_TARGETS = {
    **{"src0": 0.30, "src1": 0.20, "src2": 0.20},
    **{
        f"src{i}": (0.30 / 17 if i < 19 else 0.30 - 16 * (0.30 / 17))
        for i in range(3, 20)
    },
}
DOC_MIXTURE_BUDGET = 300


def negative_pairs(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    seed: str = "neg-v1",
) -> DataFrame:
    """k deterministic uniform negative partners per anchor row →
    (anchor_id, sample_idx, neg_id) — the contrastive-training data
    generator (in-batch/random negatives for embedding training, the
    SimCLR/DPR recipe) WITHOUT a cartesian product and without rand()
    (task retries corrupt rand() sampling — the salted-join lesson).

    Construction: a dense 1..N index from
    `splits.deterministic_shuffle` (md5 order, bucket-offset
    decomposition — no global window), then per anchor k independent
    md5 draws mapped to [1, N−1] with the classic skip-self shift
    (idx ≥ own position → idx+1), so every partner is uniform over the
    other N−1 rows, exactly — and the whole construction replays in
    SQL (`ROW_NUMBER` + the same md5 arithmetic), so the sampler is
    differentially testable. Partners resolve via one hash-equi join
    on the dense index.

    Scale shape: one rank shuffle + one partial-agg counts pass (from
    deterministic_shuffle) + one equi join; output is exactly k·N
    rows. Self-pairs are impossible by construction; duplicate
    partners across an anchor's k draws are possible (independent
    draws, birthday-rare for k ≪ N) — dedup downstream if the loss
    requires distinct negatives.
    """
    from social_media_data_pipeline_spark.operators.splits import (
        deterministic_shuffle,
        fingerprint32,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pos = (
        deterministic_shuffle(
            df.select(id_col), id_col, seed=f"{seed}:perm", pos_col="__pos"
        )
        .select(id_col, "__pos")
        .localCheckpoint(eager=True)  # consumed by both join sides
    )
    stats = pos.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(id_col).alias("nd"),
    ).collect()[0]
    n = int(stats["n"])
    if n < 2:
        raise ValueError(
            f"negative_pairs needs >= 2 rows to sample partners, got {n}"
        )
    # duplicate ids would tie in the permutation (identical md5 key),
    # making positions — and therefore the sample — nondeterministic
    # across runs: refuse loudly (the rand()-corruption hazard class)
    if int(stats["nd"]) != n:
        raise ValueError(
            f"negative_pairs: {id_col!r} has {n - int(stats['nd'])} "
            "duplicate ids — the anchor id must be unique for the "
            "deterministic permutation; dedup first"
        )
    draws = F.array(
        *[
            F.struct(
                F.lit(j).alias("sample_idx"),
                (F.pmod(fingerprint32(id_col, f"{seed}:{j}"), F.lit(n - 1)) + 1)
                .alias("__idx"),
            )
            for j in range(1, k + 1)
        ]
    )
    anchors = (
        pos.select(
            F.col(id_col).alias("anchor_id"),
            F.col("__pos").alias("__apos"),
            F.explode(draws).alias("__d"),
        )
        .select(
            "anchor_id",
            F.col("__d.sample_idx").alias("sample_idx"),
            (
                F.col("__d.__idx")
                + (F.col("__d.__idx") >= F.col("__apos")).cast("bigint")
            ).alias("__ppos"),
        )
    )
    return anchors.join(
        pos.select(F.col(id_col).alias("neg_id"), F.col("__pos").alias("__ppos")),
        "__ppos",
    ).select("anchor_id", "sample_idx", "neg_id")
