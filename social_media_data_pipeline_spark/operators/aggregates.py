"""Aggregation operators (SURVEY.md §2.6, A1-A13).

All built-in aggregates — partial (map-side) aggregation and AQE
coalescing come free. The reference computes these with pandas groupby
on a fully-materialized frame (`Exploration/plotting.py:50-67`,
`Exploration/ExploratoryAnalysis.py:83-108`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# pandas Grouper freq → Spark date_trunc unit (`plotting.py:50-67`)
_FREQ_TO_TRUNC = {
    "Y": "year",
    "Q": "quarter",
    "M": "month",
    "W": "week",
    "D": "day",
    "H": "hour",
    "min": "minute",
}

_AGG_FUNCS = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "mean": lambda c: F.avg(c),
    "median": lambda c: F.median(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def time_bucket(ts_col: str, freq: str) -> Column:
    """Tumbling CALENDAR window bucket — `date_trunc`, not fixed-duration
    `F.window` (calendar months/quarters are irregular)."""
    return F.date_trunc(_FREQ_TO_TRUNC[freq], F.col(ts_col))


def group_by_time(
    df: DataFrame,
    ts_col: str,
    freq: str,
    agg_col: str,
    how: str = "count",
    extra_groups: Sequence[str] = (),
    bucket_name: str = "bucket",
    out_name: str | None = None,
) -> DataFrame:
    """A1/A2 — group by tumbling calendar window (+ optional category).

    Reference: `group_and_aggregate` (`plotting.py:50-67`) with freq in
    {Y,Q,M,W,D} and agg in {count,sum,mean,median}; two-level variant at
    `plotting.py:224,291`.
    """
    out_name = out_name or f"{how}_{agg_col}"
    bucket = time_bucket(ts_col, freq).alias(bucket_name)
    groups = [bucket, *[F.col(c) for c in extra_groups]]
    return df.groupBy(*groups).agg(_AGG_FUNCS[how](F.col(agg_col)).alias(out_name))


def value_counts(
    df: DataFrame, array_col: str, out_value: str = "value", out_count: str = "count"
) -> DataFrame:
    """A3 — explode array → frequency table, descending (ties broken by
    value for determinism).

    Reference: hashtag `value_counts` (`ExploratoryAnalysis.py:88-89`).
    """
    return (
        df.select(F.explode(F.col(array_col)).alias(out_value))
        .groupBy(out_value)
        .agg(F.count(F.lit(1)).alias(out_count))
        .orderBy(F.desc(out_count), F.asc(out_value))
    )


def histogram(
    df: DataFrame, col: str, bin_width: float, out_bin: str = "bin", out_count: str = "count"
) -> DataFrame:
    """A4 — fixed-width histogram via floor-bucketing (single group-by;
    no driver-side numpy `hist`).

    Reference: `hist(bins=30)` (`ExploratoryAnalysis.py:92-99`). The
    engine uses explicit bin width so results are scale-independent.
    """
    bin_expr = F.floor(F.col(col) / F.lit(bin_width)).cast("long").alias(out_bin)
    return df.groupBy(bin_expr).agg(F.count(F.lit(1)).alias(out_count)).orderBy(out_bin)


def describe_numeric(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A5 — count/mean/std/min/median/max per numeric column, one row per
    column (exact median, not approx — SURVEY §7.2 pins this).

    Reference: `df.describe()` (`ExploratoryAnalysis.py:31`).
    """
    aggs = []
    for c in cols:
        aggs.append(
            F.struct(
                F.count(F.col(c)).alias("count"),
                F.avg(F.col(c)).alias("mean"),
                F.stddev(F.col(c)).alias("std"),
                F.min(F.col(c)).cast("double").alias("min"),
                F.median(F.col(c)).alias("median"),
                F.max(F.col(c)).cast("double").alias("max"),
            ).alias(c)
        )
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    return (
        wide.select(F.expr(f"stack({len(cols)}, {stack_expr}) as (column, stats)"))
        .select(
            "column",
            F.col("stats.count").alias("count"),
            F.col("stats.mean").alias("mean"),
            F.col("stats.std").alias("std"),
            F.col("stats.min").alias("min"),
            F.col("stats.median").alias("median"),
            F.col("stats.max").alias("max"),
        )
    )


def profile_column(df: DataFrame, col: str, distinct_cap: int = 20) -> DataFrame:
    """A6 — per-column profile: missing / non-null / distinct count, plus
    the sorted distinct values when few (`summarize`,
    `ExploratoryAnalysis.py:33-44`)."""
    c = F.col(col)
    agg = df.agg(
        F.sum(c.isNull().cast("long")).alias("missing"),
        F.count(c).alias("non_null"),
        F.countDistinct(c).alias("distinct"),
        F.sort_array(F.collect_set(c.cast("string"))).alias("values"),
    )
    return agg.select(
        F.lit(col).alias("column"),
        "missing",
        "non_null",
        "distinct",
        F.when(F.col("distinct") <= distinct_cap, F.col("values")).alias("values"),
    )


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A7 — pairwise Pearson over numeric cols, long format
    (col_x, col_y, corr). Reference: `df.corr()` (`plotting.py:14-21`).

    Single-pass: all pairwise `F.corr` aggregates in one job.
    """
    aggs = [
        F.corr(F.col(a), F.col(b)).alias(f"{a}|{b}") for i, a in enumerate(cols) for b in cols[i:]
    ]
    row = df.agg(*aggs)
    pairs = ", ".join(f"'{a}', '{b}', `{a}|{b}`" for i, a in enumerate(cols) for b in cols[i:])
    n = sum(1 for i, _ in enumerate(cols) for _ in cols[i:])
    return row.select(F.expr(f"stack({n}, {pairs}) as (col_x, col_y, corr)"))


def pivot_agg(
    df: DataFrame,
    row_expr: Column,
    row_name: str,
    pivot_col: str,
    pivot_values: Sequence[str],
    value_col: str,
    how: str = "sum",
) -> DataFrame:
    """A8 — group → columns pivot (`plotting.py:305`). Passing explicit
    `pivot_values` avoids the extra distinct-scan job Spark otherwise
    runs to discover them."""
    return (
        df.groupBy(row_expr.alias(row_name))
        .pivot(pivot_col, list(pivot_values))
        .agg(_AGG_FUNCS[how](F.col(value_col)))
        .na.fill(0)
    )


def relative_to_group(
    df: DataFrame, group_cols: Sequence[str], value_col: str, out_name: str = "share"
) -> DataFrame:
    """A9 — divide each value by its group total — window aggregate, no
    self-join. Reference: `plotting.py:238-241,315-316`."""
    w = Window.partitionBy(*group_cols)
    return df.withColumn(out_name, F.col(value_col) / F.sum(value_col).over(w))


def conditional_status_counts(df: DataFrame, conditions: dict[str, Column]) -> DataFrame:
    """A12 — scalar status frame: one conditional count per named
    predicate (`InstagramImageScraper.py:162-191`)."""
    aggs = [F.sum(F.when(cond, 1).otherwise(0)).alias(name) for name, cond in conditions.items()]
    return df.agg(F.count(F.lit(1)).alias("total"), *aggs)


def funnel_stages(
    ev: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    stages: Sequence[str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Funnel analysis: user-days bucketed by the deepest stage chain
    completed IN ORDER within that day → (funnel_stage, n_user_days).

    Plan: one shuffle keyed (user, day); the per-group payload is the
    ordered event-type sequence (bounded by per-user-day activity),
    evaluated as a JVM regex subsequence match — no Python, no
    self-joins; the final count is a (len(stages)+1)-row aggregate.
    A power-law user splits across days by the composite key, so no
    single task holds a hot user's whole history (measured in
    tools/scale_sensitivity.py --skew).
    """
    e = F.struct(F.col(ts_col), F.col(order_col), F.col(type_col).alias("t"))
    seq = (
        ev.select(
            F.col(user_col), F.date_trunc("day", F.col(ts_col)).alias("day"), e.alias("e")
        )
        .groupBy(user_col, "day")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("e")), lambda s: s["t"]), " "
            ).alias("seq")
        )
    )
    # build innermost-out so the DEEPEST chain is tested first
    stage = F.lit(0)
    for depth in range(1, len(stages) + 1):
        stage = F.when(F.col("seq").rlike(".*".join(stages[:depth])), depth).otherwise(
            stage
        )
    return (
        seq.select(stage.alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_user_days"))
        .orderBy("funnel_stage")
    )


def winsorize(
    df: DataFrame,
    col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    group_cols: tuple[str, ...] = (),
    out_col: str | None = None,
) -> DataFrame:
    """Winsorization — clip `col` to its exact [lo, hi] quantiles
    (per group when `group_cols` given): the standard outlier guard
    before a numeric column feeds training features or a mean-based
    metric (a single corrupt 1e15 value otherwise owns the average).
    Adds `out_col` (default `{col}_w`) plus `__q_lo`/`__q_hi`.

    Plan: one EXACT percentile aggregate per group (Spark's
    `percentile` — sort-based within the aggregate; DuckDB's
    `quantile_cont` interpolates identically, verified to the bit,
    which is what makes the oracle exact), broadcast the tiny quantile
    table back, clip map-side. At 100 TB the exact per-group sort is
    the cost knob: when approximation is acceptable use the mergeable
    sample-quantile sketch (`sketches.sample_quantile_*`) and feed its
    estimates to the same clip expression.
    """
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got ({lo}, {hi})")
    out_col = out_col or f"{col}_w"
    gb = list(group_cols)
    q = df.groupBy(*gb).agg(
        F.expr(f"percentile({col}, {lo!r})").alias("__q_lo"),
        F.expr(f"percentile({col}, {hi!r})").alias("__q_hi"),
    )
    joined = df.join(F.broadcast(q), gb) if gb else df.crossJoin(F.broadcast(q))
    return joined.withColumn(
        out_col,
        F.least(F.greatest(F.col(col), F.col("__q_lo")), F.col("__q_hi")),
    )


def robust_anomalies(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...] = (),
    z: float = 3.5,
) -> DataFrame:
    """Robust outlier DETECTION (winsorize's sibling — flag instead of
    clip): a value is anomalous when its absolute deviation from the
    group median exceeds `z` × 1.4826 × MAD (the median absolute
    deviation; 1.4826 scales MAD to σ under normality — Iglewicz &
    Hoaglin's modified z-score rule, z=3.5 the customary cut). Median
    and MAD are 50%-breakdown estimators: unlike mean/stddev, the
    outliers being hunted cannot drag the threshold toward
    themselves. Adds `__med`, `__mad`, `is_anomaly`.

    Plan: two exact-percentile aggregates (median, then MAD over the
    deviations), each broadcast back; the flag is a map-side
    comparison — division-free, so an all-identical group (MAD 0)
    flags only true deviants and never divides by zero. Exactness
    rides the same verified Spark `percentile` ≡ DuckDB
    `quantile_cont` bit-equality as `winsorize`.
    """
    if z <= 0:
        raise ValueError(f"z must be > 0, got {z}")
    gb = list(group_cols)
    med = df.groupBy(*gb).agg(
        F.expr(f"percentile({col}, 0.5)").alias("__med")
    )
    with_med = df.join(F.broadcast(med), gb) if gb else df.crossJoin(F.broadcast(med))
    dev = F.abs(F.col(col) - F.col("__med"))
    mad = with_med.groupBy(*gb).agg(
        F.expr(f"percentile(abs({col} - __med), 0.5)").alias("__mad")
    )
    out = (
        with_med.join(F.broadcast(mad), gb)
        if gb
        else with_med.crossJoin(F.broadcast(mad))
    )
    return out.withColumn(
        "is_anomaly", dev > F.lit(z) * F.lit(1.4826) * F.col("__mad")
    )


def decayed_sum(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    as_of: str,
    half_life_days: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Recency-decayed aggregate → one row per group with
    `decayed_micro` (Σ value × 0.5^halvings, integer micro-units) and
    `n`: the standard engagement/freshness score where yesterday's
    event outweighs last month's. Decay is STEPPED — the weight
    halves once per completed `half_life_days` window before `as_of`
    — because 0.5^n for integer n is a dyadic rational, EXACTLY
    representable in IEEE doubles: Spark's pow and DuckDB's power
    return bit-identical values, so the oracle replays the float
    product exactly (a smooth per-day decay exponent would be
    transcendental and engine-dependent in the last ulp — the same
    reason the sketch family uses literal correction tables). Rows
    after `as_of` are excluded (no negative exponents).

    Plan: pure map expressions (datediff → floor-div → pow → round)
    feeding one partial-aggregate shuffle — the cheapest possible
    shape; at 100 TB the decay re-evaluates per scan, so persist
    `as_of`-stamped snapshots rather than recomputing a moving target.
    """
    if half_life_days < 1:
        raise ValueError(f"half_life_days must be >= 1, got {half_life_days}")
    days = F.datediff(F.lit(as_of).cast("date"), F.to_date(F.col(ts_col)))
    halvings = F.floor(days / half_life_days)
    decay = F.pow(F.lit(0.5), halvings.cast("double"))
    micro = F.round(F.col(value_col) * decay * 1e6).cast("bigint")
    return (
        df.filter(days >= 0)
        .groupBy(*group_cols)
        .agg(
            F.sum(micro).alias("decayed_micro"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def histogram_drift(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bin_width: float,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-day distribution-drift monitor → (group…, day, n_day,
    n_base, l1_drift): for every day, the L1 distance between that
    day's fixed-width value histogram and the CUMULATIVE histogram of
    all PRIOR days — the ingest-observability gate that catches a
    schema-preserving upstream change (an encoder swap, a unit change,
    a broken scraper flooding one value) before it contaminates
    training data. Days with no baseline (each group's first) are
    excluded: no-baseline is "unknown", not "no drift".

    Exactness discipline: with per-day count c_i, baseline count b_i
    and totals n_d, n_b, the L1 distance Σ|c_i/n_d − b_i/n_b| is
    computed as the INTEGER numerator Σ|c_i·n_b − b_i·n_d| divided
    ONCE by n_d·n_b and rounded to 6dp — one float division per day
    instead of one per bin, so the oracle matches bit-for-bit
    (documented bound: n_d·n_b·bins < 2^63; at volumes beyond that,
    switch the numerator to DECIMAL(38,0)).

    Plan shape (100 TB): one (group, day, bin) count aggregate
    (map-side combinable), a cumulative window PARTITIONED BY
    (group, bin) — bounded by days-per-bin, never event-grain — and a
    per-(group, day) final aggregate. Zero joins; the full-outer bin
    alignment falls out of treating a missing (day, bin) as c_i = 0 on
    exactly one side, which the |±| terms already encode: per-bin
    terms with c_i = 0 contribute b_i·n_d summed over MISSING bins =
    (n_b − Σ_present b_i)·n_d, computed from the window's running
    totals — no dense bin grid materializes.
    """
    g = [F.col(c) for c in group_cols]
    day = F.to_date(F.col(ts_col)).alias("day")
    bin_expr = (
        F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("bin")
    )
    counts = (
        df.select(*g, day, bin_expr)
        .groupBy(*group_cols, "day", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy(*group_cols, "bin")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_base = counts.withColumn(
        "b", F.coalesce(F.sum("c").over(w), F.lit(0))
    )
    # totals per day: n_day over present bins; n_base = all prior days'
    # total = cumulative day totals, derived from a day-grain cumsum
    day_totals = (
        counts.groupBy(*group_cols, "day")
        .agg(F.sum("c").alias("n_day"))
    )
    wdt = (
        Window.partitionBy(*group_cols)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    day_totals = day_totals.withColumn(
        "n_base", F.coalesce(F.sum("n_day").over(wdt), F.lit(0))
    )
    joined = with_base.join(day_totals, [*group_cols, "day"])
    # per-present-bin numerator term |c_i*n_b - b_i*n_d|; bins present
    # only in the BASELINE are the residual (n_b - Σ present b_i)*n_d
    term = F.abs(F.col("c") * F.col("n_base") - F.col("b") * F.col("n_day"))
    per_day = (
        joined.groupBy(*group_cols, "day", "n_day", "n_base")
        .agg(
            F.sum(term).alias("__present"),
            F.sum("b").alias("__b_present"),
        )
        .filter(F.col("n_base") > 0)
    )
    num = (
        F.col("__present")
        + (F.col("n_base") - F.col("__b_present")) * F.col("n_day")
    )
    return per_day.select(
        *group_cols,
        "day",
        "n_day",
        "n_base",
        F.round(num / (F.col("n_day") * F.col("n_base")), 6).alias(
            "l1_drift"
        ),
    )


def k_anonymity_profile(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Privacy release-audit → one row per quasi-identifier group:
    (quasi…, n_rows, n_sensitive_distinct, k_anonymous, l_diverse).
    k-anonymity (Sweeney 2002): every quasi-identifier combination
    must be shared by ≥ k rows, or those rows are re-identifiable by
    linking on the quasi columns; l-diversity (Machanavalkar et al.
    2007): a group additionally needs ≥ l distinct sensitive values,
    or membership alone leaks the sensitive attribute (the homogeneity
    attack k-anonymity misses). The gate a training-data pipeline runs
    BEFORE releasing user-derived tables — the complement of
    `pii_redact`, which scrubs free text while this audits structured
    columns.

    One hash aggregate: count + count_distinct per group, map-side
    combinable; flags are projections. Suppression/generalization of
    failing groups is release policy — join the failing rows back and
    drop or coarsen (the `filter_not_in` anti-join shape).
    """
    if k < 1 or l < 1:
        raise ValueError(f"k and l must be >= 1, got k={k}, l={l}")
    out = (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(sensitive_col).alias("n_sensitive_distinct"),
        )
    )
    return out.select(
        *quasi_cols,
        "n_rows",
        "n_sensitive_distinct",
        (F.col("n_rows") >= k).alias("k_anonymous"),
        (F.col("n_sensitive_distinct") >= l).alias("l_diverse"),
    )


_FREQ_TO_STEP = {"D": "interval 1 day", "W": "interval 7 days",
                 "M": "interval 1 month"}


def densify_calendar(
    df: DataFrame,
    bucket_col: str,
    freq: str = "D",
    group_cols: Sequence[str] = (),
    zero_fill: Sequence[str] = (),
    ffill: Sequence[str] = (),
) -> DataFrame:
    """Calendar densification — the distributed `resample().asfreq()` /
    `fillna` the reference applies after every time-series aggregation
    (`plotting.py:150,307,396` fillna(0) over the combined index): emit
    ONE row per (group, calendar bucket) for EVERY bucket between the
    table's global min and max, zero-filling `zero_fill` measures and
    forward-filling `ffill` measures (last non-null earlier value per
    group; leading buckets before a group's first observation stay
    NULL — there is nothing to carry).

    A dashboard reading sparse aggregates silently interpolates gaps
    away; densifying makes missing days EXPLICIT zeros — the
    completeness complement of `histogram_drift` (which catches
    distribution change but not absence).

    `bucket_col` must already be bucket-aligned (the `time_bucket`
    output — e.g. `group_by_time`'s key). The spine uses the GLOBAL
    range across all groups — the reference's combined-index semantics —
    so every group gets the same calendar axis.

    Scale shape (100 TB): the spine is bucket-count-sized (one
    `sequence()` row per calendar bucket — thousands, not billions) and
    the group list is group-count-sized; their cross join is a
    broadcast of spine × groups, the data attaches with ONE left join
    on the natural (group, bucket) key, and the forward-fill window
    partitions per group — never a global window. The input should be
    the AGGREGATED series (group × bucket grain), not raw events."""
    if freq not in _FREQ_TO_STEP:
        raise ValueError(
            f"densify_calendar supports freq in {sorted(_FREQ_TO_STEP)}, "
            f"got {freq!r}"
        )
    overlap = set(zero_fill) & set(ffill)
    if overlap:
        raise ValueError(
            f"columns {sorted(overlap)} are in both zero_fill and ffill — "
            "pick one fill semantics per column"
        )
    spine = (
        df.agg(
            F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
        )
        .select(
            F.explode(
                F.sequence(
                    F.col("__lo"), F.col("__hi"), F.expr(_FREQ_TO_STEP[freq])
                )
            ).alias(bucket_col)
        )
    )
    if group_cols:
        groups = df.select(*group_cols).distinct()
        spine = groups.crossJoin(F.broadcast(spine))
    keys = [*group_cols, bucket_col]
    out = spine.join(df, keys, "left")
    for c in zero_fill:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if ffill:
        w = (
            Window.partitionBy(*[F.col(c) for c in group_cols])
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in ffill:
            out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
    target_partition_rows: int | None = None,
) -> DataFrame:
    """Shuffle-key skew planner: the measurement behind every
    broadcast-vs-shuffle-vs-salt decision (`joins.salted_join` is the
    actuator; this is the sensor). One map-side-combinable
    groupBy(key).count(), then the top-`top_k` heavy keys with global
    context attached:

    (rank, key, n, share, cum_share, skew_ratio, salt_factor)

    - share / cum_share: this key's fraction of all rows, 6 dp
    - skew_ratio: n ÷ mean-rows-per-key — ">10" is the usual
      salt-or-isolate trigger
    - salt_factor: ceil(n / target_partition_rows) when a target is
      given (how many shuffle partitions this key alone needs — the
      number `salted_join` should spread it over), else 1 when the
      key fits one target partition; NULL without a target.

    Plan: one partial-agg shuffle over the keys + a broadcast 1-row
    totals frame + ONE top-k sort over the (bounded) key-count table —
    never a sort of the data. At 100 TB: key cardinality is the only
    driver of the second stage; for billion-key domains cap it with a
    CMS/heavy-hitter pass first (`sketches.cms_*`), then run this on
    the survivors."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # `is not None`, not truthiness: 0 is an invalid target, not
    # "no target" — and a negative target would emit nonsense salt
    # factors silently
    if target_partition_rows is not None and target_partition_rows < 1:
        raise ValueError(
            "target_partition_rows must be >= 1 (or None for no "
            f"target), got {target_partition_rows}"
        )
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("__total"),
        F.count(F.lit(1)).alias("__distinct"),
    )
    top = (
        counts.orderBy(F.desc("n"), F.asc("key"))
        .limit(int(top_k))
        .crossJoin(F.broadcast(totals))
    )
    from pyspark.sql.window import Window as _W

    w = _W.orderBy(F.desc("n"), F.asc("key")).rowsBetween(
        _W.unboundedPreceding, _W.currentRow
    )
    salt = (
        F.ceil(F.col("n") / F.lit(int(target_partition_rows))).cast("int")
        if target_partition_rows is not None
        else F.lit(None).cast("int")
    )
    return top.select(
        F.row_number()
        .over(_W.orderBy(F.desc("n"), F.asc("key")))
        .alias("rank"),
        "key",
        "n",
        F.round(F.col("n") / F.col("__total"), 6).alias("share"),
        F.round(
            F.sum("n").over(w) / F.col("__total"), 6
        ).alias("cum_share"),
        F.round(
            F.col("n") / (F.col("__total") / F.col("__distinct")), 6
        ).alias("skew_ratio"),
        salt.alias("salt_factor"),
    )
