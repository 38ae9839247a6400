"""Declarative data-quality constraint verification (Deequ-style).

A curation pipeline gates every ingested table on declared invariants —
null budgets, key uniqueness, value domains, ranges, foreign-key
containment — before anything downstream reads it (Schelter et al.
2018, "Automating large-scale data quality verification", VLDB — the
public formulation this module follows; the reference pipeline
hand-rolls the same idea as ad-hoc `dropna`/`isin` guards scattered
through `Preprocessing/Preprocessor.py:94-132`).

Design: constraints are DATA (tuples), not callbacks, so the suite is
inspectable and the report is replayable in SQL. All single-table
constraints evaluate in ONE aggregate pass over ONE scan — each
constraint contributes a conditional-count expression, the single
result row unpivots (`F.stack`) into one report row per constraint.
Referential constraints add one anti-join count each (broadcast when
the referenced key side is dim-sized). Violation counts are exact
integers — the report hashes bit-for-bit cross-engine, no float
thresholds in the gate itself.

Report row: (constraint, column, violations, total, passed).
`passed` = violations <= allowed (default 0). `total` is the number of
rows the constraint inspected (table rows; for `unique` the number of
non-null rows), so downstream dashboards can derive fractions at read
time without the report losing exactness.

Scale shape (100 TB): the single-pass aggregate is map-side
combinable (conditional sums), so the whole base-table suite costs one
scan + a 1-row reduce; each referential check is a broadcast semi/anti
join against the (dim-sized) key side; nothing is row-expanded and no
constraint adds a window or a second scan of the fact table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# constraint tuples: (kind, column, params...)


def not_null(col: str, allowed: int = 0) -> tuple:
    """Violations = NULL rows in `col` (at most `allowed`)."""
    return ("not_null", col, allowed)


def unique(col: str, allowed: int = 0) -> tuple:
    """Violations = non-null rows beyond one per distinct value
    (count(col) − count(distinct col)) — 0 means `col` is a key
    among non-null rows (pair with `not_null` for a primary key)."""
    return ("unique", col, allowed)


def in_range(col: str, lo=None, hi=None, allowed: int = 0) -> tuple:
    """Violations = non-null rows outside [lo, hi] (either bound may
    be None for a one-sided range)."""
    if lo is None and hi is None:
        raise ValueError("in_range needs at least one bound")
    return ("in_range", col, lo, hi, allowed)


def accepted_values(col: str, values: Sequence, allowed: int = 0) -> tuple:
    """Violations = non-null rows whose value is not in `values`."""
    if not values:
        raise ValueError("accepted_values needs a non-empty value set")
    return ("accepted_values", col, tuple(values), allowed)


def matches(col: str, pattern: str, allowed: int = 0) -> tuple:
    """Violations = non-null rows whose value does not match regex
    `pattern` (rlike semantics — a PARTIAL match anywhere counts, the
    same contract DuckDB's regexp_matches replays; anchor with ^…$
    when the whole value must match, as the registered audit does)."""
    return ("matches", col, pattern, allowed)


def row_count(min_rows: int = 1, max_rows: int | None = None) -> tuple:
    """Table-level bound: total row count inside [min_rows, max_rows].
    Violations = the shortfall/excess (so the report says how far off)."""
    return ("row_count", None, min_rows, max_rows)


def referential(
    col: str,
    ref: DataFrame,
    ref_col: str,
    allowed: int = 0,
    broadcast: bool = True,
) -> tuple:
    """Violations = non-null rows whose `col` value has no match in
    `ref[ref_col]` (FK containment; orphans). One anti-join count.
    `broadcast=True` (default) hints the distinct referenced-key side
    for the dim-table case; pass `broadcast=False` for fact-to-fact FK
    checks so the anti-join degrades to a shuffle instead of
    collecting a fact-sized key set onto every executor."""
    return ("referential", col, ref, ref_col, allowed, bool(broadcast))


def _violation_expr(c: tuple):
    """(violations expr, total expr) for a single-pass constraint."""
    kind, col = c[0], c[1]
    nn = F.count(F.col(col)) if col else None
    if kind == "not_null":
        return (F.count(F.lit(1)) - F.count(F.col(col)), F.count(F.lit(1)))
    if kind == "unique":
        return (F.count(F.col(col)) - F.countDistinct(F.col(col)), nn)
    if kind == "in_range":
        lo, hi = c[2], c[3]
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(col) < F.lit(lo))
        if hi is not None:
            cond = cond | (F.col(col) > F.lit(hi))
        # coalesce: F.sum over ZERO rows is NULL, not 0 — an empty table
        # must report 0 violations / passed=true, not NULL
        return (F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)), nn)
    if kind == "accepted_values":
        bad = ~F.col(col).isin(list(c[2])) & F.col(col).isNotNull()
        return (F.coalesce(F.sum(F.when(bad, 1).otherwise(0)), F.lit(0)), nn)
    if kind == "matches":
        bad = F.col(col).isNotNull() & ~F.col(col).rlike(c[2])
        return (F.coalesce(F.sum(F.when(bad, 1).otherwise(0)), F.lit(0)), nn)
    if kind == "row_count":
        lo, hi = c[2], c[3]
        n = F.count(F.lit(1))
        short = F.greatest(F.lit(lo) - n, F.lit(0))
        over = (
            F.greatest(n - F.lit(hi), F.lit(0)) if hi is not None else F.lit(0)
        )
        return (short + over, n)
    raise ValueError(f"unknown constraint kind {kind!r}")


def _label(c: tuple) -> tuple[str, str, int]:
    """(constraint label, column, allowed) for the report row."""
    kind, col = c[0], c[1]
    if kind == "in_range":
        return (f"in_range[{c[2]},{c[3]}]", col, c[4])
    if kind == "accepted_values":
        return (f"accepted_values[{','.join(map(str, c[2]))}]", col, c[3])
    if kind == "matches":
        return (f"matches[{c[2]}]", col, c[3])
    if kind == "row_count":
        return (f"row_count[{c[2]},{c[3]}]", "*", 0)
    if kind == "referential":
        return (f"referential[{c[3]}]", col, c[4])
    return (kind, col, c[2])


def constraint_report(df: DataFrame, constraints: Sequence[tuple]) -> DataFrame:
    """Evaluate `constraints` against `df` → one report row each:
    (constraint, column, violations, total, passed), in declaration
    order (an `ord` aggregate-free projection keeps the order stable
    for ordering-sensitive consumers; sort on it or on (constraint,
    column)). All non-referential constraints fold into ONE aggregate
    over ONE scan; each referential constraint adds one anti-join
    count against its referenced keys."""
    if not constraints:
        raise ValueError("constraint_report: empty constraint list")
    single = [
        (i, c) for i, c in enumerate(constraints) if c[0] != "referential"
    ]
    refs = [
        (i, c) for i, c in enumerate(constraints) if c[0] == "referential"
    ]

    parts = []
    if single:
        aggs = []
        row_structs = []
        for i, (ordinal, c) in enumerate(single):
            v, t = _violation_expr(c)
            aggs.append(v.cast("bigint").alias(f"__v{i}"))
            aggs.append(t.cast("bigint").alias(f"__t{i}"))
            label, col, allowed = _label(c)
            # Column-API unpivot (explode of an array of structs), NOT a
            # selectExpr stack() string: labels carry user data (regex
            # patterns, accepted values) and must never be re-parsed as
            # SQL — a quote in a pattern would break the query and a
            # backslash would silently corrupt the label.
            row_structs.append(
                F.struct(
                    F.lit(label).alias("constraint"),
                    F.lit(col).alias("column"),
                    F.col(f"__v{i}").alias("violations"),
                    F.col(f"__t{i}").alias("total"),
                    F.lit(int(allowed)).cast("bigint").alias("allowed"),
                    F.lit(int(ordinal)).alias("ord"),
                )
            )
        one = df.agg(*aggs)
        parts.append(
            one.select(F.explode(F.array(*row_structs)).alias("__r"))
            .select("__r.*")
        )
    for ordinal, c in refs:
        _, col, ref, ref_col, allowed = c[:5]
        do_broadcast = c[5] if len(c) > 5 else True
        label, _, _ = _label(c)
        ref_keys = ref.select(F.col(ref_col).alias(col)).distinct()
        if do_broadcast:
            ref_keys = F.broadcast(ref_keys)
        orphans = (
            df.select(F.col(col))
            .filter(F.col(col).isNotNull())
            .join(ref_keys, col, "left_anti")
            .agg(F.count(F.lit(1)).alias("violations"))
        )
        total = df.agg(F.count(F.col(col)).alias("total"))
        parts.append(
            orphans.crossJoin(F.broadcast(total)).select(
                F.lit(label).alias("constraint"),
                F.lit(col).alias("column"),
                F.col("violations").cast("bigint"),
                F.col("total").cast("bigint"),
                F.lit(int(allowed)).cast("bigint").alias("allowed"),
                F.lit(ordinal).alias("ord"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "constraint",
        "column",
        "violations",
        "total",
        (F.col("violations") <= F.col("allowed")).alias("passed"),
        "ord",
    )
