"""Distributed Bloom-filter membership: build as a one-row DataFrame,
probe as a pure column expression.

Spark's internal `BloomFilterAggregate` is not registered in the public
function registry (4.1), and `DataFrameStatFunctions.bloomFilter`
returns a driver-side Java object that can only be probed through
per-row Py4J calls — both dead ends for a query-path operator. This
module builds the filter WITH the engine instead: the bit array is a
`map<bigint, bigint>` of 64-bit words aggregated via `bit_or`, carried
in a single row, and probed by a broadcast + JVM-side bit test. No
Python runs in the executor path on either side.

Scale shape (100 TB):
- build: one map-side explode of k bit positions per value, ONE shuffle
  keyed on the word index carrying `bit_or` partials (≤ num_bits/64
  rows regardless of input size), then a single-row map assembly.
- probe: the filter broadcasts (num_bits/8 bytes ≤ a few MB for
  realistic sizes); membership is k xxhash64 calls + k map lookups per
  row, map-side, inside whole-stage codegen.
- the standard two-phase pattern (`bloom_decontaminate`) keeps results
  EXACT: the bloom prunes the big side map-side (no false negatives),
  the surviving sliver joins the true set to kill false positives —
  same output as the exact join, a fraction of the shuffle.

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; the helper
`suggest_num_bits` applies the textbook m = -n·ln(p)/ln(2)² rule.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_num_bits(expected_items: int, fpp: float = 0.01) -> int:
    """Textbook Bloom sizing: m = -n ln(p) / ln(2)^2, rounded up to a
    multiple of 64 (whole words)."""
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    m = -expected_items * math.log(fpp) / (math.log(2) ** 2)
    return max(64, int(math.ceil(m / 64.0)) * 64)


def bloom_filter_table(
    values: DataFrame, value_col: str, num_bits: int, num_hashes: int = 5
) -> DataFrame:
    """Aggregate a Bloom filter over `values[value_col]` (strings) into a
    ONE-ROW DataFrame with column `bloom: map<bigint, bigint>` — word
    index → 64-bit word. Bit positions are `pmod(xxhash64(v, seed), m)`
    for seed in [0, num_hashes)."""
    positions = values.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(value_col), F.lit(s)), F.lit(num_bits))
                    for s in range(num_hashes)
                ]
            )
        ).alias("j")
    )
    words = positions.select(
        F.shiftright(F.col("j"), 6).alias("w"),
        # PySpark's shiftleft() wrapper only takes a literal amount; the
        # SQL form accepts a column
        F.expr("shiftleft(1L, cast(pmod(j, 64) as int))").alias("bit"),
    ).groupBy("w").agg(F.expr("bit_or(bit)").alias("bits"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bloom")
    )


def might_contain_expr(
    value_col, num_bits: int, num_hashes: int = 5, bloom_col: str = "bloom"
):
    """Membership predicate against a Bloom map column (as produced by
    `bloom_filter_table`, typically broadcast-cross-joined in). True ⇒
    maybe member (FP possible); False ⇒ definitely not a member.

    Built from Column expressions (not SQL-string interpolation), so
    column names that would need backtick quoting — or an arbitrary
    Column expression — work; `shiftleft` with a column shift amount
    goes through `F.call_function` (the PySpark wrapper only accepts a
    literal amount)."""
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    bloom = F.col(bloom_col)
    pred = None
    for s in range(num_hashes):
        j = F.pmod(F.xxhash64(col, F.lit(s)), F.lit(num_bits))
        word = F.coalesce(
            F.element_at(bloom, F.shiftright(j, 6)), F.lit(0).cast("long")
        )
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(j, F.lit(64)).cast("int")
        )
        term = (word.bitwiseAND(bit)) != 0
        pred = term if pred is None else pred & term
    return pred


def bloom_semi_join(
    big: DataFrame,
    value_col: str,
    small_values: DataFrame,
    small_col: str,
    num_bits: int | None = None,
    num_hashes: int = 5,
    expected_items: int | None = None,
    fpp: float = 0.01,
    exact: bool = True,
) -> DataFrame:
    """Semi-join `big` against the value set of `small_values` with a
    Bloom prefilter. With `exact=True` (default) the bloom survivors are
    confirmed by a real (left-semi) join against the true set, so the
    result is EXACTLY the semi-join — the bloom only cuts the join
    input. With `exact=False` you get the raw bloom verdict (no second
    join, FPs possible) — the streaming/approximate path.

    `num_bits` defaults to `suggest_num_bits(expected_items, fpp)`;
    `expected_items` must then be given (an exact pre-count of the small
    side would add a job)."""
    if num_bits is None:
        if expected_items is None:
            raise ValueError("pass num_bits or expected_items")
        num_bits = suggest_num_bits(expected_items, fpp)
    small = small_values.select(F.col(small_col).alias("__v")).distinct()
    # collision-safe internal name: a pre-existing 'bloom' column on the
    # big side must survive the join + drop untouched
    bloom = bloom_filter_table(small, "__v", num_bits, num_hashes).select(
        F.col("bloom").alias("__bloom")
    )
    pre = big.join(F.broadcast(bloom)).filter(
        might_contain_expr(value_col, num_bits, num_hashes, bloom_col="__bloom")
    ).drop("__bloom")
    if not exact:
        return pre
    return pre.join(
        F.broadcast(small.withColumnRenamed("__v", value_col)), value_col, "left_semi"
    )
