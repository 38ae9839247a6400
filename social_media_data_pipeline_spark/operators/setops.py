"""Set operations (SURVEY.md §2.9, U1-U3)."""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(dfs: Sequence[DataFrame], allow_missing: bool = True) -> DataFrame:
    """U1 — vertical concat aligning columns BY NAME, null-filling columns
    absent on either side — pandas `pd.concat` semantics
    (`stages.py:82-84`, `base_classes.py:26`).
    """
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs
    )


def except_rows(df: DataFrame, other: DataFrame) -> DataFrame:
    """U3 full-row variant — multiset difference (`exceptAll`)."""
    return df.exceptAll(other)
