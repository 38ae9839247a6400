"""Sequence packing for training-data preparation.

A training pipeline turns variable-length documents into fixed-budget
token sequences. This operator assigns every document a (sequence id,
offset) under CONTIGUOUS packing: documents are laid out in a
deterministic order inside each group, and a document starting at
global token offset `s` lands in sequence ``s // budget`` at offset
``s % budget``. Documents longer than the budget simply span sequences
(the training-side chunker splits at the boundary) — this is the
layout T5/GPT-style pretraining loaders use, and unlike bin-packing
heuristics it is a pure window expression: deterministic, shuffle-once,
and oracle-checkable in any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    budget: int,
    *,
    group_col: str | None = None,
) -> DataFrame:
    """Assign (seq_id, seq_offset) to every document.

    - `tokens_col`: per-document token count (column name or expression,
      e.g. `functions.text.token_count("text")`).
    - `group_col`: packing domain — sequences never mix groups (pack per
      language, per source, per shard). With a group the window is
      `partitionBy(group)` → one shuffle, groups pack in parallel.
      Without one the layout is a single global prefix sum: correct,
      but the sort serializes — at 100 TB ALWAYS pack per shard (derive
      a shard key from `hash(id) % n_shards` and pass it here; each
      shard's sequences are independent, which is exactly what a
      distributed training loader wants).

    Returns the input plus `n_tokens`, `seq_id`, `seq_offset`.
    """
    toks = (F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col).cast(
        "long"
    )
    part = [group_col] if group_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = docs.withColumn("n_tokens", toks)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    out = out.withColumn("_start", start)
    out = out.withColumn(
        "seq_id", F.floor(F.col("_start") / F.lit(budget)).cast("long")
    ).withColumn("seq_offset", (F.col("_start") % F.lit(budget)).cast("long"))
    return out.drop("_start")
