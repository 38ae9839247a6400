"""Scale-out primitives: layout and skew tools for the 100 TB deployment.

The reference runs one pandas process; nothing here has a reference
analog — these are the knobs that make every operator in this engine
hold up at 1000 executors (SURVEY.md §7.1 M8 notes):

- `write_partitioned`: stage tables partitioned by access pattern
  (posts by year/month — P4, D3, A1 all prune on it).
- `write_bucketed`: co-located join layout; repeated joins on the same
  key (comments ⋈ posts on owner_id) stop shuffling entirely.
- `salted_join`: explicit skew-breaker for power-law keys (one celebrity
  owner_id = one straggler partition) — AQE's skew splitting handles
  sort-merge joins, salting also covers aggregations.
- `key_skew_profile`: measure before salting; salt only what's skewed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet: predicates on `partition_cols`
    prune whole directories at plan time (verify via
    `tools/explain_audit.py` — PartitionFilters in the scan)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 64,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table (requires a metastore catalog entry): joins and
    aggregations keyed on `bucket_cols` read co-located buckets and skip
    the exchange on both sides."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Top key frequencies + share of total — decide whether to salt."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.round(F.col("n") / F.lit(total), 6))
        .orderBy(F.desc("n"), F.asc(key))
        .limit(top)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side salts each row into one of
    `salt_buckets` sub-keys; the small side replicates across all salts.
    One hot key becomes `salt_buckets` evenly-sized partitions.

    Use when the small side is too big to broadcast but the key is
    power-law distributed. Salt column derives from a hash of the whole
    row (`monotonically_increasing_id`-free → deterministic repartition).
    """
    salt = (F.abs(F.xxhash64(*big.columns)) % salt_buckets).alias("__salt")
    big_salted = big.withColumn("__salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    small_replicated = small.select("*", salts)
    out = big_salted.join(small_replicated, [key, "__salt"], how)
    return out.drop("__salt")


def coalesce_small_files(spark: SparkSession, path: str, target_files: int) -> None:
    """Compact a stage output directory (small-file problem kills 100 TB
    scans: driver-side listing + per-file open cost)."""
    df = spark.read.parquet(path)
    df.repartition(target_files).write.mode("overwrite").parquet(path + "__compacted")
