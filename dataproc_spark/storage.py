"""Table layout helpers: partitioned and bucketed parquet storage.

At 100 TB the dominant cost of the selective-search workload is the
shuffle of results on (query, shard)-ish keys. Two layout tools remove it:

* **Partitioned layout** (``partitionBy``) — directory-level pruning: a
  query touching one shard/date reads one directory. Use for low-
  cardinality columns only (each value is a directory).
* **Bucketed layout** (``bucketBy`` + ``saveAsTable``) — rows are hash-
  clustered into a fixed bucket count per key; two tables bucketed the
  same way join with ZERO exchange (explain shows no Exchange under the
  SortMergeJoin), and aggregations on the bucket key skip the shuffle.
  This is Spark's answer to co-located joins; at cluster scale it is how
  repeated result×selection joins amortize their shuffle once at write
  time.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by ``partition_cols`` (directory pruning).

    Readers filtering on the partition columns scan only matching
    directories — `.explain` shows the predicate under PartitionFilters
    instead of post-scan Filter.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sorted) managed table.

    Joins/aggregations between tables bucketed identically on the join
    keys run shuffle-free; pre-sorting within buckets additionally removes
    the sort of a sort-merge join. Bucket count should be sized so one
    bucket of the largest table fits an executor's memory comfortably
    (at 100 TB and 1000 executors: thousands of buckets).
    """
    writer = df.write.mode(mode).bucketBy(int(num_buckets), *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a saved (bucketed) table, preserving its bucketing metadata."""
    return spark.table(table)
