"""Approximate aggregates: HLL distinct counts and percentile sketches.

Beyond the reference's surface (it has no approximate anything —
SURVEY.md §2.2), but essential at 100 TB: exact distinct counts shuffle
every distinct value, while a HyperLogLog sketch is a fixed few-KB state
per group that merges associatively — the shuffle carries sketches, not
values. Same story for percentiles.

These wrap Spark's built-ins (`approx_count_distinct`,
`approx_percentile`) with the error-budget knobs surfaced, and provide
an exactness-bound helper used by the tests: results are engine-specific
(sketch implementations differ), so the correctness contract is a
relative-error bound against the exact answer, not cross-engine equality
— which is why these ship with bound-checked unit tests instead of
DuckDB oracle entries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: str, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count with relative standard deviation
    ``rsd`` (state size grows as rsd shrinks)."""
    return F.approx_count_distinct(col, rsd=rsd)


def approx_quantiles(
    col: str, probabilities: list[float], accuracy: int = 10_000
) -> Column:
    """Greenwald-Khanna-style percentile sketch; ``accuracy`` trades state
    size for rank error (error ≤ 1/accuracy of the rank range)."""
    return F.percentile_approx(col, probabilities, accuracy)


def distinct_profile(
    df: DataFrame, group_col: str, value_col: str, rsd: float = 0.05
) -> DataFrame:
    """Per-group approximate distinct cardinality next to the group size —
    the standard profiling shape for choosing join/bucketing keys."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        approx_distinct(value_col, rsd).alias("approx_distinct"),
    )
