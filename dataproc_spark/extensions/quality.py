"""Data-quality operators: table profiling and constraint validation.

The observability layer a pipeline runs before/after every ingest:
``profile_table`` answers "what does this table look like" (null rates,
distinct counts, ranges) in one row per column; ``validate_constraints``
answers "does it satisfy the contract" (uniqueness, referential
integrity, value ranges) as one row per rule with a violation count.

Scale design: the profile runs ONE aggregate pass over the table for
the null/min/max family (every column's stats ride the same scan) plus
one distinct-count aggregate per profiled column (exact distinct needs
its own shuffle; at 100 TB swap in approx_count_distinct via the
``exact_distinct=False`` knob and the pass count drops to 1).
Constraint checks are each a count over a filter or anti-join — the
reference-integrity rule broadcasts the dimension side when small.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataproc_spark.core import maybe_broadcast


def profile_table(
    df: DataFrame,
    cols: Sequence[str],
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per column: total rows, null count, distinct count, and
    min/max rendered as strings (stable across engines for ints and
    strings; floats should be profiled pre-rounded).

    ONE aggregate job covers every column's stats: row count, per-column
    null counts, native-type min/max, and the distinct counts all ride a
    single ``df.agg`` (multiple exact COUNT(DISTINCT)s plan through
    Spark's Expand — one scan, the aggregation input multiplied by
    |cols|; ``exact_distinct=False`` swaps in ``approx_count_distinct``
    and drops the Expand blow-up too). The scalar result (6·|cols|
    numbers) reshapes to one row per column on the driver.
    """
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        # min/max on the NATIVE type, cast to string only for display —
        # casting first would make numeric ranges lexicographic
        distinct = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
            distinct.alias(f"_dist_{c}"),
        ]
    row = df.agg(*aggs).first()
    data = [
        (
            c,
            int(row["_n_rows"]),
            int(row[f"_null_{c}"] or 0),
            int(row[f"_dist_{c}"] or 0),
            row[f"_min_{c}"],
            row[f"_max_{c}"],
        )
        for c in cols
    ]
    from dataproc_spark.core import local_frame

    return local_frame(
        df.sparkSession,
        data,
        "column string, n_rows long, n_null long, "
        "n_distinct long, min_value string, max_value string",
    )


def check_unique(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Rows participating in a duplicate key group (0 = the key is
    unique). Returned as a 1-row DataFrame (rule, violations).

    SQL-standard UNIQUE semantics: rows with a NULL in any key column
    are exempt (NULLs compare distinct) — the same call
    ``check_references`` makes for NULL foreign keys. The old groupBy
    counted all NULL keys as one duplicate group, firing the rule on
    tables an SQL UNIQUE constraint accepts (r8 review finding).
    """
    nn = df
    for c in cols:
        nn = nn.where(F.col(c).isNotNull())
    dup = (
        nn.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("violations"))
    )
    return dup.select(
        F.lit(f"unique({', '.join(cols)})").alias("rule"),
        F.col("violations").cast("long"),
    )


def check_in_range(
    df: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Rows with ``col`` outside [lo, hi] or null."""
    bad = df.where(
        ~F.col(col).between(F.lit(lo), F.lit(hi)) | F.col(col).isNull()
    )
    return bad.agg(F.count(F.lit(1)).cast("long").alias("violations")).select(
        F.lit(f"range({col}, {lo}, {hi})").alias("rule"), "violations"
    )


def check_references(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """NON-NULL rows whose ``col`` has no match in ``dim.dim_col``
    (referential integrity; the dimension side broadcasts when small).

    NULL foreign keys are exempt, per standard SQL FK semantics: a NULL
    key is "no reference", not "dangling reference" — without the
    filter every NULL row counted as a violation, making the rule
    unusable on nullable FK columns (r7 review finding). Pair with a
    not-null rule (``check_in_range`` counts NULLs) when NULLs
    themselves are violations.
    """
    missing = df.select(F.col(col)).where(F.col(col).isNotNull()).join(
        maybe_broadcast(dim.select(F.col(dim_col).alias(col))), col, "left_anti"
    )
    return missing.agg(
        F.count(F.lit(1)).cast("long").alias("violations")
    ).select(F.lit(f"references({col})").alias("rule"), "violations")


def validate_constraints(checks: Sequence[DataFrame]) -> DataFrame:
    """Union the per-rule (rule, violations) frames into one report."""
    if not checks:
        raise ValueError(
            "validate_constraints got an empty checks sequence — a "
            "config-driven rule list resolved to no rules; nothing to "
            "validate"
        )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
