"""Testdata table access shared by every query family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


#: every driver-generated testdata table
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_tables(
    spark: SparkSession, sf_dir: str, suffix: str = "_v"
) -> None:
    """Register every testdata table as a temp view (``<name><suffix>``)
    so the full corpus is queryable through the ``spark.sql`` front-end.
    The events view carries the engine's normalization — ``ts`` is int64
    epoch nanoseconds regardless of the parquet physical type — so SQL
    users get the same event-time contract as the DataFrame API."""
    for name in TABLES:
        _t(spark, sf_dir, name).createOrReplaceTempView(f"{name}{suffix}")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts arrives as long nanos (parquet TIMESTAMP(NANOS) under
        # nanosAsLong) or as a timestamp type (timestamp[us] testdata);
        # normalize_event_ts projects either to the int64-nanos contract.
        # DELIBERATE session-wide side effect: the driver runs gates on
        # a vanilla session without this flag, and a TIMESTAMP(NANOS)
        # events file cannot be read at all without it. It cannot be
        # restored after the read (Spark scans lazily — the flag must
        # hold when the job RUNS, not when the frame is built), so it is
        # documented here and in `get_spark` (which sets it up front).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from dataproc_spark.core import normalize_event_ts

        return normalize_event_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def sql_lit(s: str) -> str:
    """A Python string as a single-quoted SQL literal — the oracle-side
    escaper shared by every fixture-constant gate (was three private
    copies; r11 second review)."""
    return "'" + s.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# selective-search instantiation on the star schema
# ---------------------------------------------------------------------------


def rev_cents():
    """Exact-cents line revenue — ``round(l_extendedprice * (1 -
    l_discount) * 100)`` as LONG. THE cross-engine exactness contract
    every revenue-aggregating gate shares; one definition so the
    rounding/scale can never drift between gates or from their oracles
    (r8 review: it existed as six copies). Note the roundtrip gate's
    DOUBLE `score` column intentionally does NOT use this (the file
    contract requires double)."""
    from pyspark.sql import functions as F

    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
