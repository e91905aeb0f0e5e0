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


def z_value(cols: Sequence, bits: int = 12) -> "F.Column":
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    (non-negative integer) column into one sort key. Sorting by this key
    clusters rows so parquet row-group min/max stats stay selective for
    range predicates on EVERY participating column at once — the
    data-skipping layout behind OPTIMIZE ZORDER in lakehouse table
    formats, here as a plain column expression (exact integer bit
    arithmetic, reproducible in any engine with shifts).

    Callers normalize each column into [0, 2^bits) first (modulo, or the
    min-max scaling :func:`write_zordered` applies); ``len(cols) * bits``
    must stay ≤ 63.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 63-bit key")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long")
        for j in range(bits):
            # bit j of column i lands at position j*n + i; positions are
            # disjoint, so + is |
            z = z + F.shiftleft(F.shiftright(cc, j).bitwiseAND(F.lit(1)), j * n + i)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    mode: str = "overwrite",
    num_files: int | None = None,
) -> None:
    """Write parquet clustered by the Z-order of ``cols``: each column is
    min-max scaled into [0, 2^bits), rows are range-partitioned and
    sorted by the interleaved key, so a multi-column range predicate
    prunes most row groups via footer stats (verified by the row-group
    intersection test in ``tests/test_storage_streaming.py``).

    The min/max scalars are one tiny aggregate (2·|cols| numbers on the
    driver — the same O(k) plan-literal pattern as k-means centroids);
    the data itself sees one range exchange + per-partition sort, the
    same cost as any clustered write.
    """
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    row = df.agg(*aggs).first()
    if row is None or any(row[f"_mn_{c}"] is None for c in cols):
        # empty input or an all-null cluster column: there is nothing to
        # cluster — write as-is instead of crashing on int(None)
        df.write.mode(mode).parquet(path)
        return
    hi = (1 << bits) - 1
    out = df
    zcols = []
    for i, c in enumerate(cols):
        mn, mx = int(row[f"_mn_{c}"]), int(row[f"_mx_{c}"])
        span = max(mx - mn, 1)
        # integer scaling end to end — float division loses bucket
        # precision once (mx-mn)*hi exceeds 2^53, silently degrading the
        # clustering (and hence row-group pruning) for wide-range longs
        if span * hi < (1 << 63):
            # exact: delta <= span so delta*hi fits 64 bits by the guard
            expr = f"((cast(`{c}` as bigint) - ({mn}L)) * {hi}L) div {span}L"
        else:
            # span too wide for the exact product — and when the column
            # straddles more than half the long range (e.g. xxhash64
            # keys, mn ~ -2^63, mx ~ 2^63), even `col - mn` wraps. So
            # divide each SIDE by ceil(span/hi) first (monotone trunc
            # division keeps the clustering order), subtract the small
            # quotients, and clamp the ±1 trunc slack into [0, hi].
            # Still pure integer, off by at most one bucket.
            q = span // hi + 1
            mn_q = mn // q if mn >= 0 else -((-mn) // q)  # Spark `div` truncates
            expr = (
                f"greatest(0L, least({hi}L, "
                f"(cast(`{c}` as bigint) div {q}L) - ({mn_q}L)))"
            )
        out = out.withColumn(f"_zs{i}", F.expr(expr))
        zcols.append(f"_zs{i}")
    out = out.withColumn("_z", z_value(zcols, bits)).drop(*zcols)
    if num_files is None:
        num_files = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    (
        out.repartitionByRange(int(num_files), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] | None = None,
) -> int:
    """Small-files compaction — the maintenance job every streaming sink
    needs: rewrite a parquet directory into ``ceil(total_bytes /
    target_bytes)`` files (optionally re-sorted for row-group stats).
    Returns the new file count.

    The rewrite goes through a dot-prefixed sibling temp dir + a
    two-step rename. The scratch names start with ``.`` so Spark's file
    and partition discovery never sees them — a concurrent reader of a
    partitioned root during a partition swap sees consistent data (minus
    the one partition for the instant between its two renames), never an
    extra bogus partition. NOTE the swap is atomic-ish, not atomic:
    between the two renames the directory being swapped is briefly
    ABSENT, so a reader opening exactly then fails (it never sees a
    half-rewritten mix, though). A crash in that window is recovered on
    the next invocation: leftover ``__compact_old`` (the intact pre-swap
    data) is renamed back if the data directory is missing — including
    partition-level leftovers found while scanning a partitioned root —
    and stale ``__compact_tmp`` / already-swapped ``__compact_old``
    leftovers are removed before the new rewrite starts.
    """
    import glob as _glob
    import math
    import os as _os
    import re as _re
    import shutil as _shutil

    def _scratch(p: str) -> tuple[str, str]:
        d, b = _os.path.split(p.rstrip("/"))
        return (
            _os.path.join(d, f".{b}__compact_tmp"),
            _os.path.join(d, f".{b}__compact_old"),
        )

    def _recover(p: str) -> None:
        """Restore/clean a previous run's scratch siblings of ``p``
        (both the current dot-prefixed names and the pre-fix visible
        ones, so datasets crashed under the old naming still heal)."""
        tmp_p, old_p = _scratch(p)
        legacy_tmp = p.rstrip("/") + "__compact_tmp"
        legacy_old = p.rstrip("/") + "__compact_old"
        for o in (old_p, legacy_old):
            if _os.path.exists(o) and not _os.path.exists(p):
                # died between rename(path, old) and rename(tmp, path) —
                # the old layout is the last complete one; restore it
                _os.rename(o, p)
            if _os.path.exists(o):
                # died after the swap completed but before cleanup
                _shutil.rmtree(o, ignore_errors=True)
        for t in (tmp_p, legacy_tmp):
            if _os.path.exists(t):
                # an unfinished (possibly partial) rewrite — never read
                # or swap it in; start fresh
                _shutil.rmtree(t, ignore_errors=True)

    # crash recovery from a previous run, BEFORE reading anything:
    _recover(path)

    # a PARTITION that crashed mid-swap leaves only its __compact_old
    # sibling inside the root — the partition dir itself is gone, so the
    # recursion below would never visit (or heal) it; recover every
    # leftover found at this level first (r8 follow-up review finding)
    scratch_re = _re.compile(r"^\.?(.+)__compact_(old|tmp)$")
    for entry in sorted(_os.listdir(path)):
        m = scratch_re.match(entry)
        if m:
            _recover(_os.path.join(path, m.group(1)))

    # partitioned layout (key=value subdirs, e.g. stream_to_parquet's
    # batch= sink): compact each partition directory independently.
    # Reading the root would (a) hoist the partition dirs into data
    # columns and flatten the layout on rewrite, and (b) size only
    # top-level files — total=0 — so the whole dataset funneled through
    # repartition(1) regardless of target_bytes (r8 review finding,
    # confirmed by probe).
    part_dirs = sorted(
        d for d in _os.listdir(path)
        if "=" in d and "__compact" not in d and not d.startswith(".")
        and _os.path.isdir(_os.path.join(path, d))
    )
    if part_dirs:
        return sum(
            compact_parquet(
                spark, _os.path.join(path, d), target_bytes, sort_cols
            )
            for d in part_dirs
        )
    files = _glob.glob(_os.path.join(path, "*.parquet")) + _glob.glob(
        _os.path.join(path, "part-*")
    )
    total = sum(_os.path.getsize(f) for f in set(files))
    if total == 0:
        raise ValueError(
            f"compact_parquet: no parquet data files found directly under "
            f"{path!r} — nothing to compact (unrecognized layout?)"
        )
    n_files = max(1, math.ceil(total / max(int(target_bytes), 1)))
    df = spark.read.parquet(path)
    writer = df.repartition(n_files)
    if sort_cols:
        writer = writer.sortWithinPartitions(*sort_cols)
    tmp, old = _scratch(path)
    writer.write.mode("overwrite").parquet(tmp)
    _os.rename(path, old)
    _os.rename(tmp, path)
    _shutil.rmtree(old, ignore_errors=True)
    return n_files


def vacuum_snapshots(snapshot_dir: str, keep_last: int = 2) -> list[str]:
    """Retention for versioned ``v=<id>`` snapshot directories (the
    companion to ``streaming.stream_upsert_to_parquet``): drop all but
    the newest ``keep_last`` versions, never touching the newest one.
    Returns the removed directory names.
    """
    import os as _os
    import re as _re
    import shutil as _shutil

    versions = sorted(
        (int(m.group(1)), d)
        for d in _os.listdir(snapshot_dir)
        if (m := _re.fullmatch(r"v=(-?\d+)", d))
    )
    doomed = versions[: max(len(versions) - max(int(keep_last), 1), 0)]
    removed = []
    for _v, d in doomed:
        _shutil.rmtree(_os.path.join(snapshot_dir, d), ignore_errors=True)
        removed.append(d)
    return removed
