"""Time-ordered joins Spark lacks as built-ins: the as-of join.

An as-of join attaches, to each left row, the most recent right row at or
before the left row's timestamp (per key) — the standard enrichment join
for event streams, quotes-vs-trades, and feature backfill in training-data
pipelines.

Scale design
------------
Naive formulations are range joins (``l.ts >= r.ts`` θ-join): Spark plans
them as BroadcastNestedLoopJoin — O(|L|·|R|) and a driver OOM once neither
side broadcasts. This implementation is the *union trick*: tag both sides,
union them, and carry the latest right-side values forward with a
``last(ignorenulls)`` running window per key. Cost is ONE hash shuffle on
the key (same as any equi-join) plus a per-partition sort — no pairwise
comparison anywhere, skew bounded by the hottest key exactly like a
group-by. This is how kdb/pandas ``merge_asof`` semantics map onto a
shuffle engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: Sequence[str] = (),
    bucket_ns: int = 3_600_000_000_000,
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Point-in-interval join (``start <= point_ts < end``) as an
    equi-join on coarse time buckets plus a residual range filter.

    Spark plans a raw ``BETWEEN`` θ-join as BroadcastNestedLoopJoin —
    O(|P|·|I|). Here each interval explodes into the buckets it covers
    (``sequence(start div b, (end-1) div b)``) and points join on their
    single bucket — a plain hash shuffle. Bucket granularity trades
    duplication for selectivity: choose ``bucket_ns`` near the typical
    interval length so intervals cover O(1) buckets; the residual filter
    restores exact semantics. Keys in ``by`` ride the equi-join.

    Returns matched (point, interval) pairs with all columns from both
    sides (interval columns win name clashes only via suffix-free join —
    keep the schemas disjoint apart from ``by``).
    """
    if bucket_ns < 1:
        # bucket_ns=0 dies mid-job with an opaque REMAINDER_BY_ZERO
        # under ANSI; negative values silently misbucket (r8 review
        # finding; same guard class as the _bk/end<=start checks below)
        raise ValueError(f"bucket_ns must be >= 1, got {bucket_ns}")
    for side, frame in (("points", points), ("intervals", intervals)):
        if "_bk" in frame.columns:
            raise ValueError(
                f"{side} frame already has internal column '_bk'; rename it "
                f"before calling interval_join"
            )

    def floor_div(e: str) -> F.Column:
        # Long-exact floor division.  The subtraction makes the numerator an
        # exact nonnegative-remainder multiple of bucket_ns, and SQL `div`
        # stays in 64-bit integer arithmetic the whole way.  A double `/`
        # here silently misbuckets ns-epoch values (~1.7e18 > 2^53): the
        # numerator rounds in the double domain and the long cast truncates
        # off-by-one, so the bucket equi-join DROPS true matches.
        return F.expr(f"((({e}) - pmod(({e}), {bucket_ns})) div {bucket_ns})")

    # A malformed interval (end <= start) matches nothing, but without the
    # guard sequence(a, b) auto-steps -1 when a > b and a single bad row
    # (swapped columns, 0 sentinel) explodes into millions of bucket rows.
    # The symmetric hazard is a LEGITIMATELY huge interval (an SCD
    # far-future sentinel end at ns resolution spans millions of
    # buckets): cap the per-interval fan-out and fail with the fix in
    # the message instead of a silent multi-terabyte explode.
    n_buckets = (
        floor_div(f"`{end_col}` - 1") - floor_div(f"`{start_col}`") + 1
    )
    fanout_guard = F.when(
        n_buckets <= int(max_buckets_per_interval), F.lit(True)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_join: an interval spans more than "
                    f"{int(max_buckets_per_interval)} buckets ("
                ),
                n_buckets.cast("string"),
                F.lit(
                    ") — raise bucket_ns to match the interval scale, "
                    "clamp sentinel end timestamps, or raise "
                    "max_buckets_per_interval explicitly"
                ),
            )
        )
    )
    ivals = (
        intervals.where(F.col(end_col) > F.col(start_col))
        .where(fanout_guard)
        .withColumn(
            "_bk",
            F.explode(
                F.sequence(
                    floor_div(f"`{start_col}`"),
                    floor_div(f"`{end_col}` - 1"),
                )
            ),
        )
    )
    pts = points.withColumn("_bk", floor_div(f"`{point_ts}`"))
    cond = [pts["_bk"] == ivals["_bk"]] + [
        pts[k] == ivals[k] for k in by
    ]
    joined = pts.join(ivals, cond).where(
        (pts[point_ts] >= ivals[start_col]) & (pts[point_ts] < ivals[end_col])
    )
    joined = joined.drop("_bk")
    for k in by:  # keep one copy of each join key (the point side's)
        joined = joined.drop(ivals[k])
    return joined


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] | str = ("user_id",),
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    allow_exact: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (or ``<`` when ``allow_exact=False``), matching
    on the ``by`` key columns. Left rows with no prior right row keep
    nulls (left-join semantics).

    The matched right row's ``on`` value is exposed as ``{on}{suffix}``
    and each carried column ``c`` as ``{c}{suffix}``.

    Ties *within the right side* (two right rows with identical
    ``(by, on)``) are resolved arbitrarily — pre-aggregate the right side
    to one row per ``(by, on)`` if that matters (the gate query does).
    """
    by = [by] if isinstance(by, str) else list(by)
    if not by:
        # Window.partitionBy() with no keys plans ONE global partition:
        # the whole input shuffles to a single sorting task — an opaque
        # hang/OOM at scale instead of this error
        raise ValueError(
            "asof_join needs at least one `by` key; an empty key list "
            "would sort the entire input in one window partition"
        )
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, on)]
    carried = [f"{on}{suffix}", *[f"{c}{suffix}" for c in right_cols]]
    clash = [c for c in carried if c in left.columns]
    if clash:
        raise ValueError(
            f"left side already has column(s) {clash}; pass a different "
            f"suffix so carried right-side columns don't collide"
        )
    internal = [c for c in ("_side", "_r") if c in left.columns]
    if internal:
        raise ValueError(
            f"left side already has internal column(s) {internal}; rename "
            f"them before calling asof_join (they would be clobbered by the "
            f"union-trick bookkeeping columns)"
        )

    # Carry the whole right row as ONE struct so the match stays atomic:
    # per-column last(ignorenulls) would fill a null right value from an
    # OLDER row, fabricating a (ts, values) combination that never existed.
    # Right rows with a null `on` are dropped — a null timestamp can never
    # be "most recent at or before" anything (pandas merge_asof rejects
    # them outright), and left un-dropped it would sort first and leak its
    # values into every left row of the key.
    # Right rows with a NULL `by` key are dropped too: Window.partitionBy
    # groups NULL keys into one partition, so without the filter two
    # NULL-key rows would MATCH each other — a row equi-join (and the
    # DuckDB ASOF JOIN oracle) treats NULL keys as matching nothing (r7
    # review finding, confirmed by execution). NULL-key LEFT rows flow
    # through and keep nulls, exactly like an unmatched left-join row.
    null_by = None
    for k in by:
        cond = F.col(k).isNull()
        null_by = cond if null_by is None else (null_by | cond)
    r = right.where(F.col(on).isNotNull())
    if null_by is not None:
        r = r.where(~null_by)
    r = r.select(
        *by,
        F.col(on).alias(on),
        F.struct(
            F.col(on).alias(f"{on}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        ).alias("_r"),
        F.lit(0).alias("_side"),
    )
    l = left.withColumn("_side", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    # allow_exact: right rows (side 0) sort before left rows at equal ts,
    # so an exact-ts right row is inside the left row's frame; the strict
    # variant flips the tie order so same-ts right rows fall outside it
    side_order = F.col("_side").asc() if allow_exact else F.col("_side").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = unioned.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    return unioned.where(F.col("_side") == 1).select(
        *left.columns, *[F.col(f"_r.{c}").alias(c) for c in carried]
    )
