"""Event/corpus analytics operators: ordered funnels, retention cohorts,
budgeted prefix selection, time-series resampling, and SCD2 history.

These are the product-analytics and data-selection staples a pipeline
runs beside its training-data jobs. All of them are pure DataFrame
compositions with deterministic integer semantics (the registry gates
value-check them against DuckDB oracles; see ``queries.py``), and each
is also pitted against an independent Python model by hypothesis tests.

Scale design
------------
* ``funnel``: one conditional min-aggregate per step, every one keyed on
  the user column; each stage's frame only shrinks, so the chained joins
  broadcast. No windows over raw events, no per-user sorting.
* ``retention_matrix``: a min-aggregate for cohorts, a distinct
  (user, period) projection, a broadcast cohort join, and a partially
  aggregated final count bounded by distinct (cohort, offset) pairs.
* ``select_under_budget``: cumulative-prefix selection decomposed so raw
  rows are never globally sorted — the global running total lives on a
  per-score histogram (rows = distinct scores), raw rows only see a
  window PARTITIONED by their score bucket.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataproc_spark.core import ensure_has_columns, maybe_broadcast


def _floor_bucket(ts_col: str, width: int) -> F.Column:
    """Epoch-period id by floor division on int64 values: ``pmod``
    before ``div`` so pre-1970 epochs floor (not truncate toward zero).
    SQL ``div`` keeps the arithmetic exact in 64-bit integers (a double
    ``/`` is lossy past 2^53 — nanos are ~2^60); the identifier is
    backtick-quoted so non-bare column names ('event ts') parse."""
    q = ts_col.replace("`", "``")
    return F.expr(f"(`{q}` - pmod(`{q}`, {int(width)})) div {int(width)}")


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: per user, the first occurrence of ``steps[0]``,
    then the first ``steps[1]`` strictly after it, and so on.

    Returns one row per user who reached step 1, with a ``t_<step>``
    column per step (null once the chain breaks) and ``steps`` = how many
    stages were reached.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {list(steps)!r}")
    if len(set(steps)) != len(steps):
        # a repeated step would create a second t_<step> column via the
        # left join and blow up later with an opaque ambiguous-column
        # AnalysisException (r7 review finding); positional repeated-
        # stage funnels need per-position column naming this operator
        # does not implement — fail fast with the real reason
        raise ValueError(
            f"funnel steps must be distinct, got {list(steps)!r} — "
            "repeated stages are not supported (t_<step> columns are "
            "named by step type)"
        )
    ensure_has_columns(events, [user_col, ts_col, type_col])
    # untimed events cannot participate in a time-ordered funnel: a
    # user whose only step-1 events are NULL-ts otherwise produced a
    # (t_step1=NULL, steps=1) row no other formulation (incl. the
    # streaming operator) can emit — r9 review, one policy everywhere
    ev = events.select(user_col, ts_col, type_col).where(
        F.col(ts_col).isNotNull()
    )
    first = steps[0]
    out = (
        ev.where(F.col(type_col) == first)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{first}"))
    )
    prev = f"t_{first}"
    for step in steps[1:]:
        nxt = (
            ev.where(F.col(type_col) == step)
            .join(out.select(user_col, prev), user_col)
            .where(F.col(ts_col) > F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{step}"))
        )
        out = out.join(nxt, user_col, "left")
        prev = f"t_{step}"
    reached = sum(
        (F.col(f"t_{s}").isNotNull().cast("int") for s in steps[1:]),
        F.lit(1),
    )
    return out.withColumn("steps", reached.cast("int"))


def retention_matrix(
    events: DataFrame,
    cohort_type: str,
    period_ns: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Retention cohorts: users cohorted by the epoch-period of their
    first ``cohort_type`` event; per (cohort_period, period_offset >= 0)
    the number of distinct cohort users active (any event) that period.

    Period ids are floor-division integer arithmetic on the raw int64
    nanos (``pmod`` before ``div`` so pre-1970 epochs floor correctly).
    """
    if period_ns <= 0:
        raise ValueError(f"period_ns must be positive, got {period_ns}")
    ensure_has_columns(events, [user_col, ts_col, type_col])
    period = _floor_bucket(ts_col, period_ns)
    cohort = (
        events.where(F.col(type_col) == cohort_type)
        .groupBy(user_col)
        .agg(F.min(period).alias("cohort_period"))
    )
    active = events.select(user_col, period.alias("period")).distinct()
    return (
        active.join(maybe_broadcast(cohort), user_col)
        .where(F.col("period") >= F.col("cohort_period"))
        .groupBy(
            "cohort_period",
            (F.col("period") - F.col("cohort_period"))
            .cast("long")
            .alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def select_under_budget(
    feats: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    score_col: str = "score_m",
) -> DataFrame:
    """Keep the maximal best-score prefix whose cumulative weight fits
    ``budget`` (ties by ``id_col`` ascending).

    Semantically ONE cumulative window ordered (score desc, id asc); the
    plan decomposes it scale-safely: a per-score weight histogram carries
    the global running total (rows = distinct scores), and raw rows only
    see a running sum partitioned by their score bucket. Identical rows,
    no global sort of the input.
    """
    ensure_has_columns(feats, [id_col, weight_col, score_col])
    hist = feats.groupBy(score_col).agg(
        F.sum(weight_col).alias("_bucket_w")
    )
    wb = (
        Window.orderBy(F.col(score_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.select(
        # renamed for the null-SAFE join below: a NULL score forms its
        # own histogram bucket (ranked last — desc is NULLS LAST on both
        # engines), but a null-unsafe equi-join would silently drop
        # every NULL-score row from the output (r8 review finding)
        F.col(score_col).alias("_h_score"),
        F.coalesce(F.sum("_bucket_w").over(wb), F.lit(0)).alias("_cum_before"),
    )
    # weight joins the within-bucket order so rows tied on (score, id)
    # get a deterministic running sum (r8 follow-up review finding —
    # arrival order decided which tied row fit the budget); NULL weights
    # count 0 UNIFORMLY via the coalesced per-row term (the bucket
    # histogram's sum already skips NULLs, but a window sum over an
    # all-NULL prefix is NULL, which silently dropped a NULL-weight row
    # iff it sorted first in its bucket — position-dependent policy)
    wd = (
        Window.partitionBy(score_col)
        .orderBy(
            F.col(id_col).asc_nulls_last(),
            F.col(weight_col).asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        feats.join(
            maybe_broadcast(hist),
            F.col(score_col).eqNullSafe(F.col("_h_score")),
        )
        .select(
            id_col,
            score_col,
            weight_col,
            (
                F.col("_cum_before")
                + F.sum(F.coalesce(F.col(weight_col), F.lit(0))).over(wd)
            )
            .cast("long")
            .alias("cum_weight"),
        )
        .where(F.col("cum_weight") <= budget)
    )


def resample_ffill(
    events: DataFrame,
    bucket_ns: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value_c",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-series resample + forward fill: per key, the last value in
    each ``bucket_ns``-wide bucket, with empty buckets inside the key's
    active span carrying the previous value forward (pandas
    ``resample().last().ffill()``).

    The per-bucket last is ONE max-by-struct aggregate under the total
    order (ts, tiebreak) — no window over raw events; the bucket spine is
    an exploded ``sequence(min, max)`` per key, bounded by time span /
    bucket width rather than event count; the fill is
    ``last(ignorenulls)`` over the spine partitioned per key.

    NULL values follow pandas ``.last()`` (skipna) semantics: the
    per-bucket last is the last NON-NULL value — a bucket ending with a
    NULL-valued event still reports its earlier non-null value rather
    than forward-filling over it (r7 review finding; the conditional
    struct keeps this a single aggregate, and the bucket row survives
    even when every value is NULL so the spine bounds are unchanged).
    """
    if bucket_ns <= 0:
        raise ValueError(f"bucket_ns must be positive, got {bucket_ns}")
    ensure_has_columns(events, [user_col, ts_col, value_col, tiebreak_col])
    b = _floor_bucket(ts_col, bucket_ns)
    per_bucket = (
        events.select(
            user_col,
            b.alias("bucket_id"),
            F.when(
                F.col(value_col).isNotNull(),
                F.struct(ts_col, tiebreak_col, F.col(value_col).alias("_v")),
            ).alias("_e"),
        )
        .groupBy(user_col, "bucket_id")
        .agg(F.max("_e").getField("_v").alias(value_col))
    )
    spine = (
        per_bucket.groupBy(user_col)
        .agg(F.min("bucket_id").alias("_b0"), F.max("bucket_id").alias("_b1"))
        .select(
            user_col,
            F.explode(F.expr("sequence(_b0, _b1)")).alias("bucket_id"),
        )
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("bucket_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out_v = F.last(value_col, ignorenulls=True).over(w)
    return spine.join(per_bucket, [user_col, "bucket_id"], "left").select(
        user_col,
        "bucket_id",
        out_v.alias(value_col),
        # filled = the value CAME FROM an earlier bucket: the bucket
        # itself had no non-null value AND something actually carried.
        # The old bare own-value NULL check also flagged leading buckets
        # whose output stays NULL — rows where nothing was filled (r8
        # review finding).
        (F.col(value_col).isNull() & out_v.isNotNull())
        .cast("int")
        .alias("filled"),
    )


def scd2_history(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value_c",
) -> DataFrame:
    """SCD type-2 history build: each change event becomes a validity
    interval [valid_from, valid_to) carrying its value; ``valid_to`` is
    null on the open (current) interval, flagged by ``is_current``.

    ONE lead window partitioned by the key under the total order
    (ts, tiebreak) — per-key sort only, the same plan shape as
    sessionization; no self-join, no global sort.
    """
    ensure_has_columns(events, [user_col, ts_col, tiebreak_col, value_col])
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    return events.select(
        user_col,
        F.col(ts_col).alias("valid_from"),
        tiebreak_col,
        value_col,
        F.lead(ts_col).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull().cast("int"))


def group_percentile(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    tiebreak_cols: Sequence[str],
    out_col: str = "permille",
) -> DataFrame:
    """Per-group percentile rank in exact integer permille — the
    calibration step behind per-domain quality filtering: a raw score
    (length, LM score, classifier logit) is comparable ACROSS domains
    only after normalizing within each domain, so "drop the worst 10%"
    drops 10% of every source instead of whole low-scoring domains.

    ``permille = (rank - 1) * 1000 div max(n - 1, 1)`` under the total
    order (score asc, tiebreaks asc): 0 for the group minimum, 1000 for
    the maximum, integer-exact (no float percent_rank), deterministic
    under ties via the explicit tiebreaks.

    One shuffle: both window functions (row_number, count) share the
    group partition spec. No global sort; each group sorts independently,
    the same plan shape as sessionization.
    """
    ensure_has_columns(df, [*group_cols, score_col, *tiebreak_cols])
    part = Window.partitionBy(*group_cols)
    order = part.orderBy(
        F.col(score_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(order))
        .withColumn("_gn", F.count(F.lit(1)).over(part))
        .withColumn(out_col, F.expr("((_rn - 1) * 1000) div greatest(_gn - 1, 1)"))
        .drop("_rn", "_gn")
    )


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog to a snapshot — the MERGE INTO / table-format
    upsert shape without a table format: the latest change per key wins
    under the total order (ts desc, tiebreak desc); ``'D'`` removes the
    key, ``'U'`` inserts-or-replaces its row, untouched snapshot keys
    carry over unchanged. Returns the new snapshot with the snapshot's
    column set.

    Plan: one per-key window over the CHANGES ONLY (the changelog batch
    is the small side — the snapshot is never window-sorted), then the
    snapshot is touched exactly once by a key anti-join against the
    compacted change keys; surviving upserts union in. At scale both the
    anti-join and the union are key-partitioned; writing the result
    partitioned by the key bucket makes the next merge's anti-join
    co-located (``storage.write_bucketed``).
    """
    ensure_has_columns(snapshot, [key_col])
    ensure_has_columns(changes, [key_col, ts_col, tiebreak_col, op_col])
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # null-safe anti-join: a NULL-key change must still replace/delete
    # the snapshot's NULL-key row (a plain equi-join never matches NULL,
    # so the stale row survived AND the upsert duplicated it — r8
    # follow-up review finding; the same eqNullSafe policy as the
    # select_under_budget histogram join)
    untouched = snapshot.alias("s").join(
        maybe_broadcast(
            latest.select(F.col(key_col).alias("_chg_key"))
        ),
        F.col(f"s.{key_col}").eqNullSafe(F.col("_chg_key")),
        "left_anti",
    )
    # any NON-delete op upserts: CDC feeds vary their insert/update tags
    # (Debezium c/u/r, I/U variants), and every non-delete change row
    # carries the full record. The old `op == 'U'` filter made an
    # unrecognized op act as a DELETE — the key was anti-joined away and
    # never re-inserted, silent data loss (r8 review finding). NULL-safe
    # for the same reason: `op != 'D'` is NULL for a NULL op, which
    # silently deleted the key (r8 follow-up).
    upserts = latest.where(~F.col(op_col).eqNullSafe("D")).select(
        *snapshot.columns
    )
    return untouched.unionByName(upserts)


def co_occurrence(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
    top_n: int | None = None,
) -> DataFrame:
    """Pairwise co-occurrence (market-basket) mining: item pairs
    appearing together in ≥ ``min_support`` groups, with support counts.

    The classic a-priori first pass, relationally: project distinct
    (group, item), self-join per group with ``item_a < item_b``, count
    pairs. Scale: the join key is the GROUP, so output per group is
    bounded by (items-per-group)², never |items|² — a 100-item basket
    contributes 4,950 pairs regardless of corpus size. Groups with
    pathological item counts are the skew case; cap them upstream or
    watch ``skew_report``'s ``cut-or-split`` signal (the same quadratic
    posting-list shape as hot shingles — SCALE.md §salting A/B measured
    removal at 26×, redistribution at ~0×). ``top_n`` ranks by
    (support desc, item_a, item_b) — a deterministic total order.
    """
    base = df.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
    ).distinct()
    a = base.select("_g", F.col("_i").alias("item_a"))
    b = base.select("_g", F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_g")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= int(min_support))
    )
    if top_n is not None:
        # orderBy + limit plans as TakeOrderedAndProject: each task keeps
        # its local top-N and the driver merges N rows per task — no
        # single-task global window over the full pair set
        pairs = pairs.orderBy(
            F.col("support").desc(), F.col("item_a"), F.col("item_b")
        ).limit(int(top_n))
    return pairs
