"""Skew-handling utilities: salted aggregation and salted joins.

AQE's skew-join splitting handles most runtime skew automatically (it is
enabled by the session factory), but two patterns still need explicit
salting at 100 TB:

* **hot-key aggregation** — a groupBy where a handful of keys hold most
  rows (e.g. token counts where 'the' is 5% of the corpus): partial
  aggregation helps, but the final shuffle still lands each key on one
  task. :func:`salted_agg` splits every key across ``salt`` partial
  groups and re-aggregates the partials — two small shuffles instead of
  one skewed one.
* **hot-key join** — a large fact joined on a key with heavy hitters
  against a side too big to broadcast. :func:`salted_join` replicates
  each right-side row ``salt`` times and scatters left rows uniformly,
  so every (key, salt) bucket is ~1/salt of the hot key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def contains_map(dt) -> bool:
    """True when ``dt`` is or *contains* a MapType (struct field, array
    element, map key/value). Spark's hash expressions reject MapType at
    plan time wherever it sits in the type tree, so a top-level
    ``typeName().startswith('map')`` check let nested maps through to
    the same analysis error it was added to avoid (r8 ADVICE)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.StructType):
        return any(contains_map(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return contains_map(dt.elementType)
    return False


def hashable_columns(df: DataFrame) -> list[str]:
    """Names of ``df``'s columns whose types are accepted by Spark's
    hash expressions (no MapType anywhere in the type tree)."""
    return [
        f.name for f in df.schema.fields if not contains_map(f.dataType)
    ]


def with_salt(df: DataFrame, salt: int, id_cols: Sequence[str] | None = None) -> DataFrame:
    """Add a deterministic salt column in [0, salt).

    Deterministic (hash of ``id_cols``) rather than ``rand()`` so plans
    stay reproducible and re-computation under task retries is stable.
    When no id columns are given, the salt hashes the FULL ROW CONTENT
    (every non-map column): a recomputed task reproduces the same salt
    per row regardless of intra-partition row order. The previous
    partition-id + row-index fallback was only retry-stable when the
    partition's row ORDER was deterministic — downstream of a shuffle it
    is not, so a task retry could re-bucket rows whose old buckets the
    reducers had already fetched (the classic rand()-salting hazard; r8
    follow-up review finding). The content-hash trade-off: bit-identical
    duplicate rows share a salt and do not spread — pass ``id_cols``
    (a row id) when the input carries full duplicates.
    """
    if salt < 1:
        # salt=0 dies mid-job with an opaque REMAINDER_BY_ZERO under
        # ANSI; negative salt makes sequence() count DOWN and silently
        # corrupts salted joins in non-ANSI sessions (r8 review finding)
        raise ValueError(f"salt must be >= 1, got {salt}")
    if SALT in df.columns:
        # withColumn would silently overwrite the user's column and the
        # salted operators then drop it — silent data loss (r7 review;
        # same guard class as temporal.py's _bk/_side checks)
        raise ValueError(
            f"input already has a '{SALT}' column; rename it before "
            "calling the salted operators (it would be clobbered and "
            "dropped)"
        )
    if id_cols:
        src = F.xxhash64(*[F.col(c) for c in id_cols])
    else:
        hashable = hashable_columns(df)
        src = (
            F.xxhash64(*[F.col(c) for c in hashable])
            if hashable
            else F.lit(0)
        )
    return df.withColumn(SALT, F.pmod(src, F.lit(salt)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salt: int = 16,
    id_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for hot keys: groupBy (keys + salt) then
    re-aggregate over keys.

    ``aggs`` maps output column name → aggregate Column; the aggregate
    must be decomposable (sum/count/min/max — sum-of-partials). Counts are
    re-aggregated with sum automatically by passing the partial columns
    through the provided expressions over the partial frame.

    ``id_cols``, when given, must be high-cardinality columns (a row id) —
    never the group keys themselves, which would collapse each key into a
    single salt bucket.
    """
    import re

    # Classify each aggregate from its ANALYZED expression SQL (analysis-
    # only probe, no job): str(Column) drops the DISTINCT keyword in
    # pyspark 4 (countDistinct would masquerade as a plain count and be
    # silently mis-combined), and the applied column name is hidden by
    # user aliases — the analyzed plan renders the truth either way
    # ('sum(v) AS whatever', 'count(DISTINCT v) AS x').
    # ONE batched analysis probe for every aggregate (the last
    # len(aggs) expressions of the analyzed plan, in order) — a
    # per-aggregate probe paid one driver plan-analysis round-trip per
    # entry for config-driven rule lists
    probe = df.limit(0)
    plan = probe.agg(*aggs.values())._jdf.queryExecution().analyzed()
    exprs = plan.expressions()
    base = exprs.length() - len(aggs)
    finals = []
    for i, name in enumerate(aggs):
        canonical = exprs.apply(base + i).sql()
        m = re.match(r"(\w+)\((distinct )?", canonical.lower())
        fn, distinct = (m.group(1), bool(m.group(2))) if m else ("", False)
        pc = F.col(f"_p_{name}")
        if distinct or fn not in ("sum", "count", "min", "max"):
            raise ValueError(
                f"salted_agg supports sum/count/min/max, got {canonical!r} "
                f"for '{name}' — non-decomposable aggregates (avg, "
                f"countDistinct) would be silently wrong"
            )
        if fn == "min":
            finals.append(F.min(pc).alias(name))
        elif fn == "max":
            finals.append(F.max(pc).alias(name))
        else:
            finals.append(F.sum(pc).alias(name))
    partial = with_salt(df, salt, id_cols).groupBy(*keys, SALT).agg(
        *[c.alias(f"_p_{name}") for name, c in aggs.items()]
    )
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: scatter left across ``salt`` buckets,
    replicate right into every bucket, join on (keys + salt).

    Use when the right side is too large to broadcast and AQE's skew
    splitting is insufficient (e.g. a single pathological key). The right
    side is multiplied by ``salt`` — keep it the smaller input.

    The left salt must scatter *rows of the same key* across buckets, so
    it hashes row position, never the join keys (hashing the keys would
    put every row of a hot key back into one bucket).

    Only inner and left joins are supported: the right side is replicated
    ``salt`` times, so right/full outer would emit ``salt`` copies of
    every unmatched right row.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "leftsemi",
                   "left_semi", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} — the "
            f"replicated right side would duplicate unmatched right rows"
        )
    if SALT in right.columns:
        raise ValueError(
            f"right side already has a '{SALT}' column; rename it before "
            "calling salted_join (it would be clobbered and dropped)"
        )
    lsalted = with_salt(left, salt, id_cols=None)  # guards the left side
    rrep = right.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return lsalted.join(rrep, [*on, SALT], how).drop(SALT)
