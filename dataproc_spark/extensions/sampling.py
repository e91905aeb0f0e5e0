"""Deterministic sampling / split assignment for training-data pipelines.

Everything here is *hash-deterministic*: membership depends only on
``md5(id + salt)``, never on partitioning, row order, or a seeded RNG, so

* re-running the pipeline (or re-running it on a different cluster layout)
  selects the identical sample — reproducible experiments and resumable
  backfills for free;
* train/val/test assignment is stable under corpus growth: adding new
  documents never moves an existing document between splits (the property
  per-partition RNG sampling like ``DataFrame.sample`` cannot give);
* the comparisons are on lowercase-hex *strings*, so any engine with
  ``md5`` reproduces the selection bit-for-bit (the oracle gate does).

All map-side column expressions — no shuffle for sample/split, one
window shuffle for exact-k stratified sampling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataproc_spark.skew import hashable_columns


def hash_hex(id_col: str, salt: str, chars: int = 8) -> F.Column:
    """First ``chars`` hex chars of ``md5(id || '#' || salt)`` — a uniform
    draw in [0, 16^chars) ordered lexicographically (fixed width).

    NULL ids hash a sentinel instead of propagating NULL: without it a
    NULL id makes every range predicate NULL, so ``deterministic_sample``
    silently dropped NULL-id rows even at fraction=1.0 while
    ``hash_split`` dumped them all into the LAST split (r7 review
    finding) — two different silent behaviors for the same input. With
    the sentinel every NULL-id row gets one deterministic draw, routed
    uniformly like any other id. (The cross-engine oracles hash raw ids;
    they run on non-null keys by contract.)
    """
    safe_id = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null"))
    return F.substring(
        F.md5(F.concat(safe_id, F.lit(f"#{salt}")).cast("binary")),
        1,
        chars,
    )


def frac_to_hex(fraction: float, chars: int = 8) -> str:
    """The hex-string cutoff below which a uniform hex draw falls with
    probability ``fraction`` (floor; exact for dyadic fractions).

    Comparisons are *lexicographic on fixed-width hex*, so fraction 1.0
    must NOT return the 9-char ``"1" + 8×"0"`` — that string sorts *below*
    almost every 8-char hex ("ffffffff" < "100000000" is false
    lexicographically). Return ``"g"`` instead: above every hex char, so
    ``hex < "g"`` keeps everything. (Caught by a unit test; the
    cross-engine oracle agreed with the bug because both engines shared
    the same wrong cutoff — value-matching proves consistency, not
    intent.)
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    raw = int(fraction * (16 ** chars))
    if raw >= 16 ** chars:
        return "g"
    return format(raw, f"0{chars}x")


def deterministic_sample(
    df: DataFrame, id_col: str, salt: str, fraction: float
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash: map-only, no
    shuffle, stable across runs/partitionings/corpus growth."""
    return df.where(hash_hex(id_col, salt) < frac_to_hex(fraction))


def hash_split(
    df: DataFrame,
    id_col: str,
    salt: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8), ("val", 0.1), ("test", 0.1),
    ),
) -> DataFrame:
    """Assign each row to a named split by cumulative hash ranges.

    ``weights`` is an ordered (name, weight) list summing to 1; the hash
    space is carved into consecutive ranges, so every row lands in exactly
    one split and assignments are stable under corpus growth.
    """
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    # a negative weight can still sum to 1 but makes the cumulative
    # cutoffs non-monotone — the first-match when-chain then silently
    # misallocates the hash space (r8 review finding)
    bad = [(n, w) for n, w in weights if w < 0]
    if bad:
        raise ValueError(f"split weights must be >= 0, got {bad}")
    h = hash_hex(id_col, salt)
    expr = None
    acc = 0.0
    for name, w in weights[:-1]:
        # clamp: float accumulation can land at 1.0000000000000002 for
        # valid weight lists (e.g. a trailing zero-weight split), which
        # passes the sum gate but would crash frac_to_hex (r7 review)
        acc = min(acc + w, 1.0)
        cond = h < F.lit(frac_to_hex(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last_name = weights[-1][0]
    split = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn("split", split)


def mixture_sample(
    df: DataFrame,
    fractions: dict[str, float],
    group_col: str,
    id_col: str,
    salt: str,
    default: float = 0.0,
) -> DataFrame:
    """Per-group sampling rates — the training-mixture reweighting step
    (e.g. upsample wiki, downsample crawl). Same md5 hex-range membership
    as ``deterministic_sample``, so the mixture is reproducible and
    append-stable; groups absent from ``fractions`` get ``default``."""
    h = hash_hex(id_col, salt)
    expr = None
    for g, f in fractions.items():
        cond = F.col(group_col) == g
        cut = F.lit(frac_to_hex(f))
        expr = F.when(cond, cut) if expr is None else expr.when(cond, cut)
    cutoff = (
        expr.otherwise(F.lit(frac_to_hex(default)))
        if expr is not None
        else F.lit(frac_to_hex(default))
    )
    return df.where(h < cutoff)


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    id_col: str,
    salt: str,
    budget_rows: int,
    chars: int = 8,
) -> DataFrame:
    """Temperature-balanced mixture RESAMPLING (α = 0.5, the
    multilingual-LM convention: per-group target counts ∝ sqrt(|group|)).
    Unlike :func:`mixture_sample` (caller-supplied keep rates, never
    upsamples), this derives the rates from the data and materializes
    EPOCH REPEATS for upsampled groups: each row is emitted
    ``target_g div n_g`` times plus one more when its hash draw falls
    under the fractional remainder — so the output hits the per-group
    targets exactly in expectation with zero RNG.

    All arithmetic is exact integer (floor-sqrt weights, integer
    division, md5 hex draws), so any engine with md5 reproduces the
    output bit-for-bit. Output rows carry ``epoch`` (0-based repeat
    index): downstream shuffle/packing treats (id, epoch) as row
    identity, the standard way repeated data flows into training shards.

    Scale: the rate table is |groups| rows (broadcast); data rows are
    touched map-only (hash + broadcast join + explode) — no shuffle of
    the fact side, append-stable like every sampler here. The remainder
    arithmetic needs ``|group| ≤ 2^(63 - 4·chars)`` to avoid overflow
    (2^31 rows/group at the default chars=8; lower ``chars`` for more).
    """
    m = 16 ** chars
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    # the window runs over the tiny per-group count frame, not the data
    rates = (
        counts.withColumn("_w", F.floor(F.sqrt(F.col("_n"))).cast("long"))
        .withColumn("_tw", F.sum("_w").over(Window.partitionBy()))
        .withColumn("_target", F.expr(f"({int(budget_rows)} * _w) div _tw"))
        .withColumn("_copies", F.expr("_target div _n"))
        .withColumn(
            "_rem_rate", F.expr(f"({m} * (_target - _copies * _n)) div _n")
        )
        .select(group_col, "_copies", "_rem_rate")
    )
    draw = F.conv(hash_hex(id_col, salt, chars), 16, 10).cast("long")
    # null-SAFE join: groupBy counted a NULL group into the rate table,
    # so a null-unsafe equi-join would silently drop every NULL-group
    # row AND leave the budget under-filled (r8 review finding)
    rates = rates.withColumnRenamed(group_col, "_rate_grp")
    return (
        df.join(
            F.broadcast(rates),
            F.col(group_col).eqNullSafe(F.col("_rate_grp")),
        )
        .drop("_rate_grp")
        .withColumn("_k", F.col("_copies") + (draw < F.col("_rem_rate")).cast("long"))
        .where(F.col("_k") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0).cast("long"), F.col("_k") - 1))
        )
        .drop("_copies", "_rem_rate", "_k")
    )


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    k: int,
    id_col: str,
    salt: str,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by hash order
    (deterministic, unlike ``sampleBy``'s per-partition RNG — and exact-k,
    which ``sampleBy`` cannot guarantee at all).

    One window shuffle on the strata key; the rank filter is pushed into
    the window's sort so Spark runs it as a partial top-k per stratum
    (WindowGroupLimit), not a full sort of every stratum.
    """
    # full-row xxhash64 as the FINAL tiebreak: NULL or duplicate ids
    # share the first two sort keys, and a bare row_number over a tied
    # prefix picks boundary rows by shuffle arrival order (r8 review
    # finding). The content hash is deterministic under repartitioning;
    # rows still tied after it are bit-identical, so either choice is
    # the same output. (Not oracle-replayable — unreachable for the
    # unique non-NULL ids every gate uses.)
    # hash expressions reject MapType columns at plan time — wherever
    # the map sits in the type tree, not just top-level — so the
    # full-row tiebreak hashes every map-free column (a frame carrying a
    # metadata map, or a struct/array containing one, would otherwise
    # crash the whole operator — r8 follow-up review + r8 ADVICE; map
    # columns can't deterministically order anyway)
    hashable = hashable_columns(df)
    w = Window.partitionBy(*strata).orderBy(
        hash_hex(id_col, salt),
        F.col(id_col).asc_nulls_last(),
        F.xxhash64(*hashable) if hashable else F.lit(0),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
