"""Approximate aggregates: HLL distinct counts and percentile sketches.

Beyond the reference's surface (it has no approximate anything —
SURVEY.md §2.2), but essential at 100 TB: exact distinct counts shuffle
every distinct value, while a HyperLogLog sketch is a fixed few-KB state
per group that merges associatively — the shuffle carries sketches, not
values. Same story for percentiles.

These wrap Spark's built-ins (`approx_count_distinct`,
`approx_percentile`) with the error-budget knobs surfaced. HLL/quantile
results are engine-specific
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


# ---------------------------------------------------------------------------
# Count-Min sketch (deterministic, engine-portable)
# ---------------------------------------------------------------------------

def _md5_mod(col: Column, suffix: str, n: int) -> Column:
    """md5-derived bounded long — THE hash derivation every portable
    sketch here builds on (``conv(md5-prefix, 16, 10) % n``). One
    definition shared by the Count-Min and Bloom paths so the
    cross-engine oracle contract cannot silently drift if the formula is
    ever touched (r8 review finding — it existed as two 20-line copies)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(col.cast("string"), F.lit(suffix)).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    )
    return h.cast("long") % n


def _cms_bucket(col: Column, row: int, width: int, salt: str) -> Column:
    """Row ``row``'s bucket for a value: md5-derived, so any engine with
    md5 rebuilds the identical sketch (the oracle does)."""
    return _md5_mod(col, f"#{salt}{row}", width).alias("bucket")


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Build a Count-Min sketch of value frequencies as a
    ``(d, bucket, cnt)`` table — ``depth`` hash rows × ``width`` buckets.

    The large-scale frequency-estimation primitive: the sketch is a
    fixed ``depth×width`` table regardless of cardinality, merges by
    adding counts (unlike a top-k list), and never under-counts. ONE
    pass: each value explodes to its ``depth`` (row, bucket) cells
    (posexplode over a length-``depth`` array, not a ``depth``-way
    union), then a single hash aggregate. Unlike the HLL/percentile
    wrappers above, the construction is deterministic md5 arithmetic —
    so it IS cross-engine oracle-checkable.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    cells = F.array(
        *[_cms_bucket(F.col(col), i, width, salt) for i in range(depth)]
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(F.posexplode(cells).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Estimate frequencies from a sketch built with the same
    (depth, width, salt): min over each value's ``depth`` counters.
    Returns one row per DISTINCT probe value — ``(col, est)``; other
    item columns do not ride through (join back on ``col`` to annotate
    a full frame). Estimates never under-count (collisions only
    inflate); the bias bound is the classic 2N/width with probability
    1-2^-depth.

    Broadcast-joins the items' cells against the sketch (the sketch is
    at most depth×width rows — always broadcastable by construction).
    NULL probe values are excluded (the build filters them identically,
    so a NULL has no counters — emitting est=0 for it would be the one
    under-count the guarantee forbids); same documented policy as
    ``bloom_may_contain``.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    items = items.where(F.col(col).isNotNull())
    cells = F.array(
        *[_cms_bucket(F.col(col), i, width, salt) for i in range(depth)]
    )
    probes = items.select(
        F.col(col), F.posexplode(cells).alias("d", "bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (deterministic, engine-portable)
# ---------------------------------------------------------------------------

#: bits per bloom word — 63, not 64: DuckDB's `<<` raises on 1<<63
#: (BIGINT overflow), so the portable contract keeps the sign bit clear.
_BLOOM_WORD_BITS = 63


def _bloom_positions(col: Column, k: int, m_bits: int, salt: str) -> Column:
    """The k md5-derived bit positions of a value in an m_bits filter
    (same shared :func:`_md5_mod` derivation as the Count-Min rows)."""
    return F.array(*[_md5_mod(col, f"#{salt}{i}", m_bits) for i in range(k)])


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = 8192,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter as a ``(word, bits)`` table — the membership
    pre-filter for blocklists / decontamination sets too large to
    broadcast as raw values but trivially broadcastable as a bitset
    (``m_bits/63`` longs regardless of set size).

    One pass: each value explodes to its ``k`` bit positions, positions
    group into 63-bit words, and ``bit_or`` folds them — partial
    aggregation means the shuffle carries at most ``m_bits/63`` rows per
    partition. md5-derived positions make the filter bit-identical in any
    engine (the oracle rebuilds it).
    """
    if m_bits < 1 or k < 1:
        raise ValueError(f"m_bits/k must be >= 1, got {m_bits}/{k}")
    pos = F.explode(_bloom_positions(F.col(col), k, m_bits, salt)).alias("pos")
    return (
        df.where(F.col(col).isNotNull())
        .select(pos)
        .select(
            F.expr(f"pos div {_BLOOM_WORD_BITS}").alias("word"),
            F.expr(f"pmod(pos, {_BLOOM_WORD_BITS})").alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.expr("bit_or(shiftleft(1L, cast(bit as int)))").alias("bits")
        )
    )


def bloom_may_contain(
    bloom: DataFrame,
    items: DataFrame,
    col: str,
    m_bits: int = 8192,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Probe a filter built by :func:`bloom_build` with the same
    ``(m_bits, k, salt)``. Returns one row per DISTINCT probe value:
    ``(col, may_contain)`` — other item columns do NOT ride through and
    duplicate values collapse (join the verdicts back on ``col`` to
    annotate a full frame). ``may_contain`` false is DEFINITE absence
    (the no-false-negatives guarantee); true is presence up to the
    false-positive rate ``(1 - e^{-kn/m})^k``.

    The bitset broadcasts (≤ m_bits/63 rows); each distinct value checks
    its k bits with a broadcast join + conjunction — the cheap
    pre-filter before an exact (shuffling) semi-join on the survivors.
    """
    if k < 1 or m_bits < 1:
        # k=0 explodes zero rows — every probe silently vanishes and a
        # blocklist pre-filter would pass everything (bloom_build raises
        # for the identical mistake)
        raise ValueError(f"k/m_bits must be >= 1, got {k}/{m_bits}")
    # explode, not posexplode: the position index is never used here
    # (unlike count_min, where the row index picks the hash family)
    pr = items.select(
        F.col(col),
        F.explode(_bloom_positions(F.col(col), k, m_bits, salt)).alias("pos"),
    ).select(
        col,
        F.expr(f"pos div {_BLOOM_WORD_BITS}").alias("word"),
        F.expr(f"pmod(pos, {_BLOOM_WORD_BITS})").alias("bit"),
    )
    return (
        pr.join(F.broadcast(bloom), "word", "left")
        .select(
            col,
            F.expr(
                "shiftright(coalesce(bits, 0L), cast(bit as int)) & 1"
            ).alias("_set"),
        )
        .groupBy(col)
        # coalesce: a NULL probe value hashes to NULL positions and
        # would otherwise emit may_contain=NULL — neither of the two
        # documented states. bloom_build excludes NULLs from the set,
        # so False (definite absence) is the honest answer (r7 review).
        .agg(
            F.coalesce(F.min("_set") == 1, F.lit(False)).alias("may_contain")
        )
    )
