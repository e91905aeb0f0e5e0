"""Record linkage: blocked fuzzy (edit-distance) joins.

Entity resolution for data curation — find records whose key strings
are ALMOST equal (typos, OCR noise, suffix drift) without the |L|×|R|
cross join an unblocked fuzzy match implies. The standard shape:

1. **Blocking**: derive a cheap equality key (prefix, length band,
   phonetic code) such that true matches almost always share it.
2. **Equi-join on the block** — a hash shuffle, never a cross join.
3. **Verify** with the expensive predicate (Levenshtein) only inside
   each block.

At 100 TB the block key IS the scalability contract: candidate volume
is Σ|block|² over blocks, so block granularity must grow with the
corpus (the same cells-∝-corpus rule as IVF cells and LSH bands —
SCALE.md). A degenerate block (everything in one bucket) reproduces the
cross join; `skew_report`'s ``selfjoin_m``/``cut-or-split`` signal
applies verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    block: Column | str,
    max_dist: int = 1,
    id_col: str = "id",
    self_join: bool | None = None,
) -> DataFrame:
    """Blocked fuzzy join: pairs (id_a, id_b, dist) with
    ``levenshtein(key_a, key_b) <= max_dist`` among records sharing the
    block key.

    ``self_join`` controls the ``id_a < id_b`` dedup. When the two
    sides are the SAME object, the orientation filter runs at join
    time (half the candidate pairs ever reach Levenshtein and no
    dedup shuffle); for asymmetric overlapping sides the match is
    canonicalized and deduped after verification instead. The default
    (``None``) auto-detects ONLY the ``left is right`` same-object case
    — two separately-constructed frames over the SAME records (two
    ``spark.read`` calls, or ``df`` vs ``df.where(...)``) look like
    distinct datasets and would flood the output with trivial
    self-pairs and mirrored duplicates (r8 review finding). Pass
    ``self_join=True`` explicitly whenever the two sides' id domains
    overlap.

    ``block`` is a Column expression (or column name) computed on each
    side — e.g. ``F.expr("substring(name, 1, 16)")`` or
    ``F.concat(F.length("name"), F.soundex("name"))``. Levenshtein runs
    JVM-side (`F.levenshtein`), only inside blocks.
    """
    bcol = F.col(block) if isinstance(block, str) else block
    # identical-object sides admit the cheap orientation filter: every
    # pair is generated in BOTH orders, so `id_a < id_b` at join time
    # keeps exactly the canonical row — half the join output (and half
    # the levenshtein evals) and NO canonicalize+distinct exchange
    # afterwards (r15 opt, guide §2.4/§2.3). The r8 lost-match hazard
    # only exists for asymmetric overlapping sides (df vs
    # df.where(...)), which never take this path.
    identical_sides = left is right
    if self_join is None:
        self_join = identical_sides
    la = left.select(
        F.col(id_col).alias("id_a"),
        F.col(key_col).alias("_key_a"),
        bcol.alias("_blk"),
    )
    rb = right.select(
        F.col(id_col).alias("id_b"),
        F.col(key_col).alias("_key_b"),
        bcol.alias("_blk"),
    )
    joined = la.join(rb, "_blk")
    if self_join and identical_sides:
        joined = joined.where(F.col("id_a") < F.col("id_b"))
    elif self_join:
        # drop exact self-pairs only; mirror-dedup happens AFTER the
        # match via least/greatest + distinct. The old `id_a < id_b`
        # pre-filter silently LOST real matches when the two sides were
        # asymmetric overlapping sets (df vs df.where(...)): the pair
        # was only generated in the order the filter rejects (r8
        # follow-up review finding). For identical sides the
        # canonicalize+distinct yields exactly the old output.
        joined = joined.where(F.col("id_a") != F.col("id_b"))
    # the 3-arg levenshtein short-circuits past the threshold (returns
    # -1), skipping the full DP matrix for clearly-far pairs — the
    # common case inside a block
    out = (
        joined.withColumn(
            "dist", F.levenshtein("_key_a", "_key_b", int(max_dist))
        )
        .where(F.col("dist") >= 0)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )
    if self_join and not identical_sides:
        # levenshtein is symmetric, so the canonical orientation keeps
        # the same dist; distinct is a shuffle on the (small) match set
        out = out.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "dist",
        ).distinct()
    return out
