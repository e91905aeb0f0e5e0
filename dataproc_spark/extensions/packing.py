"""Sequence packing for LLM training batches.

Packing concatenates documents into fixed-budget bins (token/char budget
per training sequence) so padding waste stays low. The packer here is the
*deterministic greedy scan*: within each group, walk documents in a total
order and open a new bin whenever adding the next document would exceed
the budget. Greedy-in-order is the industry default for training-data
prep (deterministic, single pass, and within a constant factor of optimal
bin count for bounded item sizes) — bin-optimal packing is NP-hard and
non-deterministic packers break resumable pipelines.

Scale design: the scan is inherently sequential *within* a group, so the
operator parallelizes across groups (`applyInPandas`, Arrow-batched —
same pattern as the reference's greedy bucket resolver). Group size
bounds the single-task cost: pack per (source, shard-date, …) rather than
one global group; for an unbounded group, pre-split it with a
deterministic hash prefix and accept bin fragmentation at chunk edges.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_greedy(
    df: DataFrame,
    size_col: str,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    tie_break_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign a ``bin_id`` (0-based per group) to every row by the greedy
    in-order scan. A single row larger than ``budget`` gets its own bin
    (never dropped — the caller decides whether to truncate or filter).
    Deterministic given a TOTAL order: reruns produce identical bins
    regardless of partitioning — which requires ``(order_col,
    *tie_break_cols, size_col)`` to be unique within each group. If
    duplicates exist (e.g. colliding doc_ids after a corpus union) the
    packer raises rather than silently producing partition-dependent
    bins, because the stable sort would otherwise preserve the
    shuffle-dependent arrival order among ties.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    sort_keys = [order_col, *tie_break_cols, size_col]
    out_schema = StructType(
        df.schema.fields + [StructField("bin_id", LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf[size_col].isna().any():
            raise ValueError(
                f"pack_greedy: null {size_col!r} values in group "
                f"{pdf[group_col].iloc[0]!r} — fill or filter them first"
            )
        if (pdf[size_col] < 0).any():
            # a negative size drives acc <= 0, defeating the acc > 0
            # new-bin guard — bins silently exceed the budget
            raise ValueError(
                f"pack_greedy: negative {size_col!r} values in group "
                f"{pdf[group_col].iloc[0]!r} — sizes must be >= 0"
            )
        pdf = pdf.sort_values(sort_keys, kind="mergesort")
        if pdf.duplicated(subset=sort_keys).any():
            raise ValueError(
                f"pack_greedy: duplicate {sort_keys} values in group "
                f"{pdf[group_col].iloc[0]!r} — the greedy scan would be "
                f"partition-order-dependent; pass tie_break_cols that "
                f"make the order total"
            )
        bins: list[int] = []
        acc, bid = 0, 0
        for s in pdf[size_col]:
            s = int(s)
            if acc > 0 and acc + s > budget:
                bid += 1
                acc = 0
            acc += s
            bins.append(bid)
        pdf = pdf.copy()
        pdf["bin_id"] = bins
        return pdf

    return df.groupBy(group_col).applyInPandas(pack, out_schema)


def pack_stats(packed: DataFrame, size_col: str, group_col: str = "source") -> DataFrame:
    """Per-(group, bin) fill statistics — the packing-efficiency report."""
    return packed.groupBy(group_col, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(size_col).cast("long").alias(f"sum_{size_col}"),
    )
