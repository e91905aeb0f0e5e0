"""dataproc_spark — a PySpark-native selective-search / data-processing engine.

A from-scratch, Spark-first re-expression of the capabilities of
west-tandon/dataproc (see SURVEY.md), plus large-scale LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal plumbing,
streaming).

Design principles (SURVEY.md §1, §4):
  * DataFrame API everywhere; plans stay declarative so Catalyst can push
    filters/projections into scans and pick join strategies.
  * The reference's implicit pandas row-order semantics become explicit
    rank columns with deterministic tie-breaks.
  * Pure functions — no caller-visible mutation (reference quirk Q3 fixed).
  * Python only crosses the JVM boundary in Arrow-batched `applyInPandas`
    (the greedy bucket resolver), never row-at-a-time.
"""

from dataproc_spark.core import cartesian, ensure_has_columns, get_spark
from dataproc_spark.measures import Measure, precision_at, recall_at
from dataproc_spark.selective import (
    decayed_buckets,
    evaluate,
    evaluate_step,
    rank_selection,
    resolve_bucket_selection,
    select,
    select_buckets,
    select_with_decay,
)
from dataproc_spark.temporal import asof_join, interval_join

__all__ = [
    "cartesian",
    "ensure_has_columns",
    "get_spark",
    "Measure",
    "precision_at",
    "recall_at",
    "decayed_buckets",
    "evaluate",
    "evaluate_step",
    "rank_selection",
    "resolve_bucket_selection",
    "select",
    "select_buckets",
    "select_with_decay",
    "asof_join",
    "interval_join",
]

__version__ = "0.1.0"
