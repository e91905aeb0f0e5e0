"""Drop-in compatibility surface mirroring the reference package layout.

A user of west-tandon/dataproc can switch with an import change::

    # from dataproc import selectivesearch, data, measures, plot
    from dataproc_spark.compat import selectivesearch, data, measures, plot

Same function names and signatures (``verbose`` flags accepted and
ignored — there is no per-step loop to narrate); pandas DataFrames in and
out become Spark DataFrames. Functions that the reference binds to an
ambient pandas runtime (``cartesian``, ``load_*``) resolve the active
SparkSession. Two documented divergences, both recorded in SURVEY.md
§2.4: ``evaluate(sort=True)`` actually sorts (the reference discards the
sort — quirk Q1), and ``to_trec`` does not mutate its input (quirk Q3).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from dataproc_spark import core as _core
from dataproc_spark import io as _io
from dataproc_spark import measures as _measures
from dataproc_spark import selective as _selective


def _spark() -> SparkSession:
    session = SparkSession.getActiveSession()
    if session is None:
        raise RuntimeError(
            "no active SparkSession — create one before calling "
            "dataproc_spark.compat functions (the reference's ambient "
            "pandas runtime maps to the active session)"
        )
    return session


# -- dataproc.data ----------------------------------------------------------

def cartesian(ranges: Sequence[Sequence], names=None) -> DataFrame:
    """Reference ``data.cartesian(ranges, names)`` on the active session."""
    return _core.cartesian(_spark(), ranges, names=names)


ensure_has_columns = _core.ensure_has_columns

data = SimpleNamespace(cartesian=cartesian, ensure_has_columns=ensure_has_columns)


# -- dataproc.measures ------------------------------------------------------

precision_at = _measures.precision_at

measures = SimpleNamespace(precision_at=precision_at)


# -- dataproc.plot ----------------------------------------------------------

from dataproc_spark import plot as _plot

plot_and_show = _plot.plot_and_show

plot = SimpleNamespace(
    plot_and_show=plot_and_show, plot_and_save=_plot.plot_and_save
)


# -- dataproc.selectivesearch -----------------------------------------------

def evaluate_step(shards, results, measures, step, verbose=False,
                  with_buckets=False) -> DataFrame:
    return _selective.evaluate_step(
        shards, results, measures, step, with_buckets=with_buckets
    )


def evaluate(shards, results, measures, num_shards, verbose=False,
             sort=False, num_buckets=None) -> DataFrame:
    # the reference UNCONDITIONALLY ends with sort_values(['query',
    # 'step']) (selectivesearch.py:73) — a drop-in consumer may read
    # rows positionally or feed plot_and_show, so the compat surface
    # reproduces that final order. The engine-level selective.evaluate
    # happens to order identically today, but the POSITIONAL-read
    # contract lives HERE: compat re-asserts it so an engine-side plan
    # change can never silently break reference parity (the duplicate
    # sort is eliminated by Catalyst's EliminateSorts when redundant)
    return _selective.evaluate(
        shards, results, measures, num_shards, sort=sort,
        num_buckets=num_buckets,
    ).orderBy("query", "step")


def load_shard_selection(queries, nshards, shard_scores_path) -> DataFrame:
    return _io.load_shard_selection(_spark(), queries, nshards, shard_scores_path)


def load_bucket_selection(queries, nshards, nbuckets, shard_scores_path) -> DataFrame:
    return _io.load_bucket_selection(
        _spark(), queries, nshards, nbuckets, shard_scores_path
    )


def load_shard_results(basename, nshards, nbuckets=1) -> DataFrame:
    return _io.load_shard_results(_spark(), basename, nshards, nbuckets)


select = _selective.select
decayed_buckets = _selective.decayed_buckets
select_with_decay = _selective.select_with_decay
resolve_bucket_selection = _selective.resolve_bucket_selection
select_buckets = _selective.select_buckets
to_trec = _io.to_trec

selectivesearch = SimpleNamespace(
    evaluate_step=evaluate_step,
    evaluate=evaluate,
    load_shard_selection=load_shard_selection,
    load_bucket_selection=load_bucket_selection,
    load_shard_results=load_shard_results,
    select=select,
    decayed_buckets=decayed_buckets,
    select_with_decay=select_with_decay,
    resolve_bucket_selection=resolve_bucket_selection,
    select_buckets=select_buckets,
    to_trec=to_trec,
)
