"""Selective-search gates instantiated on the star schema.

Split out of the monolithic queries.py (r7); registry assembly lives in
``dataproc_spark.queries`` (the package __init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from dataproc_spark.core import cartesian
from dataproc_spark.io import trec_frame
from dataproc_spark.measures import num_retrieved, precision_at
from dataproc_spark.selective import (
    evaluate,
    rank_selection,
    resolve_bucket_selection,
    select,
    select_buckets,
    select_with_decay,
)

# ---------------------------------------------------------------------------
# table access
# ---------------------------------------------------------------------------

from dataproc_spark.queries._tables import _t, rev_cents  # noqa: F401


def _shard_results(li: DataFrame) -> DataFrame:
    return li.select(
        (F.col("l_orderkey") % 7).cast("long").alias("query"),
        (F.col("l_suppkey") % 5).cast("long").alias("shard"),
        (F.col("l_linenumber") % 2).cast("int").alias("bucket"),
        (F.col("l_partkey") * 10 + F.col("l_linenumber")).cast("long").alias("docid"),
        F.col("l_orderkey").cast("long").alias("okey"),
        rev_cents().alias("score"),
    )


#: session-scoped memo for the persisted shard-results frame, keyed by the
#: lineitem scan's plan text — without it, every selective query in a
#: registry sweep would persist a FRESH copy of the identical frame and
#: nothing would ever unpersist them, filling executor storage with
#: duplicates for the life of the session.
_SHARD_RESULTS_CACHE: dict[str, DataFrame] = {}


def _shared_shard_results(li: DataFrame) -> DataFrame:
    """The shard-results frame, persisted ONCE per source and reused
    across both plan branches and registry queries.

    Every selective pipeline derives BOTH its selection (an aggregate of
    the results) and its probe side from the same frame; without the
    persist each branch re-scans lineitem — at 100 TB that is a full extra
    pass over the corpus. The memo makes the persist session-scoped: six
    selective gate queries share one cache entry instead of leaking six.
    (On a real cluster this is where you would checkpoint the results
    table instead.)
    """
    app = li.sparkSession.sparkContext.applicationId
    # evict entries from other (stopped) sessions: a long-lived process
    # creating several sessions (pytest, repeated bench harnesses) would
    # otherwise accumulate one dead py4j-bound DataFrame handle per
    # (application, plan) forever (r7 review finding)
    for stale in [k for k in _SHARD_RESULTS_CACHE if not k.startswith(app + "\n")]:
        del _SHARD_RESULTS_CACHE[stale]
    key = app + "\n" + li._jdf.queryExecution().logical().toString()
    cached = _SHARD_RESULTS_CACHE.get(key)
    if cached is None:
        # note: spreading the scan across cores before the persist
        # (spread_narrow) was measured at sf0.1 and REJECTED — the
        # added 600 k-row shuffle costs more than the parallel cache
        # materialization saves (bench select_top_t 3.7 s → 4.1 s).
        # r16 re-measured the BYTE-SIZED variant (1 MB/task ≈ 11-16
        # partitions, with and without an eager count()): also a LOSS
        # (fresh-session A/B 3.1-3.7 s → 4.3-4.6 s) — the spread
        # exchange writes the full 600 k-row projection (~16 MB) from
        # the same 3 scan tasks, which costs as much as the 3-task
        # columnar cache write it parallelizes. The 3-split scan is the
        # floor here; do not retry spread shapes on this cache.
        cached = _SHARD_RESULTS_CACHE[key] = _shard_results(li).persist()
    return cached


def _order_key_desc_score() -> F.Column:
    """Composite sort key equivalent to ORDER BY score DESC, docid, okey.

    Struct comparison is lexicographic by field, so sorting this key ASC
    reproduces the evaluation order without materializing an integer
    ``row_number`` — whose window, partitioned by ``query``, caps
    parallelism at the query count (the r8 100× probe measured it at
    46 s of a 79 s ``evaluate_sweep`` run). ``score`` is integer cents,
    so ``-score`` is an exact descending encoding.
    """
    return F.struct(
        (-F.col("score")).alias("neg_score"),
        F.col("docid").alias("docid"),
        F.col("okey").alias("okey"),
    )


def _ranked_selection_from(results: DataFrame) -> DataFrame:
    """Per-query shard ranking derived from an existing results frame
    (pass the *same* DataFrame you probe with, so the scan is shared)."""
    sel = results.groupBy("query", "shard").agg(
        F.sum("score").alias("shard_score")
    )
    return rank_selection(sel, score_col="shard_score")


def _ranked_selection(li: DataFrame) -> DataFrame:
    return _ranked_selection_from(_shard_results(li))


#: shared oracle CTE prefix mirroring _shard_results/_ranked_selection
_SS_CTE = """
results AS (
    SELECT CAST(l_orderkey % 7 AS BIGINT) AS query,
           CAST(l_suppkey % 5 AS BIGINT) AS shard,
           CAST(l_linenumber % 2 AS INTEGER) AS bucket,
           CAST(l_partkey * 10 + l_linenumber AS BIGINT) AS docid,
           CAST(l_orderkey AS BIGINT) AS okey,
           CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS score
    FROM lineitem
),
selection AS (
    SELECT query, shard, CAST(SUM(score) AS BIGINT) AS shard_score
    FROM results GROUP BY query, shard
),
ranked_sel AS (
    SELECT query, shard, shard_score,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query ORDER BY shard_score DESC, shard
           ) - 1 AS INTEGER) AS rank
    FROM selection
)
"""


def q_select_top_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 `select`: results from the top-2 shards per query (semi-join)."""
    res = _shared_shard_results(_t(spark, sf_dir, "lineitem"))
    return select(_ranked_selection_from(res), res, t=2)


SQL_SELECT_TOP_T = f"""
WITH {_SS_CTE}
SELECT r.query, r.shard, r.bucket, r.docid, r.okey, r.score
FROM results r
JOIN ranked_sel k ON r.query = k.query AND r.shard = k.shard
WHERE k.rank < 2
"""


def q_selection_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6-shape: per-query shard ranking by aggregate score (rank window)."""
    return _ranked_selection(_t(spark, sf_dir, "lineitem"))


SQL_SELECTION_RANK = f"""
WITH {_SS_CTE}
SELECT query, shard, shard_score, rank FROM ranked_sel
"""


def q_select_with_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: top-3 shards, bucket budget decaying [2,1,1] (decay 0.5)."""
    res = _shared_shard_results(_t(spark, sf_dir, "lineitem"))
    # num_buckets=2 is known from the construction (l_linenumber % 2)
    return select_with_decay(
        _ranked_selection_from(res), res, 3, 0.5, num_buckets=2
    )


SQL_SELECT_WITH_DECAY = f"""
WITH {_SS_CTE}
SELECT r.query, r.shard, r.bucket, r.docid, r.okey, r.score
FROM results r
JOIN (SELECT query, shard,
             CASE WHEN rank = 0 THEN 2 ELSE 1 END AS buckets
      FROM ranked_sel WHERE rank < 3) k
  ON r.query = k.query AND r.shard = k.shard
WHERE r.bucket < k.buckets
"""


def q_evaluate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: P@5/P@10 + result counts at every selection depth 1..5."""
    base = _shared_shard_results(_t(spark, sf_dir, "lineitem"))
    res = base.withColumn("rel", (F.col("docid") % 3 == 0).cast("int"))
    # struct sort key ≡ (score DESC, docid, okey): `evaluate` only ever
    # ORDERS BY global_rank, so materializing the integer rank via a
    # row_number window partitioned by `query` is pure cost — and at
    # scale it is a straggler (parallelism = #queries; the r8 100× probe
    # measured that window at 46 s of a 79 s run). Score is integer
    # cents, so negation is exact.
    res = res.withColumn("global_rank", _order_key_desc_score())
    measures = {"rel": [precision_at(5), precision_at(10), num_retrieved()]}
    return evaluate(_ranked_selection_from(base), res, measures, num_shards=5)


SQL_EVALUATE_SWEEP = f"""
WITH {_SS_CTE},
res_ranked AS (
    SELECT r.*,
           CASE WHEN docid % 3 = 0 THEN 1 ELSE 0 END AS rel,
           ROW_NUMBER() OVER (
               PARTITION BY query ORDER BY score DESC, docid, okey
           ) AS global_rank
    FROM results r
),
steps AS (SELECT CAST(s AS INTEGER) AS step FROM range(1, 6) t(s)),
joined AS (
    SELECT rr.query, rr.rel, rr.global_rank, st.step
    FROM res_ranked rr
    JOIN ranked_sel k ON rr.query = k.query AND rr.shard = k.shard
    JOIN steps st ON k.rank < st.step
),
prefixed AS (
    SELECT query, step, rel,
           ROW_NUMBER() OVER (
               PARTITION BY query, step ORDER BY global_rank
           ) AS rn
    FROM joined
)
SELECT query, step,
       AVG(CASE WHEN rn <= 5 THEN rel END) AS p_5,
       AVG(CASE WHEN rn <= 10 THEN rel END) AS p_10,
       CAST(COUNT(*) AS BIGINT) AS num_ret
FROM prefixed
GROUP BY query, step
"""


def q_evaluate_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 with num_buckets: bucket-granular sweep over 5 shards × 2 buckets
    (10 steps), P@5 per depth."""
    base = _shared_shard_results(_t(spark, sf_dir, "lineitem"))
    res = base.withColumn("rel", (F.col("docid") % 3 == 0).cast("int"))
    # struct sort key — see q_evaluate_sweep for the scale rationale
    res = res.withColumn("global_rank", _order_key_desc_score())
    bsel = base.groupBy("query", "shard", "bucket").agg(
        F.sum("score").alias("shard_score")
    )
    bsel = rank_selection(bsel, "shard_score", ("query",), ("shard", "bucket"))
    measures = {"rel": [precision_at(5), num_retrieved()]}
    return evaluate(bsel, res, measures, num_shards=5, num_buckets=2)


SQL_EVALUATE_BUCKETS = f"""
WITH {_SS_CTE},
bsel AS (
    SELECT query, shard, bucket, CAST(SUM(score) AS BIGINT) AS shard_score
    FROM results GROUP BY query, shard, bucket
),
branked AS (
    SELECT query, shard, bucket,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query ORDER BY shard_score DESC, shard, bucket
           ) - 1 AS INTEGER) AS rank
    FROM bsel
),
res_ranked AS (
    SELECT r.*,
           CASE WHEN docid % 3 = 0 THEN 1 ELSE 0 END AS rel,
           ROW_NUMBER() OVER (
               PARTITION BY query ORDER BY score DESC, docid, okey
           ) AS global_rank
    FROM results r
),
steps AS (SELECT CAST(s AS INTEGER) AS step FROM range(1, 11) t(s)),
joined AS (
    SELECT rr.query, rr.rel, rr.global_rank, st.step
    FROM res_ranked rr
    JOIN branked k
      ON rr.query = k.query AND rr.shard = k.shard AND rr.bucket = k.bucket
    JOIN steps st ON k.rank < st.step
),
prefixed AS (
    SELECT query, step, rel,
           ROW_NUMBER() OVER (
               PARTITION BY query, step ORDER BY global_rank
           ) AS rn
    FROM joined
)
SELECT query, step,
       AVG(CASE WHEN rn <= 5 THEN rel END) AS p_5,
       CAST(COUNT(*) AS BIGINT) AS num_ret
FROM prefixed
GROUP BY query, step
"""


def q_evaluate_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-P@k measures (recall@10, AP@10, nDCG@10) through the full
    evaluate sweep — oracle coverage for the ``_hits`` / ``_ideal_rn``
    window machinery (`selective._augment_for_measures`).

    These are integer-scaled deterministic variants of
    ``measures.recall_at`` / ``average_precision`` / ``ndcg_at``: every
    order-dependent float SUM term is rounded to integer micro-units
    *before* summation (so the sum is exact and independent of reduction
    order in both engines), and the only floating-point operations left are
    single final divisions — the same cross-engine exactness strategy as
    the integer-cents revenue columns.
    """
    from dataproc_spark.measures import Measure

    base = _shared_shard_results(_t(spark, sf_dir, "lineitem"))
    res = base.withColumn("rel", (F.col("docid") % 3 == 0).cast("int"))
    # struct sort key — see q_evaluate_sweep for the scale rationale
    res = res.withColumn("global_rank", _order_key_desc_score())
    # per-query totals as aggregate + equi-join, NOT an unpartitioned-order
    # window over `query`: the window shape funnels the whole frame into
    # #queries tasks; the aggregate is map-side combined and the 7-row
    # totals side broadcasts under AQE
    totals = res.groupBy("query").agg(F.sum("rel").alias("num_rel"))
    res = res.join(totals, "query")

    def prefix_hits(rel, rn):
        return F.sum(
            F.when(F.col(rn) <= 10, F.col(rel)).otherwise(F.lit(0))
        ).cast("long")

    def r10(rel, rn):
        total = F.max("num_rel")
        return F.when(total > 0, prefix_hits(rel, rn) / total).otherwise(
            F.lit(0.0)
        )

    def ap10(rel, rn):
        num = F.sum(
            F.when(
                (F.col(rn) <= 10) & (F.col(rel) > 0),
                F.round(F.lit(1_000_000.0) * F.col("_hits") / F.col(rn)).cast(
                    "long"
                ),
            ).otherwise(F.lit(0).cast("long"))
        )
        # TOTAL relevant for the query, never prefix-limited — the same
        # trec_eval denominator measures.average_precision uses after
        # its r8 fix; the gate previously pinned the prefix-limited
        # variant and so could not catch a regression of that exact bug
        den = F.max("num_rel")
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    def _dcg_micro(rel, pos_col):
        return F.sum(
            F.when(
                (F.col(pos_col) <= 10) & (F.col(rel) > 0),
                F.round(
                    F.lit(1_000_000.0) * F.col(rel) / F.log2(F.col(pos_col) + 1)
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )

    def ndcg10(rel, rn):
        dcg = _dcg_micro(rel, rn)
        idcg = _dcg_micro(rel, "_ideal_rn")
        return F.when(idcg > 0, dcg / idcg).otherwise(F.lit(0.0))

    measures = {
        "rel": [
            Measure("r_10", r10),
            Measure("ap_10", ap10, requires=("_hits",)),
            Measure("ndcg_10", ndcg10, requires=("_ideal_rn",)),
        ]
    }
    return evaluate(_ranked_selection_from(base), res, measures, num_shards=5)


SQL_EVALUATE_MEASURES = f"""
WITH {_SS_CTE},
res_ranked AS (
    SELECT r.*,
           CASE WHEN docid % 3 = 0 THEN 1 ELSE 0 END AS rel,
           ROW_NUMBER() OVER (
               PARTITION BY query ORDER BY score DESC, docid, okey
           ) AS global_rank
    FROM results r
),
res_tot AS (
    SELECT *, CAST(SUM(rel) OVER (PARTITION BY query) AS BIGINT) AS num_rel
    FROM res_ranked
),
steps AS (SELECT CAST(s AS INTEGER) AS step FROM range(1, 6) t(s)),
joined AS (
    SELECT rr.query, rr.rel, rr.global_rank, rr.num_rel, st.step
    FROM res_tot rr
    JOIN ranked_sel k ON rr.query = k.query AND rr.shard = k.shard
    JOIN steps st ON k.rank < st.step
),
prefixed AS (
    SELECT query, step, rel, num_rel,
           ROW_NUMBER() OVER (
               PARTITION BY query, step ORDER BY global_rank
           ) AS rn,
           CAST(SUM(rel) OVER (
               PARTITION BY query, step ORDER BY global_rank
               ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS hits,
           ROW_NUMBER() OVER (
               PARTITION BY query, step ORDER BY rel DESC, global_rank
           ) AS ideal_rn
    FROM joined
)
SELECT query, step,
       CASE WHEN MAX(num_rel) > 0
            THEN CAST(SUM(CASE WHEN rn <= 10 THEN rel ELSE 0 END) AS BIGINT)
                 / MAX(num_rel)
            ELSE 0.0 END AS r_10,
       -- trec_eval denominator: TOTAL relevant (num_rel), never
       -- prefix-limited — mirrors the r8 measures.average_precision fix
       CASE WHEN MAX(num_rel) > 0
            THEN CAST(SUM(CASE WHEN rn <= 10 AND rel > 0
                     THEN CAST(ROUND(1000000.0 * hits / rn) AS BIGINT)
                     ELSE 0 END) AS BIGINT)
                 / MAX(num_rel)
            ELSE 0.0 END AS ap_10,
       CASE WHEN SUM(CASE WHEN ideal_rn <= 10 AND rel > 0
                     THEN CAST(ROUND(1000000.0 * rel / log2(ideal_rn + 1)) AS BIGINT)
                     ELSE 0 END) > 0
            THEN CAST(SUM(CASE WHEN rn <= 10 AND rel > 0
                     THEN CAST(ROUND(1000000.0 * rel / log2(rn + 1)) AS BIGINT)
                     ELSE 0 END) AS BIGINT)
                 / CAST(SUM(CASE WHEN ideal_rn <= 10 AND rel > 0
                     THEN CAST(ROUND(1000000.0 * rel / log2(ideal_rn + 1)) AS BIGINT)
                     ELSE 0 END) AS BIGINT)
            ELSE 0.0 END AS ndcg_10
FROM prefixed
GROUP BY query, step
"""


def q_trec_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 `to_trec` frame: per-query top-10 run rows."""
    li = _t(spark, sf_dir, "lineitem")
    res = _shard_results(li).withColumn("title", F.col("docid").cast("string"))
    return trec_frame(res, cutoff=10)


SQL_TREC_EXPORT = f"""
WITH {_SS_CTE},
trec AS (
    SELECT query, 'Q0' AS iter, CAST(docid AS VARCHAR) AS title,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query ORDER BY score DESC, CAST(docid AS VARCHAR)
           ) - 1 AS INTEGER) AS rank,
           score, 'null' AS run_id
    FROM results
)
SELECT * FROM trec WHERE rank < 10
"""


def q_cartesian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 `cartesian`: 3-way product with mixed types."""
    return cartesian(
        spark, [range(4), range(3), ["x", "y"]], names=["a", "b", "tag"]
    )


SQL_CARTESIAN = """
SELECT CAST(a.range AS BIGINT) AS a, CAST(b.range AS BIGINT) AS b, t.tag
FROM range(4) a, range(3) b, (SELECT unnest(['x', 'y']) AS tag) t
"""


def q_load_selection_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 `load_shard_selection` end-to-end: positional score CSV → indexed
    zip against the cartesian (query × shard) frame → per-query rank.

    The score file is generated deterministically (query-major order,
    score = ((query*31 + shard*17) % 100) / 10) so the oracle can recompute
    the same values from the formula — what's under test is the
    *positional alignment* of the real CSV loader path.
    """
    import os
    import tempfile

    queries_list, nshards = list(range(7)), 5
    scores = [
        ((q * 31 + s * 17) % 100) / 10 for q in queries_list for s in range(nshards)
    ]
    # a fresh dir per invocation, like the two sibling gates: a fixed
    # shared path lets a concurrent run (bench + sweep) truncate the file
    # mid-read and flake the positional zip (r7 review finding)
    path = os.path.join(
        tempfile.mkdtemp(prefix="sel_scores_"), "scores.csv"
    )
    with open(path, "w") as f:
        f.write("\n".join(str(x) for x in scores) + "\n")
    from dataproc_spark.io import load_shard_selection
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    # collect-then-rmtree: the returned frame's lineage references the
    # scratch CSV, which otherwise accumulates under /tmp every
    # sweep/bench invocation (r8 review — same r7 pattern as the
    # roundtrip gates)
    return _materialize_and_clean(
        load_shard_selection(spark, queries_list, nshards, path),
        os.path.dirname(path),
    )


SQL_LOAD_SELECTION_CSV = """
SELECT CAST(q.range AS BIGINT) AS query, CAST(s.range AS BIGINT) AS shard,
       ((q.range * 31 + s.range * 17) % 100) / 10.0 AS shard_score,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY q.range
           ORDER BY ((q.range * 31 + s.range * 17) % 100) / 10.0 DESC, s.range
       ) - 1 AS INTEGER) AS rank
FROM range(7) q, range(5) s
"""


def q_load_bucket_selection_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 `load_bucket_selection` end-to-end: positional score CSV → indexed
    zip against the 3-way cartesian (query × shard × bucket) → per-query rank.

    Mirrors `load_selection_csv` one level deeper: the formula-generated
    score file is written in cartesian (query-major, shard, bucket-minor)
    order, so what's under test is the 3-way positional index arithmetic
    (``core.cartesian`` ``_idx`` = ((q_pos × nshards) + shard) × nbuckets +
    bucket) — exactly where a positional-zip bug would hide.
    """
    import os
    import tempfile

    queries_list, nshards, nbuckets = list(range(7)), 3, 2
    scores = [
        ((q * 31 + s * 17 + b * 7) % 100) / 10
        for q in queries_list
        for s in range(nshards)
        for b in range(nbuckets)
    ]
    # per-run dir: a fixed shared path lets two concurrent runs overwrite
    # each other mid-read (same hazard q_merge_schema_scan avoids)
    path = os.path.join(tempfile.mkdtemp(prefix="bsel_"), "scores.csv")
    with open(path, "w") as f:
        f.write("\n".join(str(x) for x in scores) + "\n")
    from dataproc_spark.io import load_bucket_selection
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    return _materialize_and_clean(
        load_bucket_selection(spark, queries_list, nshards, nbuckets, path),
        os.path.dirname(path),
    )


SQL_LOAD_BUCKET_SELECTION_CSV = """
SELECT CAST(q.range AS BIGINT) AS query, CAST(s.range AS BIGINT) AS shard,
       CAST(b.range AS BIGINT) AS bucket,
       ((q.range * 31 + s.range * 17 + b.range * 7) % 100) / 10.0 AS shard_score,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY q.range
           ORDER BY ((q.range * 31 + s.range * 17 + b.range * 7) % 100) / 10.0
                    DESC, s.range, b.range
       ) - 1 AS INTEGER) AS rank
FROM range(7) q, range(3) s, range(2) b
"""


def q_shard_results_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 `load_shard_results` + `write_shard_results` end-to-end: write the
    reference's on-disk layout (``{basename}#{shard}.results-{n}`` parquet
    files, column contract ``selectivesearch.py:103-112``), read it back
    through the multi-path scan, and return the loaded frame.

    The oracle recomputes the same table straight from lineitem — the
    roundtrip must be the identity, so any loss/misnaming/misordering in
    the file contract shows up as a hash mismatch.
    """
    import os
    import tempfile

    from dataproc_spark.io import load_shard_results, write_shard_results

    li = _t(spark, sf_dir, "lineitem")
    ldocid = (F.col("l_partkey") * 10 + F.col("l_linenumber")).cast("long")
    shard = (F.col("l_suppkey") % 5).cast("int")
    w = Window.partitionBy("query", "shard").orderBy(
        F.col("score").desc(), F.col("ldocid").asc(), F.col("_okey").asc()
    )
    contract = (
        li.select(
            (F.col("l_orderkey") % 7).cast("int").alias("query"),
            ldocid.alias("ldocid"),
            (ldocid * 5 + shard).alias("gdocid"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("double")
            .alias("score"),
            shard.alias("shard"),
            (F.col("l_linenumber") % 2).cast("int").alias("bucket"),
            F.col("l_orderkey").alias("_okey"),
        )
        .withColumn("rank", (F.row_number().over(w) - 1).cast("int"))
        .select("query", "rank", "ldocid", "gdocid", "score", "shard", "bucket")
    )
    # per-run dir: a fixed shared path lets two concurrent runs overwrite
    # each other mid-read (same hazard q_merge_schema_scan avoids)
    basename = os.path.join(tempfile.mkdtemp(prefix="dataproc_rt_"), "run")
    write_shard_results(contract, basename, nbuckets=2)
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    # collect-then-rmtree (r8 review): every invocation otherwise left a
    # full parquet copy of the contract frame under /tmp — the exact
    # disk-fill the r7 pattern exists to prevent
    return _materialize_and_clean(
        load_shard_results(spark, basename, nshards=5, nbuckets=2),
        os.path.dirname(basename),
    )


SQL_SHARD_RESULTS_ROUNDTRIP = """
WITH contract AS (
    SELECT CAST(l_orderkey % 7 AS INTEGER) AS query,
           CAST(l_partkey * 10 + l_linenumber AS BIGINT) AS ldocid,
           CAST((l_partkey * 10 + l_linenumber) * 5 + (l_suppkey % 5) AS BIGINT)
               AS gdocid,
           CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS DOUBLE)
               AS score,
           CAST(l_suppkey % 5 AS INTEGER) AS shard,
           CAST(l_linenumber % 2 AS INTEGER) AS bucket,
           l_orderkey AS okey
    FROM lineitem
)
SELECT query,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY query, shard ORDER BY score DESC, ldocid, okey
       ) - 1 AS INTEGER) AS rank,
       ldocid, gdocid, score, shard, bucket
FROM contract
"""


def q_resolve_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 greedy bucket resolution, value-checked: the sequential stateful
    walk is emulated in the oracle by a DuckDB *recursive CTE* that carries
    (step index, budget spent, per-shard counts) as recursion state — the
    greedy semantics (`selectivesearch.py:160-181`) are deterministic given
    the ranked selection, so the output is exactly comparable even though
    the Spark implementation is an Arrow grouped-map.

    Bucket-granular selection ranked by aggregate score; budget 4 buckets
    per query.
    """
    li = _t(spark, sf_dir, "lineitem")
    bsel = (
        _shard_results(li)
        .groupBy("query", "shard", "bucket")
        .agg(F.sum("score").alias("shard_score"))
    )
    bsel = rank_selection(bsel, "shard_score", ("query",), ("shard", "bucket"))
    return resolve_bucket_selection(bsel, threshold=4, num_shards=5)


#: shared oracle CTE suffix: the greedy walk as a recursive CTE. State per
#: query: i (next selection rank to inspect), spent (buckets taken), counts
#: (per-shard selected-bucket prefix lengths). Recursion stops when the
#: budget is hit (WHERE spent < 4) or ranks are exhausted (join misses);
#: the final state row per query is exploded to (shard, bucket) rows.
_GREEDY_WALK_SQL = """
bsel AS (
    SELECT query, shard, bucket, CAST(SUM(score) AS BIGINT) AS shard_score
    FROM results GROUP BY query, shard, bucket
),
branked AS (
    SELECT query, shard, bucket,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query ORDER BY shard_score DESC, shard, bucket
           ) - 1 AS INTEGER) AS rank
    FROM bsel
),
walk AS (
  WITH RECURSIVE w(query, i, spent, counts) AS (
    SELECT query, 0, 0, [0, 0, 0, 0, 0] FROM (SELECT DISTINCT query FROM branked)
    UNION ALL
    SELECT query, i + 1,
           spent + CASE WHEN take THEN cost ELSE 0 END,
           CASE WHEN take
                THEN counts[1:shard] || [counts[shard + 1] + cost]
                     || counts[shard + 2:]
                ELSE counts END
    FROM (
      SELECT w.query, w.i, w.spent, w.counts, b.shard,
             b.bucket + 1 - w.counts[b.shard + 1] AS cost,
             (b.bucket + 1 - w.counts[b.shard + 1] >= 1
              AND w.spent + b.bucket + 1 - w.counts[b.shard + 1] <= 4) AS take
      FROM w JOIN branked b ON b.query = w.query AND b.rank = w.i
      WHERE w.spent < 4
    )
  )
  SELECT query, counts FROM w
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query ORDER BY i DESC) = 1
),
resolved AS (
  SELECT query, shard, CAST(UNNEST(range(counts[shard + 1])) AS INTEGER) AS bucket
  FROM (SELECT query, CAST(UNNEST(range(5)) AS BIGINT) AS shard, counts FROM walk)
)
"""


SQL_RESOLVE_BUCKETS = f"""
WITH {_SS_CTE},
{_GREEDY_WALK_SQL}
SELECT query, shard, bucket FROM resolved
"""


def q_select_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 `select_buckets`: semi-join against the greedy resolver's set
    (value-checked through the same recursive-CTE oracle as F12)."""
    res = _shared_shard_results(_t(spark, sf_dir, "lineitem"))
    bsel = res.groupBy("query", "shard", "bucket").agg(
        F.sum("score").alias("shard_score")
    )
    bsel = rank_selection(bsel, "shard_score", ("query",), ("shard", "bucket"))
    return select_buckets(bsel, res, t=4, num_shards=5)


SQL_SELECT_BUCKETS = f"""
WITH {_SS_CTE},
{_GREEDY_WALK_SQL}
SELECT r.query, r.shard, r.bucket, r.docid, r.okey, r.score
FROM results r
JOIN resolved v
  ON r.query = v.query AND r.shard = v.shard AND r.bucket = v.bucket
"""


# ---------------------------------------------------------------------------
# relational breadth (TPC-H-shaped)
# ---------------------------------------------------------------------------
