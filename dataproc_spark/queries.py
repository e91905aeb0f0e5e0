"""Driver-contract query registry: every implemented operator as a
(spark_callable, duckdb_oracle_sql) pair over the testdata tables.

The selective-search shapes are instantiated from the TPC-H-ish star
schema (FIXTURES.md §B mapping): ``query`` = l_orderkey % 7, ``shard`` =
l_suppkey % 5, ``bucket`` = l_linenumber % 2, ``score`` = revenue in
integer cents. **All aggregate arithmetic is exact-integer** (money in
cents via round(x*100), integer `div`, row_number with total tie-break
orders) so Spark and DuckDB produce bit-identical values regardless of
floating-point summation order — the one systematic hazard of
cross-engine value-hash comparison.

Oracle SQL strings are ANSI-ish DuckDB SQL against the pre-registered
views (region nation customer supplier part orders lineitem events
documents embeddings). Rows-only entries (no SQL) are the genuinely
non-relational ops: the greedy bucket resolver (sequential stateful walk)
and the LSH pipelines (hash-function-dependent candidates).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from dataproc_spark.core import cartesian, maybe_broadcast
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
from dataproc_spark import temporal
from dataproc_spark.extensions import (
    dedup,
    sampling,
    simsearch,
    streaming,
    textstats,
)

# ---------------------------------------------------------------------------
# table access
# ---------------------------------------------------------------------------

#: every driver-generated testdata table
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_tables(
    spark: SparkSession, sf_dir: str, suffix: str = "_v"
) -> None:
    """Register every testdata table as a temp view (``<name><suffix>``)
    so the full corpus is queryable through the ``spark.sql`` front-end.
    The events view carries the engine's normalization — ``ts`` is int64
    epoch nanoseconds regardless of the parquet physical type — so SQL
    users get the same event-time contract as the DataFrame API."""
    for name in TABLES:
        _t(spark, sf_dir, name).createOrReplaceTempView(f"{name}{suffix}")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts arrives as long nanos (parquet TIMESTAMP(NANOS) under
        # nanosAsLong) or as a timestamp type (timestamp[us] testdata);
        # normalize_event_ts projects either to the int64-nanos contract.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from dataproc_spark.core import normalize_event_ts

        return normalize_event_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# selective-search instantiation on the star schema
# ---------------------------------------------------------------------------

def _shard_results(li: DataFrame) -> DataFrame:
    return li.select(
        (F.col("l_orderkey") % 7).cast("long").alias("query"),
        (F.col("l_suppkey") % 5).cast("long").alias("shard"),
        (F.col("l_linenumber") % 2).cast("int").alias("bucket"),
        (F.col("l_partkey") * 10 + F.col("l_linenumber")).cast("long").alias("docid"),
        F.col("l_orderkey").cast("long").alias("okey"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("score"),
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
    key = li.sparkSession.sparkContext.applicationId + "\n" + (
        li._jdf.queryExecution().logical().toString()
    )
    cached = _SHARD_RESULTS_CACHE.get(key)
    if cached is None:
        # note: spreading the scan across cores before the persist
        # (spread_narrow) was measured at sf0.1 and REJECTED — the
        # added 600 k-row shuffle costs more than the parallel cache
        # materialization saves (bench select_top_t 3.7 s → 4.1 s)
        cached = _SHARD_RESULTS_CACHE[key] = _shard_results(li).persist()
    return cached


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
    w = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("docid").asc(), F.col("okey").asc()
    )
    res = res.withColumn("global_rank", F.row_number().over(w))
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
    w = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("docid").asc(), F.col("okey").asc()
    )
    res = res.withColumn("global_rank", F.row_number().over(w))
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
    w = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("docid").asc(), F.col("okey").asc()
    )
    res = res.withColumn("global_rank", F.row_number().over(w))
    res = res.withColumn(
        "num_rel", F.sum("rel").over(Window.partitionBy("query"))
    )

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
        den = prefix_hits(rel, rn)
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
       CASE WHEN SUM(CASE WHEN rn <= 10 THEN rel ELSE 0 END) > 0
            THEN CAST(SUM(CASE WHEN rn <= 10 AND rel > 0
                     THEN CAST(ROUND(1000000.0 * hits / rn) AS BIGINT)
                     ELSE 0 END) AS BIGINT)
                 / CAST(SUM(CASE WHEN rn <= 10 THEN rel ELSE 0 END) AS BIGINT)
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
    path = os.path.join(tempfile.gettempdir(), "dataproc_sel_scores.csv")
    with open(path, "w") as f:
        f.write("\n".join(str(x) for x in scores) + "\n")
    from dataproc_spark.io import load_shard_selection

    return load_shard_selection(spark, queries_list, nshards, path)


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

    return load_bucket_selection(spark, queries_list, nshards, nbuckets, path)


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
    return load_shard_results(spark, basename, nshards=5, nbuckets=2)


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

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: scan-heavy group-by with exact-cents aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-31").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_c"
            ),
            F.sum(F.round(disc * 100).cast("long")).alias("sum_disc_c"),
            F.sum(F.round(disc * (1 + F.col("l_tax")) * 100).cast("long")).alias(
                "sum_charge_c"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: 3-way join + top-10 by exact revenue."""
    cu = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    od = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    j = li.join(od, li.l_orderkey == od.o_orderkey).join(
        cu, od.o_custkey == cu.c_custkey
    )
    g = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "long"
            )
        ).alias("revenue_c")
    )
    w = Window.orderBy(F.col("revenue_c").desc(), F.col("l_orderkey").asc())
    return (
        g.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select(
            F.col("l_orderkey").alias("okey"),
            "revenue_c",
            F.col("o_orderdate").cast("date").cast("string").alias("odate"),
            "o_orderpriority",
            "rnk",
        )
    )


SQL_TPCH_Q3 = """
WITH g AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT CAST(l_orderkey AS BIGINT) AS okey, revenue_c,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate, o_orderpriority,
       CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY revenue_c DESC, l_orderkey) AS rnk
    FROM g
)
WHERE rnk <= 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way join, small dims broadcast."""
    re = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    na = _t(spark, sf_dir, "nation")
    cu = _t(spark, sf_dir, "customer")
    su = _t(spark, sf_dir, "supplier")
    od = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "long"
            )
        ).alias("revenue_c")
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP over (returnflag, linestatus) with subtotal
    and grand-total rows, tagged by grouping level."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_c"
            ),
            F.grouping_id().alias("gid"),
        )
    )


SQL_ROLLUP_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): each event lands in two
    windows — the streaming-window shape expressed in batch."""
    ev = _t(spark, sf_dir, "events")
    half_hours = F.array(
        F.expr("ts div 1800000000000"), F.expr("ts div 1800000000000 - 1")
    )
    return (
        ev.select(F.explode(half_hours).alias("win_id"), "event_type", "value")
        .groupBy("win_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
        )
    )


SQL_EVENTS_SLIDING = """
SELECT win_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM (
    SELECT unnest([epoch_ns(ts) // 1800000000000,
                   epoch_ns(ts) // 1800000000000 - 1]) AS win_id,
           event_type, value
    FROM events
)
GROUP BY win_id, event_type
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-3 customers by account balance within each nation."""
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    j = cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey).select(
        "n_name",
        F.col("c_custkey").alias("custkey"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_c"),
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("acctbal_c").desc(), F.col("custkey").asc()
    )
    return (
        j.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= 3)
    )


SQL_TOP_CUSTOMERS = """
SELECT n_name, custkey, acctbal_c, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT n_name, CAST(c_custkey AS BIGINT) AS custkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_c,
           ROW_NUMBER() OVER (
               PARTITION BY n_name
               ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT) DESC, c_custkey
           ) AS rnk
    FROM customer JOIN nation ON c_nationkey = n_nationkey
)
WHERE rnk <= 3
"""


def q_exists_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / semi-join shape: orders having at least one heavy line
    item (quantity > 45), counted per priority."""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        od.join(li.select("l_orderkey"), od.o_orderkey == li.l_orderkey, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


SQL_EXISTS_ORDERS = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


def q_parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: parts priced above their brand's average
    (decorrelated as a window aggregate — the Spark-native plan)."""
    pa = _t(spark, sf_dir, "part")
    price_c = F.round(F.col("p_retailprice") * 100).cast("long")
    w = Window.partitionBy("p_brand")
    return (
        pa.withColumn("price_c", price_c)
        .withColumn("brand_sum_c", F.sum("price_c").over(w))
        .withColumn("brand_n", F.count(F.lit(1)).over(w))
        # integer cross-multiplication: price > sum/n <=> price*n > sum
        .where(F.col("price_c") * F.col("brand_n") > F.col("brand_sum_c"))
        .select(
            F.col("p_partkey").alias("partkey"), "p_brand", "price_c"
        )
    )


SQL_PARTS_ABOVE_BRAND_AVG = """
WITH priced AS (
    SELECT CAST(p_partkey AS BIGINT) AS partkey, p_brand,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c
    FROM part
),
stats AS (
    SELECT partkey, p_brand, price_c,
           SUM(price_c) OVER (PARTITION BY p_brand) AS brand_sum_c,
           COUNT(*) OVER (PARTITION BY p_brand) AS brand_n
    FROM priced
)
SELECT partkey, p_brand, price_c
FROM stats WHERE price_c * brand_n > brand_sum_c
"""


def q_nations_above_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING + scalar-subquery shape: nations whose supplier revenue
    exceeds the all-nation average (exact integer comparison)."""
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    rev_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    per_nation = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev_c).alias("revenue_c"))
    )
    totals = per_nation.agg(
        F.sum("revenue_c").alias("_tot"), F.count(F.lit(1)).alias("_n")
    )
    return (
        per_nation.crossJoin(F.broadcast(totals))
        .where(F.col("revenue_c") * F.col("_n") > F.col("_tot"))
        .select("n_name", "revenue_c")
    )


SQL_NATIONS_ABOVE_AVG_REVENUE = """
WITH per_nation AS (
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
)
SELECT n_name, revenue_c
FROM per_nation
WHERE revenue_c * (SELECT COUNT(*) FROM per_nation)
      > (SELECT SUM(revenue_c) FROM per_nation)
"""


def q_returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-pivot aggregation: per linestatus, line counts and exact cents
    revenue split by return flag."""
    li = _t(spark, sf_dir, "lineitem")
    rev_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    def flag(f):
        return F.when(F.col("l_returnflag") == f, 1).otherwise(0)
    return li.groupBy("l_linestatus").agg(
        F.sum(flag("R")).alias("n_returned"),
        F.sum(flag("A")).alias("n_accepted"),
        F.sum(flag("N")).alias("n_none"),
        F.sum(F.when(F.col("l_returnflag") == "R", rev_c).otherwise(0)).alias(
            "returned_rev_c"
        ),
    )


SQL_RETURNFLAG_PIVOT = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
       CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_none,
       CAST(SUM(CASE WHEN l_returnflag = 'R'
                     THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS returned_rev_c
FROM lineitem GROUP BY l_linestatus
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers that never placed an order."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    return cu.join(
        od, cu.c_custkey == od.o_custkey, "left_anti"
    ).select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_mktsegment"
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT CAST(c_custkey AS BIGINT) AS custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_left_join_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with null handling: every customer with their order
    count and total (0-filled for customers without orders)."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    per_cust = od.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_c"),
    )
    return (
        cu.join(per_cust, cu.c_custkey == per_cust.o_custkey, "left")
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_mktsegment",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("total_c", F.lit(0)).alias("total_c"),
        )
    )


SQL_LEFT_JOIN_FILL = """
SELECT CAST(c_custkey AS BIGINT) AS custkey, c_mktsegment,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(total_c, 0) AS BIGINT) AS total_c
FROM customer
LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_c
    FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
"""


def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction on the tz-free timestamp: orders and revenue
    per (year, month)."""
    od = _t(spark, sf_dir, "orders")
    return (
        od.groupBy(
            F.year("o_orderdate").alias("yy"),
            F.month("o_orderdate").alias("mm"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_c"
            ),
        )
    )


SQL_ORDERS_BY_MONTH = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yy,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mm,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
FROM orders GROUP BY 1, 2
"""


def q_union_all_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit UNION ALL of heterogeneous sources normalized to one
    schema: customer and supplier account balances as one ledger."""
    cu = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_c"),
    )
    su = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.round(F.col("s_acctbal") * 100).cast("long").alias("acctbal_c"),
    )
    return cu.unionByName(su).groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("acctbal_c").alias("sum_acctbal_c"),
        F.min("acctbal_c").alias("min_acctbal_c"),
        F.max("acctbal_c").alias("max_acctbal_c"),
    )


SQL_UNION_ALL_SOURCES = """
WITH ledger AS (
    SELECT 'customer' AS kind,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_c
    FROM customer
    UNION ALL
    SELECT 'supplier' AS kind,
           CAST(ROUND(s_acctbal * 100) AS BIGINT) AS acctbal_c
    FROM supplier
)
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(acctbal_c) AS BIGINT) AS sum_acctbal_c,
       CAST(MIN(acctbal_c) AS BIGINT) AS min_acctbal_c,
       CAST(MAX(acctbal_c) AS BIGINT) AS max_acctbal_c
FROM ledger GROUP BY kind
"""


def q_priority_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: customers with both URGENT and LOW priority orders."""
    od = _t(spark, sf_dir, "orders")
    urgent = od.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = od.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(low)


SQL_PRIORITY_INTERSECT = """
SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""


def q_priority_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: customers with URGENT orders but no LOW orders."""
    od = _t(spark, sf_dir, "orders")
    urgent = od.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = od.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    # subtract = SQL EXCEPT (set semantics): any customer appearing in
    # `low` is removed entirely, unlike exceptAll's multiset difference
    return urgent.subtract(low)


SQL_PRIORITY_EXCEPT = """
SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""


# ---------------------------------------------------------------------------
# events (time-series / streaming shapes)
# ---------------------------------------------------------------------------

def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation (batch form of the streaming op)."""
    return streaming.hourly_agg(_t(spark, sf_dir, "events"))


SQL_EVENTS_HOURLY = """
-- floor-division hour bucket (DuckDB // truncates toward zero, so subtract
-- a positive remainder first) — matches hourly_agg's pmod-based floor
SELECT (epoch_ns(ts) - ((epoch_ns(ts) % 3600000000000) + 3600000000000)
        % 3600000000000) // 3600000000000 AS hour_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events
GROUP BY 1, 2
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) + per-user session stats."""
    return streaming.session_stats(_t(spark, sf_dir, "events"), gap_minutes=30)


SQL_EVENTS_SESSIONIZE = """
WITH e AS (
    SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events
),
flagged AS (
    SELECT user_id, event_id, tns,
           CASE WHEN lag(tns) OVER w IS NULL THEN 1
                WHEN tns - lag(tns) OVER w > 1800000000000 THEN 1
                ELSE 0 END AS new_sess
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)
),
sess AS (
    SELECT user_id,
           SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY tns, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS session_id
    FROM flagged
),
per AS (
    SELECT user_id, session_id, COUNT(*) AS n
    FROM sess GROUP BY user_id, session_id
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(MAX(n) AS BIGINT) AS max_session_events,
       CAST(SUM(n) AS BIGINT) AS n_events_total
FROM per GROUP BY user_id
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction from the JSON-ish props column."""
    ev = _t(spark, sf_dir, "events")
    k = F.nullif(
        F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1), F.lit("")
    ).cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


SQL_EVENTS_JSON = r"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k, CAST(MAX(k) AS BIGINT) AS max_k
FROM (
    SELECT event_type,
           CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS BIGINT) AS k
    FROM events
)
GROUP BY event_type
"""


def q_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins compaction (CDC/upsert semantics): one row per user —
    the most recent event, ties broken by event_id. The standard merge
    step for change streams; a window with a total tie-break order keeps
    it deterministic on an unordered engine, and Catalyst runs the rank
    filter as partial top-1 per partition (no full sort per user)."""
    ev = _t(spark, sf_dir, "events")
    # Rank on µs-floored time, not raw ns: DuckDB reads TIMESTAMP(NANOS)
    # parquet at µs precision, so the oracle's ORDER BY compares truncated
    # values — two events inside the same microsecond must fall through to
    # the event_id tie-break identically in both engines.
    ts_us = F.expr("(ts - pmod(ts, 1000)) div 1000")
    w = Window.partitionBy("user_id").orderBy(
        ts_us.desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "user_id",
            "event_id",
            ts_us.alias("ts_us"),
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("value_c"),
        )
    )


SQL_LATEST_PER_USER = """
WITH r AS (
    SELECT user_id, event_id, epoch_ns(ts) AS tns, event_type, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY epoch_ns(ts) DESC, event_id DESC
           ) AS rn
    FROM events
)
SELECT user_id, event_id, CAST(tns // 1000 AS BIGINT) AS ts_us, event_type,
       CAST(round(value * 100) AS BIGINT) AS value_c
FROM r WHERE rn = 1
"""


def q_top_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-N: the 3 highest-value events per (event_type, day).
    Day buckets via FLOOR division on the raw int64 nanos (pmod before
    div — plain `div` truncates toward zero, which would merge day -1
    into day 0 for pre-1970 events; DuckDB's integer `//` ALSO truncates,
    so the oracle applies the same positive-remainder compensation)."""
    ev = _t(spark, sf_dir, "events")
    day_ns = 24 * 3600 * 1_000_000_000
    day = F.expr(f"(ts - pmod(ts, {day_ns})) div {day_ns}").alias("day_id")
    w = Window.partitionBy("event_type", "day_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.select("event_type", day, "event_id", "value")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "event_type",
            "day_id",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("value_c"),
            "rnk",
        )
    )


SQL_TOP_EVENTS_DAILY = """
-- floor-division day bucket: DuckDB integer // truncates toward zero
-- (-7 // 2 = -3), so subtract a positive remainder first to match the
-- implementation's pmod-floor day id for pre-1970 events too
WITH r AS (
    SELECT event_type,
           (epoch_ns(ts) - ((epoch_ns(ts) % 86400000000000) + 86400000000000)
            % 86400000000000) // 86400000000000 AS day_id,
           event_id, value,
           ROW_NUMBER() OVER (
               PARTITION BY event_type,
                   (epoch_ns(ts) - ((epoch_ns(ts) % 86400000000000)
                    + 86400000000000) % 86400000000000) // 86400000000000
               ORDER BY value DESC, event_id ASC
           ) AS rnk
    FROM events
)
SELECT event_type, CAST(day_id AS BIGINT) AS day_id, event_id,
       CAST(round(value * 100) AS BIGINT) AS value_c, CAST(rnk AS INTEGER) AS rnk
FROM r WHERE rnk <= 3
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union + running ``last(ignorenulls)`` — one shuffle, no
    range θ-join): each purchase gets the user's most recent click at or
    before it. The oracle is DuckDB's *native* ASOF LEFT JOIN, so the
    operator's semantics are pinned to an independent implementation.

    The click side is pre-aggregated to one row per (user, ts) — max
    event_id wins — making the tie case deterministic in both engines.
    """
    ev = _t(spark, sf_dir, "events")  # ts read as long nanoseconds
    # Join on µs-floored time, not raw ns: DuckDB reads TIMESTAMP(NANOS)
    # parquet at µs precision, so the oracle's `p.tns >= c.tns` compares
    # truncated values — a click 500 ns after a purchase within the same
    # microsecond must match (or not) identically in both engines. Floor
    # via pmod-before-div (exact integer math; float division would lose
    # ns precision at 2^60, and plain `div` truncates pre-1970 epochs).
    ts_us = F.expr("(ts - pmod(ts, 1000)) div 1000").alias("ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", ts_us
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", ts_us)
        .agg(
            F.max("event_id").alias("click_id"),
            F.max_by("value", "event_id").alias("click_value"),
        )
    )
    joined = temporal.asof_join(
        purchases, clicks, on="ts", by="user_id",
        right_cols=["click_id", "click_value"], suffix="_asof",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").alias("ts_us"),
        F.col("ts_asof").alias("click_ts_us"),
        F.col("click_id_asof").alias("click_id"),
        F.round(F.col("click_value_asof") * 100).cast("long")
        .alias("click_value_c"),
    )


SQL_ASOF_JOIN = """
WITH ev AS (
    SELECT event_id, user_id, epoch_ns(ts) AS tns, event_type, value
    FROM events
),
purchases AS (
    SELECT event_id, user_id, tns FROM ev WHERE event_type = 'purchase'
),
clicks AS (
    SELECT user_id, tns, MAX(event_id) AS click_id,
           arg_max(value, event_id) AS click_value
    FROM ev WHERE event_type = 'click' GROUP BY user_id, tns
)
SELECT p.event_id, p.user_id, CAST(p.tns // 1000 AS BIGINT) AS ts_us,
       CAST(c.tns // 1000 AS BIGINT) AS click_ts_us,
       c.click_id,
       CAST(round(c.click_value * 100) AS BIGINT) AS click_value_c
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.tns >= c.tns
"""


def q_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming variant of events_hourly (availableNow drain);
    same oracle — batch/stream parity is the assertion."""
    return streaming.stream_hourly_counts(spark, f"{sf_dir}/events.parquet")


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis over the events stream: per user, the first
    'view', the first 'click' strictly after that view, and the first
    'purchase' strictly after that click — the product-analytics staple
    (conversion funnels) and a order-dependent multi-stage aggregation
    that a naive groupBy can't express.

    Plan: three conditional min-aggregates, every one keyed on user_id
    (filters push to the scan; the joins are key-local and the funnel
    frames shrink at each stage, so later joins broadcast). No windows
    over raw events, no per-user sorting (``analytics.funnel``)."""
    from dataproc_spark.extensions.analytics import funnel

    ev = _t(spark, sf_dir, "events")
    return funnel(ev, steps=("view", "click", "purchase")).select(
        "user_id", "t_view", "t_click", "t_purchase", "steps"
    )


SQL_FUNNEL_STEPS = """
WITH ev AS (
    SELECT user_id, epoch_ns(ts) AS tns, event_type FROM events
),
tv AS (
    SELECT user_id, MIN(tns) AS t_view
    FROM ev WHERE event_type = 'view' GROUP BY user_id
),
tc AS (
    SELECT e.user_id, MIN(e.tns) AS t_click
    FROM ev e JOIN tv USING (user_id)
    WHERE e.event_type = 'click' AND e.tns > tv.t_view
    GROUP BY e.user_id
),
tp AS (
    SELECT e.user_id, MIN(e.tns) AS t_purchase
    FROM ev e JOIN tc USING (user_id)
    WHERE e.event_type = 'purchase' AND e.tns > tc.t_click
    GROUP BY e.user_id
)
SELECT tv.user_id, tv.t_view, tc.t_click, tp.t_purchase,
       CAST(1 + (tc.t_click IS NOT NULL)::INTEGER
              + (tp.t_purchase IS NOT NULL)::INTEGER AS INTEGER) AS steps
FROM tv
LEFT JOIN tc USING (user_id)
LEFT JOIN tp USING (user_id)
"""


def q_user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user chronological event sequence: the ordered-collect
    primitive that turns an event log into training sequences for
    behavioral models (one row per user: ordered event-type trajectory,
    its length, and the span in seconds).

    Deterministic ordered collect on an unordered engine: collect
    structs keyed by the total order (ts, event_id), ``array_sort`` them
    JVM-side, then project the payload — one hash aggregate keyed on
    user_id, no window, with per-user payloads bounded by the user's own
    event count."""
    ev = _t(spark, sf_dir, "events")
    collected = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), F.col("event_type")
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("e")).alias("seq"))
    )
    return collected.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        F.array_join(
            F.transform("seq", lambda e: e.getField("event_type")), ">"
        ).alias("trajectory"),
        F.expr(
            "(seq[size(seq) - 1].ts - seq[0].ts) div 1000000000"
        )
        .cast("long")
        .alias("span_s"),
    )


SQL_USER_EVENT_SEQUENCES = """
WITH ev AS (
    SELECT user_id, epoch_ns(ts) AS tns, event_id, event_type FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       string_agg(event_type, '>' ORDER BY tns, event_id) AS trajectory,
       CAST((MAX(tns) - MIN(tns)) // 1000000000 AS BIGINT) AS span_s
FROM ev
GROUP BY user_id
"""


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: turn each user's change events into
    validity intervals [valid_from, valid_to) with the then-current value
    — the history-table counterpart of ``latest_per_user`` (type 1).
    ``valid_to`` is null on the open (current) interval.

    Plan: ONE lead window partitioned by user_id with a total order
    (ts, event_id) — per-user sort only, same shape as sessionization;
    no self-join, no global sort (``analytics.scd2_history``)."""
    from dataproc_spark.extensions.analytics import scd2_history

    ev = _t(spark, sf_dir, "events").withColumn(
        "value_c", F.round(F.col("value") * 100).cast("long")
    )
    return scd2_history(ev).select(
        "user_id", "valid_from", "event_id", "value_c", "valid_to",
        "is_current",
    )


SQL_SCD2_INTERVALS = """
WITH ev AS (
    SELECT user_id, epoch_ns(ts) AS valid_from, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS value_c
    FROM events
)
SELECT user_id, valid_from, event_id, value_c,
       LEAD(valid_from) OVER (
           PARTITION BY user_id ORDER BY valid_from, event_id
       ) AS valid_to,
       CAST(LEAD(valid_from) OVER (
           PARTITION BY user_id ORDER BY valid_from, event_id
       ) IS NULL AS INTEGER) AS is_current
FROM ev
"""


def q_events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward-fill (the pandas
    ``resample('6h').last().ffill()`` staple): per user, the last event
    value in each 6-hour bucket, with empty buckets between a user's
    first and last event carrying the previous bucket's value forward.

    Plan: per-(user, bucket) last value via one ``max_by`` aggregate
    (deterministic (ts, event_id) order, no window over raw events);
    the bucket spine is an ``explode(sequence(min, max))`` per user —
    rows bounded by time span / bucket width, not event count; the
    forward fill is ``last(ignorenulls)`` over the spine, partitioned
    per user. Exact integer values (cents) throughout
    (``analytics.resample_ffill``)."""
    from dataproc_spark.extensions.analytics import resample_ffill

    ev = _t(spark, sf_dir, "events").withColumn(
        "value_c", F.round(F.col("value") * 100).cast("long")
    )
    return resample_ffill(ev, bucket_ns=6 * 3_600_000_000_000)


SQL_EVENTS_RESAMPLE = """
WITH ev AS (
    SELECT user_id,
           (epoch_ns(ts) - ((epoch_ns(ts) % 21600000000000) + 21600000000000)
            % 21600000000000) // 21600000000000 AS bucket_id,
           epoch_ns(ts) AS tns, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS vc
    FROM events
),
per_bucket AS (
    SELECT user_id, bucket_id, vc AS value_c
    FROM (
        SELECT user_id, bucket_id, vc,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, bucket_id
                   ORDER BY tns DESC, event_id DESC
               ) AS rn
        FROM ev
    ) WHERE rn = 1
),
spine AS (
    SELECT user_id, unnest(range(MIN(bucket_id), MAX(bucket_id) + 1))
               AS bucket_id
    FROM per_bucket GROUP BY user_id
)
SELECT s.user_id, s.bucket_id,
       last_value(p.value_c IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.bucket_id
           ROWS UNBOUNDED PRECEDING
       ) AS value_c,
       CAST(p.value_c IS NULL AS INTEGER) AS filled
FROM spine s
LEFT JOIN per_bucket p USING (user_id, bucket_id)
"""


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type counts through Spark's native
    ``groupBy().pivot()`` API (the CASE-pivot gate ``returnflag_pivot``
    covers the manual formulation; this one exercises the pivot
    operator itself, with the value list pinned so no extra
    distinct-values job runs — the form that scales)."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in types
        ],
    )


SQL_EVENTS_PIVOT = """
SELECT user_id,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events
GROUP BY user_id
"""


def q_sql_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_hourly through the ``spark.sql`` front-end over
    :func:`register_tables` views — proving the int64-nanos event-time
    contract (and its physical-type normalization) carries into the SQL
    surface, not just the DataFrame API. Same oracle as the DataFrame
    form."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT (ts - pmod(ts, 3600000000000)) div 3600000000000 AS hour_id,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_c
        FROM events_v
        GROUP BY 1, 2
    """)


def q_sql_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time session windows through the ``spark.sql`` front-end:
    ``GROUP BY session_window(event_time, '30 minutes')`` over the
    registered events view — the built-in merging-session operator
    exposed on the SQL surface (the DataFrame form is equivalence-tested
    against lag/cumsum sessionization in the streaming tests).

    The oracle replicates ``session_window`` semantics exactly: events
    merge while the gap is STRICTLY under 30 minutes measured in
    MICROSECONDS (Spark's timestamp resolution — the nanos are floored
    first, same pmod-before-div arithmetic as ``with_event_time``), and
    ``session_window.end`` is last event + gap."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT user_id,
               CAST(unix_micros(session_window.start) AS BIGINT)
                   AS session_start_us,
               CAST(unix_micros(session_window.end) AS BIGINT)
                   AS session_end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM (
            SELECT user_id,
                   timestamp_micros((ts - pmod(ts, 1000)) div 1000)
                       AS event_time
            FROM events_v
        )
        GROUP BY session_window(event_time, '30 minutes'), user_id
    """)


SQL_SESSION_WINDOWS = """
WITH e AS (
    SELECT user_id,
           (epoch_ns(ts) - ((epoch_ns(ts) % 1000) + 1000) % 1000) // 1000
               AS tus
    FROM events
),
flagged AS (
    SELECT user_id, tus,
           CASE WHEN lag(tus) OVER w IS NULL THEN 1
                WHEN tus - lag(tus) OVER w >= 1800000000 THEN 1
                ELSE 0 END AS new_sess
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
),
sess AS (
    SELECT user_id, tus,
           SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY tus
               ROWS UNBOUNDED PRECEDING
           ) AS session_id
    FROM flagged
)
SELECT user_id,
       CAST(MIN(tus) AS BIGINT) AS session_start_us,
       CAST(MAX(tus) + 1800000000 AS BIGINT) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, session_id
"""


def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming variant of ``funnel_steps``
    (``applyInPandasWithState``, per-step timestamp lists in state so
    cross-batch disorder converges); same oracle — batch/stream parity
    is the assertion."""
    return streaming.stream_funnel_counts(
        spark, f"{sf_dir}/events.parquet"
    ).select("user_id", "t_view", "t_click", "t_purchase", "steps")


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users cohorted by the epoch-week of their
    first 'signup' event; for each (cohort_week, week_offset ≥ 0) the
    number of distinct cohort users active (any event) that week — the
    retention-matrix staple of product analytics.

    Plan: first-signup is one min-aggregate on user_id; activity weeks
    are a map-side projection + distinct on (user, week); the cohort join
    is key-local on user_id (the cohort frame is ≤ one row per user and
    broadcastable); the final count groups on (cohort_week, offset) —
    partial aggregation bounds the shuffle to distinct pairs. Week ids
    are integer epoch-week arithmetic on the raw nanos (floor division,
    timezone-free; ``analytics.retention_matrix``)."""
    from dataproc_spark.extensions.analytics import retention_matrix

    ev = _t(spark, sf_dir, "events")
    return (
        retention_matrix(
            ev, cohort_type="signup", period_ns=7 * 86_400_000_000_000
        )
        .withColumnRenamed("cohort_period", "cohort_week")
        .withColumnRenamed("period_offset", "week_offset")
    )


SQL_RETENTION_COHORTS = """
WITH ev AS (
    SELECT user_id, epoch_ns(ts) AS tns, event_type FROM events
),
wk AS (
    SELECT user_id, event_type,
           (tns - ((tns % 604800000000000) + 604800000000000)
            % 604800000000000) // 604800000000000 AS week
    FROM ev
),
cohort AS (
    SELECT user_id, MIN(week) AS cohort_week
    FROM wk WHERE event_type = 'signup' GROUP BY user_id
),
active AS (SELECT DISTINCT user_id, week FROM wk)
SELECT c.cohort_week,
       CAST(a.week - c.cohort_week AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM active a JOIN cohort c USING (user_id)
WHERE a.week >= c.cohort_week
GROUP BY 1, 2
"""


def q_stream_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming parquet SINK gate: drain the events file stream through
    the ``foreachBatch`` parquet sink (idempotent batch=<id> layout), read
    the sink back as a static table, and run the hourly rollup over it.
    Same oracle as ``events_hourly`` — proving no rows are lost,
    duplicated, or type-mangled across the stream → parquet → batch
    boundary. The only streaming component previously without an oracle.

    The sink + checkpoint dirs are scratch: the rollup (bounded by
    hours × event types, a few hundred rows) is materialized eagerly and
    the dirs removed before returning, so repeated correctness/bench
    runs don't accumulate /tmp copies of the events table.
    """
    import shutil
    import tempfile

    from dataproc_spark.extensions.streaming import (
        _file_stream,
        stream_to_parquet,
    )

    root = tempfile.mkdtemp(prefix="sinkrt_")
    out, ckpt = f"{root}/sink", f"{root}/ckpt"
    try:
        stream = _file_stream(spark, f"{sf_dir}/events.parquet")
        stream_to_parquet(stream, out, checkpoint_dir=ckpt)
        back = spark.read.parquet(out).drop("batch")
        rollup = streaming.hourly_agg(back)
        return spark.createDataFrame(rollup.collect(), rollup.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert sink gate
    (``streaming.stream_upsert_to_parquet``): every-third-event rows
    seed the snapshot (latest value per user); the rest arrive on the
    stream as a changelog (clicks delete, others upsert) and MERGE into
    versioned parquet via foreachBatch. The final snapshot must equal
    the batch ``apply_changelog`` (the oracle) — proving the streaming
    merge loses/duplicates nothing across the stream → merge → parquet
    boundary.

    Oracle precondition: the gate's global latest-wins compaction equals
    the operator's sequential per-batch semantics only when the whole
    changelog lands in ONE micro-batch, so the stream is opened with
    ``max_files_per_trigger=None`` (all available files in one batch) —
    shard-layout-independent: the gate holds whether the driver ships
    ``events.parquet`` as a single file or a sharded directory.
    Multi-batch sequencing (arrival order outranks event time) is
    pinned separately by
    ``test_stream_upsert_applies_batches_in_arrival_order``."""
    import shutil
    import tempfile

    from dataproc_spark.extensions.streaming import (
        _file_stream,
        read_latest_snapshot,
        stream_upsert_to_parquet,
        with_event_time,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    snapshot = (
        ev.where(F.col("event_id") % 3 == 0)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "ts", "value_c")
    )
    root = tempfile.mkdtemp(prefix="upsert_")
    try:
        stream = (
            _file_stream(
                spark, f"{sf_dir}/events.parquet", max_files_per_trigger=None
            )
            .where(F.col("event_id") % 3 != 0)
            .select(
                "user_id", "ts", "event_id",
                F.when(F.col("event_type") == "click", "D")
                .otherwise("U").alias("op"),
                F.round(F.col("value") * 100).cast("long").alias("value_c"),
            )
        )
        stream_upsert_to_parquet(
            stream, snapshot, f"{root}/snap", checkpoint_dir=f"{root}/ckpt"
        )
        final = read_latest_snapshot(spark, f"{root}/snap")
        return spark.createDataFrame(final.collect(), final.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_STREAM_UPSERT = """
WITH ev AS (
    SELECT event_id, user_id, epoch_ns(ts) AS tsn, event_type,
           CAST(round(value * 100) AS BIGINT) AS value_c
    FROM events
),
snap AS (
    SELECT user_id, tsn AS ts, value_c FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY tsn DESC, event_id DESC) AS rn
        FROM ev WHERE event_id % 3 = 0
    ) WHERE rn = 1
),
latest AS (
    SELECT user_id, tsn AS ts, value_c,
           CASE WHEN event_type = 'click' THEN 'D' ELSE 'U' END AS op
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY tsn DESC, event_id DESC) AS rn
        FROM ev WHERE event_id % 3 <> 0
    ) WHERE rn = 1
)
SELECT s.user_id, s.ts, s.value_c
FROM snap s
WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.user_id = s.user_id)
UNION ALL
SELECT user_id, ts, value_c FROM latest WHERE op = 'U'
"""


def q_from_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-driven JSON parsing with the NATIVE ``from_json`` parser
    (vs ``events_json``'s regexp extraction): parse ``props`` to a
    typed struct, then aggregate the extracted field. The engine's
    structured-JSON path — schema projection happens inside the parser,
    not post-hoc string surgery."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json(F.col("props"), "k INT").alias("p"), "event_type"
    )
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("p.k").cast("long")).alias("sum_k"),
        F.count(F.col("p.k")).cast("long").alias("n_parsed"),
    )


SQL_FROM_JSON_EXTRACT = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       CAST(COUNT(json_extract(props, '$.k')) AS BIGINT) AS n_parsed
FROM events
GROUP BY event_type
"""


def q_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions in one per-order pass: collect the
    sorted quantity list, then aggregate / transform / filter / exists /
    forall / zip_with(reverse) — the array-processing surface every
    nested-data pipeline leans on, all JVM-side (no UDFs)."""
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.col("l_quantity").cast("long"))
        ).alias("qs")
    )
    return per_order.select(
        "l_orderkey",
        F.aggregate(
            "qs", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_qty"),
        F.size(F.filter("qs", lambda x: x > 25)).cast("long").alias("n_big"),
        F.aggregate(
            F.transform("qs", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_sq"),
        F.exists("qs", lambda x: x == 50).cast("int").alias("has_50"),
        F.forall("qs", lambda x: x > 0).cast("int").alias("all_pos"),
        F.aggregate(
            F.zip_with("qs", F.reverse("qs"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_cross"),
    )


SQL_HOF_SUITE = """
WITH per_order AS (
    SELECT l_orderkey,
           list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
    FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(list_aggregate(qs, 'sum') AS BIGINT) AS total_qty,
       CAST(len(list_filter(qs, x -> x > 25)) AS BIGINT) AS n_big,
       CAST(list_aggregate(list_transform(qs, x -> x * x), 'sum')
            AS BIGINT) AS sum_sq,
       CAST(CASE WHEN list_contains(qs, 50) THEN 1 ELSE 0 END AS INTEGER)
           AS has_50,
       CAST(CASE WHEN len(list_filter(qs, x -> x <= 0)) = 0
                 THEN 1 ELSE 0 END AS INTEGER) AS all_pos,
       CAST(list_aggregate(list_transform(range(1, len(qs) + 1),
                i -> qs[i] * qs[len(qs) + 1 - i]), 'sum') AS BIGINT)
           AS sum_cross
FROM per_order
"""


def q_sql_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User extensibility on the SQL surface: a vectorized (Arrow)
    pandas UDF registered into the session catalog and called from a
    SQL STRING — the escape hatch for logic the built-ins can't
    express, in its production form (batched, not row-at-a-time). The
    token rule mirrors ``textstats.token_count`` so the oracle is
    plain SQL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _tok(s):
        return s.str.split().str.len().astype("int64")

    # real annotation objects: the module-level `from __future__ import
    # annotations` would stringify inline hints, which the pandas_udf
    # signature inference rejects
    _tok.__annotations__ = {"s": pd.Series, "return": pd.Series}
    tok_count = pandas_udf(_tok, "long")
    spark.udf.register("tok_count", tok_count)
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT source, CAST(SUM(tok_count(text)) AS BIGINT) AS total_tokens,
               CAST(MAX(tok_count(text)) AS BIGINT) AS max_tokens
        FROM documents_v
        GROUP BY source
    """)


SQL_SQL_UDF_TOKENS = r"""
SELECT source,
       CAST(SUM(len(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> ''))) AS BIGINT) AS total_tokens,
       CAST(MAX(len(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> ''))) AS BIGINT) AS max_tokens
FROM documents
GROUP BY source
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value model: per-user
    Recency (latest event ts), Frequency (event count), Monetary (value
    cents), each quartiled WITHIN the population via the integer
    permille rank (``analytics.group_percentile`` with a constant
    group), then composed into a 111..444 segment code. One per-user
    aggregate + three single-partition-spec windows over the user-level
    frame (population-sized, far smaller than events)."""
    from dataproc_spark.extensions.analytics import group_percentile

    ev = _t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max("ts").alias("recency_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("monetary_c"),
    )
    out = users.withColumn("_g", F.lit(1))
    for col, name in [("recency_ts", "r_m"), ("frequency", "f_m"),
                      ("monetary_c", "m_m")]:
        out = group_percentile(out, ["_g"], col, ["user_id"], out_col=name)
    quart = lambda c: F.expr(f"CAST({c} * 4 div 1001 AS INT) + 1")
    return out.select(
        "user_id", "frequency", "monetary_c",
        quart("r_m").alias("r_q"),
        quart("f_m").alias("f_q"),
        quart("m_m").alias("m_q"),
        (quart("r_m") * 100 + quart("f_m") * 10 + quart("m_m"))
        .alias("segment"),
    )


SQL_RFM_SEGMENTS = """
WITH users AS (
    SELECT user_id, MAX(epoch_ns(ts)) AS recency_ts,
           COUNT(*) AS frequency,
           SUM(CAST(round(value * 100) AS BIGINT)) AS monetary_c
    FROM events GROUP BY user_id
),
ranked AS (
    SELECT user_id, frequency, monetary_c,
           ((ROW_NUMBER() OVER (ORDER BY recency_ts, user_id) - 1) * 1000)
               // greatest(COUNT(*) OVER () - 1, 1) AS r_m,
           ((ROW_NUMBER() OVER (ORDER BY frequency, user_id) - 1) * 1000)
               // greatest(COUNT(*) OVER () - 1, 1) AS f_m,
           ((ROW_NUMBER() OVER (ORDER BY monetary_c, user_id) - 1) * 1000)
               // greatest(COUNT(*) OVER () - 1, 1) AS m_m
    FROM users
)
SELECT user_id, CAST(frequency AS BIGINT) AS frequency,
       CAST(monetary_c AS BIGINT) AS monetary_c,
       CAST(r_m * 4 // 1001 + 1 AS INTEGER) AS r_q,
       CAST(f_m * 4 // 1001 + 1 AS INTEGER) AS f_q,
       CAST(m_m * 4 // 1001 + 1 AS INTEGER) AS m_q,
       CAST((r_m * 4 // 1001 + 1) * 100 + (f_m * 4 // 1001 + 1) * 10
            + (m_m * 4 // 1001 + 1) AS INTEGER) AS segment
FROM ranked
"""


def q_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-observability anomaly flags: hours whose event count
    exceeds 2× the trailing-24-hour average for that event type, via an
    integer cross-multiply over a RANGE frame (``count · window_hours >
    2 · trailing_sum`` — no float averages). The rollup is bounded by
    hours × types, so the window runs on the aggregate, never raw
    events."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.expr("(ts - pmod(ts, 3600000000000)) div 3600000000000")
        .alias("hour_id"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rangeBetween(-24, -1)
    )
    scored = hourly.select(
        "hour_id", "event_type", "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("trail_sum"),
        F.coalesce(F.count("n").over(w), F.lit(0)).alias("trail_hours"),
    )
    return scored.where(
        (F.col("trail_hours") >= 12)
        & (F.col("n") * F.col("trail_hours") > 2 * F.col("trail_sum"))
    )


SQL_HOURLY_ANOMALIES = """
WITH hourly AS (
    SELECT (epoch_ns(ts) - ((epoch_ns(ts) % 3600000000000) + 3600000000000)
            % 3600000000000) // 3600000000000 AS hour_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
scored AS (
    SELECT hour_id, event_type, n,
           CAST(COALESCE(SUM(n) OVER w, 0) AS BIGINT) AS trail_sum,
           CAST(COUNT(n) OVER w AS BIGINT) AS trail_hours
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                 RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT hour_id, event_type, n, trail_sum, trail_hours
FROM scored
WHERE trail_hours >= 12 AND n * trail_hours > 2 * trail_sum
"""


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (``graph.triangle_count``) over the
    deterministic exact-Jaccard similarity graph — the cohesion metric
    for dedup clusters (a clique-ish cluster is a confident duplicate
    group; a sparse star is LSH noise). Oriented wedge join + closing
    edge, no cartesian; the oracle repeats the same two equi-joins over
    the identical pair CTE."""
    from dataproc_spark.extensions import graph

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=3, min_shared=2, jaccard_threshold_m=100
    )
    return graph.triangle_count(pairs, src="id_a", dst="id_b")


SQL_TRIANGLE_COUNT = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
sh AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(list_slice(t, i, i + 2), ' '))
             ELSE [] END)) AS s
    FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
shared AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
),
pairs AS (
    SELECT id_a, id_b
    FROM shared
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE (shared * 1000) // (sa.n + sb.n - shared) >= 100
),
tri AS (
    SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z
    FROM pairs e1
    JOIN pairs e2 ON e2.id_a = e1.id_b
    JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (SELECT unnest([x, y, z]) AS node FROM tri)
GROUP BY node
"""


def q_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-quantile profile (p25/p50/p75/p95 of token counts per
    lang) — ``median_tokens`` generalized: ONE histogram aggregate, the
    quantile list exploded over the tiny (lang, value) histogram, each
    quantile picked by rank-range intersection. percentile_disc
    semantics (k = ceil(q·n/100)); raw rows never see a window."""
    docs = _t(spark, sf_dir, "documents")
    feats = docs.select("lang", F.size(dedup.tokens("text")).alias("n_tokens"))
    hist = feats.groupBy("lang", "n_tokens").agg(F.count(F.lit(1)).alias("_c"))
    w_cum = Window.partitionBy("lang").orderBy("n_tokens")
    w_all = Window.partitionBy("lang")
    cum = (
        hist.withColumn("_cum", F.sum("_c").over(w_cum))
        .withColumn("_n", F.sum("_c").over(w_all))
    )
    return (
        cum.select(
            "*",
            F.explode(F.array(*[F.lit(x) for x in (25, 50, 75, 95)]))
            .alias("q"),
        )
        .withColumn("_k", F.expr("(q * _n + 99) div 100"))
        .where(
            (F.col("_cum") >= F.col("_k"))
            & (F.col("_cum") - F.col("_c") < F.col("_k"))
        )
        .select(
            "lang", "q",
            F.col("n_tokens").alias("value"),
            F.col("_n").alias("n_docs"),
        )
    )


SQL_TOKEN_QUANTILES = r"""
WITH feats AS (
    SELECT lang,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS n_tokens
    FROM documents
),
ranked AS (
    SELECT lang, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS cnt
    FROM feats
)
SELECT lang, q, CAST(n_tokens AS BIGINT) AS value,
       CAST(cnt AS BIGINT) AS n_docs
FROM ranked, (SELECT unnest([25, 50, 75, 95]) AS q)
WHERE rn = (q * cnt + 99) // 100
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis for a join/aggregation key — measure BEFORE
    mitigating: top keys by row count with integer share-permille, the
    key-space skew factor ``max_count · n_keys · 1000 div total``
    (1000 = perfectly uniform), the key's share of SELF-JOIN pair work
    ``cnt(cnt−1)/2`` in permille, and a recommendation column derived
    from the r7 salting A/B (SCALE.md §salting A/B): explicit salting
    measured a 0–10 % LOSS wherever AQE's skew split applies, while the
    stop-key cut (``max_df``) measured 26× on a key dominating the
    self-join pair volume. So: ``cut-or-split`` when one key holds the
    majority (≥ 500 ‰) of pair work — drop it (max_df) or split the
    cell; ``salted-agg`` only for aggregation keys at extreme imbalance
    (the key's own count ≥ 4× the uniform share — where a final-shuffle
    straggler, not a join, is the bottleneck); else ``aqe-default``.
    One aggregate + one tiny top-k; pair arithmetic through
    DECIMAL(38,0)/HUGEINT (cnt² wraps 64-bit past cnt ≈ 3·10⁹)."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    wall = Window.partitionBy()
    enriched = (
        counts.withColumn("_total", F.sum("cnt").over(wall))
        .withColumn("_nk", F.count(F.lit(1)).over(wall))
        .withColumn("_mx", F.max("cnt").over(wall))
        .withColumn(
            "_pairs",
            F.expr("cast(cnt as decimal(38,0)) * (cnt - 1) div 2"),
        )
        .withColumn("_tpairs", F.sum("_pairs").over(wall))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("event_type"))
    return (
        enriched.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "rank",
            F.col("event_type").alias("key"),
            "cnt",
            F.expr("cnt * 1000 div _total").alias("share_m"),
            F.expr("_mx * _nk * 1000 div _total").alias("skew_m"),
            F.expr(
                "cast(_pairs as decimal(38,0)) * 1000 div _tpairs"
            ).cast("long").alias("selfjoin_m"),
            F.expr(
                "CASE WHEN (cast(_pairs as decimal(38,0)) * 1000 div _tpairs) >= 500"
                "     THEN 'cut-or-split'"
                "     WHEN (cnt * _nk * 1000 div _total) >= 4000"
                "     THEN 'salted-agg'"
                "     ELSE 'aqe-default' END"
            ).alias("rec"),
        )
    )


SQL_SKEW_REPORT = """
WITH counts AS (
    SELECT event_type AS key, COUNT(*) AS cnt FROM events GROUP BY 1
),
stats AS (
    SELECT key, cnt, SUM(cnt) OVER () AS total,
           COUNT(*) OVER () AS nk, MAX(cnt) OVER () AS mx,
           CAST(cnt AS HUGEINT) * (cnt - 1) // 2 AS pairs,
           SUM(CAST(cnt AS HUGEINT) * (cnt - 1) // 2) OVER () AS tpairs,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rank
    FROM counts
)
SELECT CAST(rank AS BIGINT) AS rank, key, CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt * 1000 // total AS BIGINT) AS share_m,
       CAST(mx * nk * 1000 // total AS BIGINT) AS skew_m,
       CAST(pairs * 1000 // tpairs AS BIGINT) AS selfjoin_m,
       CASE WHEN pairs * 1000 // tpairs >= 500 THEN 'cut-or-split'
            WHEN cnt * nk * 1000 // total >= 4000 THEN 'salted-agg'
            ELSE 'aqe-default' END AS rec
FROM stats WHERE rank <= 3
"""


def q_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise label-centroid cosine (integer permille): which classes
    are confusable. Centroids are per-label integer SUM vectors (cosine
    is scale-invariant, so sums stand in for means with zero division
    error); the 45-pair self-join runs on the 10-row centroid table.
    ``cos_m = dot·1000 div (⌊√(a·a)⌋·⌊√(b·b)⌋)`` — floor-sqrt is exact
    below 2^53, so both engines agree bit-for-bit."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = (
        emb.select("label", F.posexplode(simsearch.quantize("embedding"))
                   .alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.sum("v").alias("s"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("ds"))
        .select("label", F.transform("ds", lambda x: x["s"]).alias("c"))
    )
    a = cent.select(F.col("label").alias("label_a"), F.col("c").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), F.col("c").alias("cb"))
    pairs = a.join(b, F.col("label_a") < F.col("label_b"))
    dot = simsearch.dot_q(F.col("ca"), F.col("cb"))
    na = F.floor(F.sqrt(simsearch.dot_q(F.col("ca"), F.col("ca")))).cast("long")
    nb = F.floor(F.sqrt(simsearch.dot_q(F.col("cb"), F.col("cb")))).cast("long")
    return pairs.select(
        "label_a", "label_b",
        dot.alias("_dot"), na.alias("_na"), nb.alias("_nb"),
    ).selectExpr(
        "label_a", "label_b",
        "CAST(_dot * 1000 div (_na * _nb) AS BIGINT) AS cos_m",
    )


SQL_CENTROID_SIMILARITY = """
WITH q AS (
    SELECT label,
           list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
),
cent AS (
    SELECT label, list(s ORDER BY dim) AS c
    FROM (
        SELECT label, dim, CAST(SUM(val) AS BIGINT) AS s
        FROM (SELECT label, generate_subscripts(v, 1) AS dim,
                     unnest(v) AS val FROM q)
        GROUP BY label, dim
    ) GROUP BY label
),
pairs AS (
    SELECT a.label AS label_a, b.label AS label_b, a.c AS ca, b.c AS cb
    FROM cent a JOIN cent b ON a.label < b.label
)
SELECT label_a, label_b,
       CAST(list_aggregate(list_transform(range(1, len(ca) + 1),
                i -> ca[i] * cb[i]), 'sum') * 1000
            // (CAST(FLOOR(SQRT(list_aggregate(list_transform(
                    range(1, len(ca) + 1), i -> ca[i] * ca[i]), 'sum')))
                 AS BIGINT)
              * CAST(FLOOR(SQRT(list_aggregate(list_transform(
                    range(1, len(cb) + 1), i -> cb[i] * cb[i]), 'sum')))
                 AS BIGINT))
       AS BIGINT) AS cos_m
FROM pairs
"""


def q_dedup_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-rate diagnostics per source: docs, distinct texts,
    and the duplicate permille — which crawl sources are redundant and
    by how much, the number that decides where the expensive near-dup
    passes are worth running. One aggregate (COUNT + COUNT DISTINCT on
    the md5 fingerprint, never the body)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("source", F.md5(F.col("text").cast("binary")).alias("_fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("_fp").alias("n_distinct"),
        )
        .select(
            "source", "n_docs", "n_distinct",
            F.expr("(n_docs - n_distinct) * 1000 div n_docs").alias("dup_m"),
        )
    )


SQL_DEDUP_RATES = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
       CAST((COUNT(*) - COUNT(DISTINCT md5(text))) * 1000 // COUNT(*)
            AS BIGINT) AS dup_m
FROM documents
GROUP BY source
"""


def q_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman-style rank correlation (integer permille) between
    document length and token count per source — the corpus-statistics
    sanity check ("does feature A actually track feature B in this
    slice"). Ranks are total-ordered (value, doc_id) so ties resolve
    identically in both engines; ``rho_m = 1000 − 6000·Σd² div
    n(n²−1)``. Both rank windows share the source partition; the
    aggregate is one shuffle on source. The ratio goes through
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): the worst case is
    ``6000·Σd²`` with ``Σd² ≈ n³/3``, i.e. ``2000·n³`` — in 64-bit
    that wraps silently past per-group n ≈ 1.6·10⁵, far too low for a
    corpus slice; 128-bit holds to n ≈ 3·10¹¹."""
    docs = _t(spark, sf_dir, "documents")
    feats = docs.select(
        "source", "doc_id", "n_chars",
        F.size(dedup.tokens("text")).alias("n_tokens"),
    )
    wa = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wb = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    ranked = feats.select(
        "source",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))
            ).alias("sum_d2"),
        )
        .where(F.col("n") >= 2)
        .select(
            "source", "n",
            F.expr(
                "1000 - (6000 * cast(sum_d2 as decimal(38,0))) div "
                "(cast(n as decimal(38,0)) * "
                " (cast(n as decimal(38,0)) * n - 1))"
            ).alias("rho_m"),
        )
    )


SQL_RANK_CORRELATION = r"""
WITH feats AS (
    SELECT source, doc_id, n_chars,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS n_tokens
    FROM documents
),
ranked AS (
    SELECT source,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS ra,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_tokens, doc_id) AS rb
    FROM feats
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(1000 - (6000 * CAST(SUM((ra - rb) * (ra - rb)) AS HUGEINT))
            // (CAST(COUNT(*) AS HUGEINT)
                * (CAST(COUNT(*) AS HUGEINT) * COUNT(*) - 1))
            AS BIGINT) AS rho_m
FROM ranked
GROUP BY source
HAVING COUNT(*) >= 2
"""


# ---------------------------------------------------------------------------
# documents (dedup + text analysis)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one surviving doc per distinct text (min id wins)."""
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (token/char counts)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text").cast("long")).alias("sum_chars"),
        F.sum(textstats.token_count().cast("long")).alias("sum_tokens"),
    )


SQL_TEXT_STATS = r"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       CAST(SUM(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS sum_tokens
FROM documents GROUP BY lang
"""


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 tokens by frequency (explode → agg → top-k)."""
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(dedup.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return counts.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= 20
    )


SQL_TOKEN_TOPK = r"""
WITH toks AS (
    SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
    FROM documents
),
counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY token)
SELECT token, cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS rnk
FROM counts
QUALIFY rnk <= 20
"""


def q_lang_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword language-ID heuristic vs the labeled lang column."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("pred_lang", textstats.predicted_lang("text"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_LANG_SCORE_SQL = {
    "en": "((length(text) - length(replace(text, ' the ', ''))) // 5"
          " + (length(text) - length(replace(text, ' and ', ''))) // 5"
          " + (length(text) - length(replace(text, ' of ', ''))) // 4)",
    "de": "((length(text) - length(replace(text, ' der ', ''))) // 5"
          " + (length(text) - length(replace(text, ' und ', ''))) // 5"
          " + (length(text) - length(replace(text, ' die ', ''))) // 5)",
    "fr": "((length(text) - length(replace(text, ' le ', ''))) // 4"
          " + (length(text) - length(replace(text, ' et ', ''))) // 4"
          " + (length(text) - length(replace(text, ' la ', ''))) // 4)",
    "es": "((length(text) - length(replace(text, ' el ', ''))) // 4"
          " + (length(text) - length(replace(text, ' y ', ''))) // 3"
          " + (length(text) - length(replace(text, ' de la ', ''))) // 7)",
}

SQL_LANG_PREDICT = f"""
WITH scored AS (
    SELECT lang,
           {_LANG_SCORE_SQL['en']} AS s_en,
           {_LANG_SCORE_SQL['de']} AS s_de,
           {_LANG_SCORE_SQL['fr']} AS s_fr,
           {_LANG_SCORE_SQL['es']} AS s_es
    FROM documents
),
pred AS (
    SELECT lang,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS pred_lang
    FROM scored
)
SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred GROUP BY lang, pred_lang
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint uniqueness per source."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", textstats.doc_fingerprint("text"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct_fp"),
        )
    )


SQL_DOC_FINGERPRINT = r"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT md5(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS BIGINT) AS n_distinct_fp
FROM documents GROUP BY source
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-feature binning: docs per 100-char bin with token sums."""
    docs = textstats.quality_features(_t(spark, sf_dir, "documents"))
    return (
        docs.withColumn("chars_bin", F.expr("n_chars_m div 100"))
        .groupBy("chars_bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("sum_tokens"),
            F.sum("mean_tok_len_c").alias("sum_mtl_c"),
        )
    )


SQL_DOC_QUALITY = r"""
WITH feat AS (
    SELECT length(text) AS n_chars_m,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
    FROM documents
),
feat2 AS (
    SELECT n_chars_m, n_tokens,
           CASE WHEN n_tokens > 0
                THEN CAST(FLOOR(((n_chars_m - n_tokens + 1) * 100.0) / n_tokens) AS BIGINT)
                ELSE 0 END AS mean_tok_len_c
    FROM feat
)
SELECT n_chars_m // 100 AS chars_bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(mean_tok_len_c) AS BIGINT) AS sum_mtl_c
FROM feat2 GROUP BY chars_bin
"""


def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata extraction (byte length + first code unit)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.ascii(F.col("text")).cast("int").alias("first_code"),
    )


SQL_MULTIMODAL_BYTES = """
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(ascii(text) AS INTEGER) AS first_code
FROM documents
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the multimodal Arrow path: every doc_id
    becomes a small RGB frame (pixel ``k`` = ``(doc_id*31 + k) % 256``)
    encoded as an actual PNG (even ids — zlib deflate, filter bytes) or
    binary PPM (odd ids) on one ``mapInPandas`` stage, then DECODED —
    zlib inflate + defilter / header parse, no image library — on a
    second, emitting exact-integer pixel statistics. The oracle
    reproduces the stats from the pixel arithmetic alone, so a decoder
    bug (wrong stride, off-by-one filter, bad header parse) hash-fails.

    Ref parity: the reference has no multimodal surface; this implements
    the LLM-pipeline mandate (binary columns + typed metadata + Arrow
    decode stages) with the codec now real for PNG/PPM.
    """
    from dataproc_spark.extensions.multimodal import (
        decode_image_stats,
        synthesize_images,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return decode_image_stats(synthesize_images(docs))


SQL_MULTIMODAL_DECODE = """
WITH px AS (
    SELECT doc_id,
           unnest(range(0, (4 + doc_id % 13) * (3 + doc_id % 7) * 3)) AS k
    FROM documents
)
SELECT doc_id AS media_id,
       CAST(4 + doc_id % 13 AS INTEGER) AS width,
       CAST(3 + doc_id % 7 AS INTEGER) AS height,
       3 AS channels,
       CAST((4 + doc_id % 13) * (3 + doc_id % 7) AS BIGINT) AS n_pixels,
       CAST(sum((doc_id * 31 + k) % 256) AS BIGINT) AS pixel_sum,
       CAST(min((doc_id * 31 + k) % 256) AS INTEGER) AS pixel_min,
       CAST(max((doc_id * 31 + k) % 256) AS INTEGER) AS pixel_max
FROM px
GROUP BY doc_id
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + nearest-neighbor resize fused on one Arrow stage
    (``multimodal.resize_image_stats``): every synthesized frame is
    decoded (real PNG/PPM codec) and resampled to 8×8 with the
    floor-index NN rule, emitting exact-integer stats. The oracle
    replays the resampled pixel set from the synthesis arithmetic +
    the same integer index mapping — a wrong stride or off-by-one
    resample hash-fails."""
    from dataproc_spark.extensions.multimodal import (
        resize_image_stats,
        synthesize_images,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return resize_image_stats(synthesize_images(docs), width=8, height=8)


SQL_MULTIMODAL_RESIZE = """
WITH tgt AS (
    SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h, ty, tx, ch
    FROM documents,
         (SELECT unnest(range(0, 8)) AS ty) a,
         (SELECT unnest(range(0, 8)) AS tx) b,
         (SELECT unnest(range(0, 3)) AS ch) c
),
px AS (
    SELECT doc_id,
           (doc_id * 31 + (((ty * h // 8) * w + (tx * w // 8)) * 3 + ch))
           % 256 AS v
    FROM tgt
)
SELECT doc_id AS media_id,
       8 AS width, 8 AS height, 3 AS channels,
       CAST(64 AS BIGINT) AS n_pixels,
       CAST(SUM(v) AS BIGINT) AS pixel_sum,
       CAST(MIN(v) AS INTEGER) AS pixel_min,
       CAST(MAX(v) AS INTEGER) AS pixel_max
FROM px
GROUP BY doc_id
"""


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training
    (``textstats.bpe_learn_merges``): one corpus-sized (word, freq)
    aggregate, then 3 merge rounds of pair-count + argmax on the
    vocabulary table. The oracle replays all three rounds — pair
    explode, frequency argmax with lexicographic tie-break, and the
    sentinel-space replace — as chained CTEs."""
    merges = textstats.bpe_learn_merges(
        _t(spark, sf_dir, "documents"), n_merges=3
    )
    return spark.createDataFrame(
        merges, schema="rank int, lhs string, rhs string, pair_freq long"
    )


SQL_BPE_MERGES = r"""
WITH toks AS (
    SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                              x -> x <> '')) AS w
    FROM documents
),
words1 AS (
    SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS r,
           COUNT(*) AS freq
    FROM toks GROUP BY w
),
p1 AS (
    SELECT s[i] AS a, s[i + 1] AS b, SUM(freq) AS cnt
    FROM (SELECT string_split(trim(r), ' ') AS s, freq FROM words1) t,
         unnest(range(1, len(t.s))) u(i)
    GROUP BY 1, 2
),
b1 AS (SELECT a, b, cnt FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
words2 AS (
    SELECT replace(r, ' ' || b1.a || ' ' || b1.b || ' ',
                   ' ' || b1.a || b1.b || ' ') AS r, freq
    FROM words1, b1
),
p2 AS (
    SELECT s[i] AS a, s[i + 1] AS b, SUM(freq) AS cnt
    FROM (SELECT string_split(trim(r), ' ') AS s, freq FROM words2) t,
         unnest(range(1, len(t.s))) u(i)
    GROUP BY 1, 2
),
b2 AS (SELECT a, b, cnt FROM p2 ORDER BY cnt DESC, a, b LIMIT 1),
words3 AS (
    SELECT replace(r, ' ' || b2.a || ' ' || b2.b || ' ',
                   ' ' || b2.a || b2.b || ' ') AS r, freq
    FROM words2, b2
),
p3 AS (
    SELECT s[i] AS a, s[i + 1] AS b, SUM(freq) AS cnt
    FROM (SELECT string_split(trim(r), ' ') AS s, freq FROM words3) t,
         unnest(range(1, len(t.s))) u(i)
    GROUP BY 1, 2
),
b3 AS (SELECT a, b, cnt FROM p3 ORDER BY cnt DESC, a, b LIMIT 1)
SELECT 0 AS rank, a AS lhs, b AS rhs, CAST(cnt AS BIGINT) AS pair_freq FROM b1
UNION ALL
SELECT 1, a, b, CAST(cnt AS BIGINT) FROM b2
UNION ALL
SELECT 2, a, b, CAST(cnt AS BIGINT) FROM b3
"""


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (``corpus.corpus_diff``): v1 = ids not
    divisible by 10, v2 = ids not divisible by 7 with every 5th text
    amended — each id labeled added/removed/changed/unchanged via a
    fingerprint full-outer join (bodies never shuffle)."""
    from dataproc_spark.extensions.corpus import corpus_diff

    docs = _t(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(old, new)


SQL_CORPUS_DIFF = """
WITH v1 AS (
    SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 10 <> 0
),
v2 AS (
    SELECT doc_id,
           md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                    ELSE text END) AS fp
    FROM documents WHERE doc_id % 7 <> 0
)
SELECT doc_id,
       CASE WHEN o.fp IS NULL THEN 'added'
            WHEN n.fp IS NULL THEN 'removed'
            WHEN o.fp = n.fp THEN 'unchanged'
            ELSE 'changed' END AS status
FROM v1 o FULL OUTER JOIN v2 n USING (doc_id)
"""


def q_stream_hourly_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode streaming hourly rollup
    (``streaming.stream_hourly_append``): windows emit exactly once when
    the watermark passes their end. The oracle replays the emission
    bound exactly — watermark = millisecond-floored max event time minus
    the 2-hour delay; only windows whose end ≤ watermark appear, the
    buffered tail stays in state by design."""
    return streaming.stream_hourly_append(spark, f"{sf_dir}/events.parquet")


SQL_STREAM_HOURLY_APPEND = """
WITH hourly AS (
    SELECT (epoch_ns(ts) - ((epoch_ns(ts) % 3600000000000) + 3600000000000)
            % 3600000000000) // 3600000000000 AS hour_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_value_c
    FROM events
    GROUP BY 1, 2
),
wm AS (
    -- Spark tracks the event-time max in ms: micros -> ms floor, then
    -- the 2 h delay
    SELECT (MAX(epoch_ns(ts)) // 1000) // 1000 - 7200000 AS wm_ms
    FROM events
)
SELECT hour_id, event_type, n_events, sum_value_c
FROM hourly, wm
WHERE (hour_id + 1) * 3600000 <= wm.wm_ms
"""


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (``quality.profile_table``): one row per column
    with total/null/distinct counts and native-type min/max rendered as
    strings — the data-observability pass before every ingest."""
    from dataproc_spark.extensions.quality import profile_table

    return profile_table(
        _t(spark, sf_dir, "documents"),
        ["doc_id", "lang", "source", "n_chars"],
    )


SQL_PROFILE_TABLE = """
SELECT 'doc_id' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
       CAST(MIN(doc_id) AS VARCHAR) AS min_value,
       CAST(MAX(doc_id) AS VARCHAR) AS max_value
FROM documents
UNION ALL
SELECT 'lang', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT lang) AS BIGINT),
       MIN(lang), MAX(lang)
FROM documents
UNION ALL
SELECT 'source', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT source) AS BIGINT),
       MIN(source), MAX(source)
FROM documents
UNION ALL
SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT n_chars) AS BIGINT),
       CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
FROM documents
"""


def q_validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation (``quality.validate_constraints``): key
    uniqueness, a value-range rule, and referential integrity
    (anti-join against the broadcast dimension) — one (rule,
    violations) row each, the data-contract gate of an ingest."""
    from dataproc_spark.extensions.quality import (
        check_in_range,
        check_references,
        check_unique,
        validate_constraints,
    )

    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    return validate_constraints([
        check_unique(orders, ["o_orderkey"]),
        check_in_range(lineitem, "l_quantity", 1, 50),
        check_references(orders, "o_custkey", customer, "c_custkey"),
    ])


SQL_VALIDATE_CONSTRAINTS = """
SELECT 'unique(o_orderkey)' AS rule,
       CAST(COALESCE(SUM(n), 0) AS BIGINT) AS violations
FROM (SELECT COUNT(*) AS n FROM orders
      GROUP BY o_orderkey HAVING COUNT(*) > 1)
UNION ALL
SELECT 'range(l_quantity, 1, 50)', CAST(COUNT(*) AS BIGINT)
FROM lineitem
WHERE NOT (l_quantity BETWEEN 1 AND 50) OR l_quantity IS NULL
UNION ALL
SELECT 'references(o_custkey)', CAST(COUNT(*) AS BIGINT)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: counts of (previous event type →
    next event type) steps per user under the total order (ts,
    event_id) — the Markov-chain view of user behavior behind
    next-action prediction and funnel discovery. ONE lag window per
    user (the sessionization plan shape) + one pair aggregate; no
    self-joins."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    steps = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    return steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_steps")
    )


SQL_EVENT_TRANSITIONS = """
WITH steps AS (
    SELECT LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY epoch_ns(ts), event_id)
               AS prev_type,
           event_type AS next_type
    FROM events
)
SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_steps
FROM steps WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth on one per-user pass: lag, lead,
    first_value, nth_value, dense_rank, and an integer cume_dist
    (rank*1000 div n — float cume_dist cannot hash-match), all sharing
    a single partition spec so the plan carries ONE sort, no extra
    exchanges."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wall = Window.partitionBy("user_id")
    return ev.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_id"),
        F.lead("event_id").over(w).alias("next_id"),
        F.first("event_id").over(w).alias("first_id"),
        F.nth_value("event_id", 2).over(w).alias("second_id"),
        F.dense_rank().over(
            Window.partitionBy("user_id").orderBy("event_type")
        ).alias("type_rank"),
        F.expr(
            "(1000 * row_number() OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id))"
        ).cast("long").alias("rn_m"),
        F.count(F.lit(1)).over(wall).alias("n_user_events"),
    ).withColumn("cume_m", F.expr("rn_m div n_user_events"))


SQL_WINDOW_SUITE = """
SELECT user_id, event_id,
       LAG(event_id) OVER w AS prev_id,
       LEAD(event_id) OVER w AS next_id,
       FIRST_VALUE(event_id) OVER w AS first_id,
       NTH_VALUE(event_id, 2) OVER w AS second_id,
       CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY event_type)
            AS BIGINT) AS type_rank,
       CAST(1000 * ROW_NUMBER() OVER w AS BIGINT) AS rn_m,
       CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
           AS n_user_events,
       CAST((1000 * ROW_NUMBER() OVER w)
            // COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS cume_m
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (rows-only: hash-family dependent).

    32 hashes / 8 bands (r=4): candidate threshold ≈ (1/8)^(1/4) ≈ 0.6
    Jaccard at the S-curve midpoint — appropriate for the 0.2 verify
    threshold and half the signature cost of 64 hashes.
    """
    return dedup.minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.2, shingle_size=3,
        num_hashes=32, bands=8,
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (rows-only: hash-family dependent)."""
    return dedup.simhash_near_pairs(
        _t(spark, sf_dir, "documents"), bits=32, bands=4, max_hamming=2
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup pipeline: MinHash-LSH pairs → connected components →
    keep one representative per cluster.

    Uses the engine-portable md5 hash family (16 hashes / 4 bands, the
    same family as ``dedup_minhash_portable``) so the ENTIRE pipeline —
    which candidate pairs LSH surfaces, the component labels, and the
    surviving representatives — is bit-reproduced by the DuckDB oracle
    (portable-LSH pairs CTE + recursive reachability closure)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(
        docs, threshold=0.2, shingle_size=3, num_hashes=16, bands=4,
        portable=True, scale_m=1000,
    )
    return dedup.dedup_keep_representatives(docs, pairs).select(
        "doc_id", "lang", "source"
    )


SQL_DEDUP_CLUSTERS = r"""
WITH RECURSIVE toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 1),
               i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
    FROM toks WHERE len(t) >= 3
),
sig AS (
    SELECT doc_id, s,
           list_transform(range(0, 16),
               i -> list_aggregate(
                   list_transform(s, x -> md5(x || '#' || i)), 'min')) AS sg
    FROM sh
),
banded AS (
    SELECT doc_id, b.band AS band,
           md5(array_to_string(
               list_slice(sg, b.band * 4 + 1, b.band * 4 + 4), '|')) AS bhash
    FROM sig, (SELECT unnest(range(0, 4)) AS band) b
),
cand AS (
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM banded l JOIN banded r
      ON l.band = r.band AND l.bhash = r.bhash AND l.doc_id < r.doc_id
),
verified AS (
    SELECT id_a, id_b,
           len(list_intersect(sa.s, sb.s)) AS i_n,
           len(list_distinct(list_concat(sa.s, sb.s))) AS u_n
    FROM cand
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
),
pairs AS (
    SELECT id_a, id_b FROM verified WHERE (i_n * 1000) // u_n >= 200
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, label) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
losers AS (SELECT node FROM comp WHERE node <> component)
SELECT d.doc_id, d.lang, d.source
FROM documents d
LEFT JOIN losers ON d.doc_id = losers.node
WHERE losers.node IS NULL
"""


def q_dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs with the engine-portable md5 hash family
    — the hash-checked twin of ``dedup_minhash``.

    Same shingle → signature → band → bucket-join → verify pipeline, but
    hash family i = ``md5(shingle || '#' || i)`` ordered lexicographically
    and integer milli-Jaccard scores, so DuckDB reproduces every bit
    (including which candidate pairs LSH surfaces). 16 hashes / 4 bands
    (r=4) keeps the oracle's md5 cost bounded while preserving the
    S-curve midpoint ≈ (1/4)^(1/4) ≈ 0.7.
    """
    return dedup.minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.2, shingle_size=3,
        num_hashes=16, bands=4, portable=True, scale_m=1000,
    )


SQL_DEDUP_MINHASH_PORTABLE = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 1),
               i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
    FROM toks WHERE len(t) >= 3
),
sig AS (
    SELECT doc_id, s,
           list_transform(range(0, 16),
               i -> list_aggregate(
                   list_transform(s, x -> md5(x || '#' || i)), 'min')) AS sg
    FROM sh
),
banded AS (
    SELECT doc_id, b.band AS band,
           md5(array_to_string(
               list_slice(sg, b.band * 4 + 1, b.band * 4 + 4), '|')) AS bhash
    FROM sig, (SELECT unnest(range(0, 4)) AS band) b
),
cand AS (
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM banded l JOIN banded r
      ON l.band = r.band AND l.bhash = r.bhash AND l.doc_id < r.doc_id
),
verified AS (
    SELECT id_a, id_b,
           len(list_intersect(sa.s, sb.s)) AS i_n,
           len(list_distinct(list_concat(sa.s, sb.s))) AS u_n
    FROM cand
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, CAST((i_n * 1000) // u_n AS BIGINT) AS jaccard_m
FROM verified WHERE (i_n * 1000) // u_n >= 200
"""


def q_dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components + keep-representatives over *deterministic*
    exact-Jaccard pairs — the hash-checked gate for the clustering stage
    that ``dedup_clusters`` (LSH-dependent, rows-only) can't give.

    The oracle emulates min-label propagation with a recursive CTE
    (reachability closure, then min reachable id per node).
    """
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=3, min_shared=2, jaccard_threshold_m=100
    )
    return dedup.dedup_keep_representatives(docs, pairs).select(
        "doc_id", "lang", "source"
    )


SQL_DEDUP_CC = r"""
WITH RECURSIVE toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
sh AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(list_slice(t, i, i + 2), ' '))
             ELSE [] END)) AS s
    FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
shared AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
),
pairs AS (
    SELECT id_a, id_b
    FROM shared
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE (shared * 1000) // (sa.n + sb.n - shared) >= 100
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, label) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
losers AS (SELECT node FROM comp WHERE node <> component)
SELECT d.doc_id, d.lang, d.source
FROM documents d
LEFT JOIN losers ON d.doc_id = losers.node
WHERE losers.node IS NULL
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: documents already ingested (the
    deterministic 'train' split stands in for the existing corpus) are
    represented ONLY by their 16-byte content fingerprints; a new batch
    (the 'val'+'test' splits) keeps documents that are neither already in
    the store nor duplicated within the batch (min doc_id wins).

    The production shape for growing corpora: the old corpus is never
    rescanned — its fingerprint table is the only thing the new batch
    joins against (anti-join on the hash), and within-batch dedup is the
    usual min-id aggregate."""
    docs = _t(spark, sf_dir, "documents")
    split = sampling.hash_split(docs, id_col="doc_id", salt="ingest")
    store = (
        split.where(F.col("split") == "train")
        .select(dedup.content_fingerprint("text").alias("_fp"))
        .distinct()
    )
    batch = split.where(F.col("split") != "train").withColumn(
        "_fp", dedup.content_fingerprint("text")
    )
    fresh = batch.join(store, "_fp", "left_anti")
    return (
        fresh.groupBy("_fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_batch_copies"),
        )
        .select("doc_id", "n_batch_copies")
    )


SQL_INCREMENTAL_DEDUP = """
WITH split AS (
    SELECT doc_id, text,
           substr(md5(CAST(doc_id AS VARCHAR) || '#ingest'), 1, 8)
               < 'cccccccc' AS in_store
    FROM documents
),
store AS (
    SELECT DISTINCT md5(text) AS fp FROM split WHERE in_store
),
batch AS (
    SELECT doc_id, md5(text) AS fp FROM split WHERE NOT in_store
)
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_batch_copies
FROM batch b
WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.fp = b.fp)
GROUP BY fp
"""


def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup diagnostics: the duplicate-cluster size histogram (how many
    clusters of 2, of 3, ... — singletons excluded), over the same
    deterministic exact-Jaccard pair graph as ``dedup_cc``. The first
    thing to inspect before committing a dedup pass at corpus scale: a
    heavy tail here means boilerplate families, not true duplicates.

    Plan: connected components (bounded label propagation) → one count
    per component → one count per size — each a partially-aggregated
    hash aggregate on a frame no larger than the paired-document set."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=3, min_shared=2, jaccard_threshold_m=100
    )
    comps = dedup.connected_components(pairs, id_a="id_a", id_b="id_b")
    return (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
    )


SQL_DEDUP_CLUSTER_SIZES = r"""
WITH RECURSIVE toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
sh AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(list_slice(t, i, i + 2), ' '))
             ELSE [] END)) AS s
    FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
shared AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
),
pairs AS (
    SELECT id_a, id_b
    FROM shared
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE (shared * 1000) // (sa.n + sb.n - shared) >= 100
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, label) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component)
GROUP BY cluster_size
"""


def q_dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the engine-portable md5_32 token-hash
    family — the hash-checked twin of ``dedup_simhash``: DuckDB rebuilds
    fingerprints bit-for-bit (hex-digit bit extraction), bands them the
    same way, and verifies the same Hamming distances."""
    return dedup.simhash_near_pairs(
        _t(spark, sf_dir, "documents"), bits=32, bands=4, max_hamming=2,
        token_hash="md5_32",
    )


SQL_DEDUP_SIMHASH_PORTABLE = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
counts AS (
    SELECT doc_id,
           list_transform(range(0, 32), j ->
               list_aggregate(list_transform(t, tok ->
                   CASE WHEN ((strpos('0123456789abcdef',
                                      substr(md5(tok), 8 - (j // 4), 1)) - 1)
                              >> (j % 4)) & 1 = 1
                        THEN 1 ELSE -1 END), 'sum')) AS c
    FROM toks WHERE len(t) > 0
),
fp AS (
    SELECT doc_id,
           list_aggregate(list_transform(range(0, 32), j ->
               CASE WHEN c[j + 1] > 0 THEN (CAST(1 AS BIGINT) << j)
                    ELSE 0 END), 'sum') AS simhash
    FROM counts
),
banded AS (
    SELECT doc_id, simhash, b.band AS band,
           (simhash >> (b.band * 8)) & 255 AS bval
    FROM fp, (SELECT unnest(range(0, 4)) AS band) b
),
cand AS (
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
           l.simhash AS ha, r.simhash AS hb
    FROM banded l JOIN banded r
      ON l.band = r.band AND l.bval = r.bval AND l.doc_id < r.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 2
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by md5 hash ranges —
    stable under corpus growth and cluster layout; counts per split."""
    split_df = sampling.hash_split(
        _t(spark, sf_dir, "documents"), "doc_id", "r2split"
    )
    return split_df.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# cutoffs are frac_to_hex(0.8) / frac_to_hex(0.9): floor(f * 16^8) in hex
SQL_HASH_SPLIT = """
WITH h AS (
    SELECT lang,
           substr(md5(CAST(doc_id AS VARCHAR) || '#r2split'), 1, 8) AS hx
    FROM documents
)
SELECT CASE WHEN hx < 'cccccccc' THEN 'train'
            WHEN hx < 'e6666666' THEN 'val'
            ELSE 'test' END AS split,
       lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM h GROUP BY 1, 2
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-stratum deterministic sample (hash order): 2 documents
    per (lang, source) cell."""
    return sampling.stratified_sample(
        _t(spark, sf_dir, "documents"), ["lang", "source"], k=2,
        id_col="doc_id", salt="strat",
    ).select("doc_id", "lang", "source")


SQL_STRATIFIED_SAMPLE = """
WITH r AS (
    SELECT doc_id, lang, source,
           ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || '#strat'), 1, 8),
                        doc_id
           ) AS rn
    FROM documents
)
SELECT doc_id, lang, source FROM r WHERE rn <= 2
"""


def q_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic corpus sample (map-only, no shuffle): membership
    depends only on md5(doc_id + salt), so reruns and corpus growth never
    reshuffle the sample."""
    return sampling.deterministic_sample(
        _t(spark, sf_dir, "documents"), "doc_id", "s1", fraction=0.1
    ).select("doc_id", "lang", "source")


# cutoff is frac_to_hex(0.1) = floor(0.1 * 16^8) = 0x19999999
SQL_DOC_SAMPLE = """
SELECT doc_id, lang, source
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR) || '#s1'), 1, 8) < '19999999'
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals aggregated per lang: duplicate-token and
    top-bigram fractions (×1000 exact integers)."""
    feats = textstats.repetition_features(_t(spark, sf_dir, "documents"))
    return feats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dup_token_m").alias("sum_dup_token_m"),
        F.max("top_bigram_m").alias("max_top_bigram_m"),
    )


SQL_REPETITION_STATS = r"""
WITH toks AS (
    SELECT lang,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
bg AS (
    SELECT lang, t,
           CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)),
                                    i -> t[i] || ' ' || t[i + 1])
                ELSE [] END AS b
    FROM toks
),
feats AS (
    SELECT lang,
           CASE WHEN len(t) > 0
                THEN ((len(t) - len(list_distinct(t))) * 1000) // len(t)
                ELSE 0 END AS dup_token_m,
           CASE WHEN len(t) >= 2
                THEN (list_max(list_transform(list_distinct(b),
                         d -> len(list_filter(b, x -> x = d)))) * 1000)
                     // (len(t) - 1)
                ELSE 0 END AS top_bigram_m
    FROM bg
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dup_token_m) AS BIGINT) AS sum_dup_token_m,
       CAST(MAX(top_bigram_m) AS BIGINT) AS max_top_bigram_m
FROM feats GROUP BY lang
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via bucket equi-join + residual filter (no
    nested-loop θ-join): views falling in the 30 minutes after each error
    event, counted per error (zero-preserving left join)."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts").cast("long").alias("start"),
        (F.col("ts").cast("long") + 1_800_000_000_000).alias("end"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("ts").cast("long").alias("ts")
    )
    matched = temporal.interval_join(
        views, errors, point_ts="ts", start_col="start", end_col="end"
    )
    counts = matched.groupBy("err_id").agg(
        F.count(F.lit(1)).alias("n_views")
    )
    return (
        errors.select("err_id")
        .join(counts, "err_id", "left")
        .select("err_id", F.coalesce("n_views", F.lit(0)).alias("n_views"))
    )


SQL_INTERVAL_JOIN = """
WITH err AS (
    SELECT event_id AS err_id, epoch_ns(ts) AS s,
           epoch_ns(ts) + 1800000000000 AS e
    FROM events WHERE event_type = 'error'
),
v AS (SELECT epoch_ns(ts) AS tns FROM events WHERE event_type = 'view')
SELECT err.err_id, CAST(COUNT(v.tns) AS BIGINT) AS n_views
FROM err LEFT JOIN v ON v.tns >= err.s AND v.tns < err.e
GROUP BY err.err_id
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture reweighting: per-source deterministic sampling
    rates (e.g. upsample src0, drop most of src1), counts per source."""
    out = sampling.mixture_sample(
        _t(spark, sf_dir, "documents"),
        fractions={"src0": 1.0, "src1": 0.25, "src2": 0.5},
        group_col="source", id_col="doc_id", salt="mix1", default=0.1,
    )
    return out.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


# cutoffs: frac_to_hex of 1.0 / 0.25 / 0.5 / 0.1 — 'g' sorts above every
# hex char, so fraction 1.0 keeps all rows under lexicographic compare
SQL_MIXTURE_SAMPLE = """
WITH h AS (
    SELECT source,
           substr(md5(CAST(doc_id AS VARCHAR) || '#mix1'), 1, 8) AS hx
    FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM h
WHERE hx < CASE source WHEN 'src0' THEN 'g'
                       WHEN 'src1' THEN '40000000'
                       WHEN 'src2' THEN '80000000'
                       ELSE '19999999' END
GROUP BY source
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid accumulators: posexplode the vector,
    aggregate exact integer-quantized sums per (label, dim). The
    distributed form of centroid computation — one hash shuffle keyed by
    (label, dim); the caller divides sum/count for the float centroid."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode("embedding").alias("dim", "v")
        )
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("v").cast("double") * 10000).cast("long"))
            .alias("sum_q"),
        )
    )


SQL_LABEL_CENTROIDS = """
WITH flat AS (
    SELECT label,
           unnest(range(0, len(embedding))) AS dim,
           unnest(embedding) AS v
    FROM embeddings
)
SELECT label, CAST(dim AS INTEGER) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT)
           AS sum_q
FROM flat GROUP BY label, dim
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (dropDuplicates on (user, hour) over a file stream
    → per-user active-hour counts); oracle = batch COUNT(DISTINCT hour),
    proving micro-batch slicing doesn't change dedup semantics."""
    return streaming.stream_dedup_hours(spark, f"{sf_dir}/events.parquet")


SQL_STREAM_DEDUP = """
SELECT user_id,
       CAST(COUNT(DISTINCT
            (epoch_ns(ts) - ((epoch_ns(ts) % 3600000000000) + 3600000000000)
             % 3600000000000) // 3600000000000)
            AS BIGINT) AS n_active_hours
FROM events GROUP BY user_id
"""
# DuckDB integer `//` TRUNCATES toward zero (-7 // 2 = -3), so the positive
# remainder is subtracted first — the same compensation as SQL_EVENTS_HOURLY
# — to match the implementation's pmod-floor hour id for pre-1970 events.


def q_stream_dedup_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup (`stream_dedup_bounded`,
    dropDuplicatesWithinWatermark): with the watermark horizon covering
    the file's 30-day span, the drained result equals exact batch
    COUNT(DISTINCT hour) — same oracle as `stream_dedup`; the state
    eviction trade-off is pinned by a dedicated unit test."""
    return streaming.stream_dedup_bounded(
        spark, f"{sf_dir}/events.parquet", watermark="1440 hours"
    )


def q_salted_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe token frequency: `skew.salted_agg` two-phase aggregation
    (groupBy (token, salt) partials → re-aggregate) for hot tokens, top-20
    by count. The oracle computes the plain single-phase aggregate — a
    value-exact proof that salting is semantics-preserving."""
    from dataproc_spark import skew

    toks = _t(spark, sf_dir, "documents").select(
        F.explode(dedup.tokens("text")).alias("token")
    )
    counts = skew.salted_agg(
        toks, ["token"], {"n": F.count(F.lit(1))}, salt=8
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
        .select("token", F.col("n").cast("long").alias("n"), "rnk")
    )


SQL_SALTED_TOKEN_COUNTS = r"""
WITH toks AS (
    SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                              x -> x <> '')) AS token
    FROM documents
),
counts AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
ranked AS (
    SELECT token, n,
           ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rnk
    FROM counts
)
SELECT token, CAST(n AS BIGINT) AS n, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 20
"""


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document (exact-integer tf/df
    surrogate; first 50 docs to keep the gate output bounded)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return textstats.tfidf_top_terms(docs, k=3)


SQL_TFIDF_TOPK = r"""
WITH toks AS (
    SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS term
    FROM documents WHERE doc_id < 50
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
dfreq AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
),
scored AS (
    SELECT t.doc_id, t.term, t.tf, d.df,
           (t.tf * 1000000) // d.df AS score_m,
           ROW_NUMBER() OVER (
               PARTITION BY t.doc_id
               ORDER BY (t.tf * 1000000) // d.df DESC, t.term ASC
           ) AS rnk
    FROM tf t JOIN dfreq d USING (term)
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(score_m AS BIGINT) AS score_m, CAST(rnk AS INTEGER) AS rnk
FROM scored WHERE rnk <= 3
"""


def q_median_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median (lower median / percentile_disc style): the
    ((n+1) div 2)-th smallest token count per lang. Exact distributed
    quantiles via rank-selection — deterministic, unlike approx sketches;
    the picked *value* is tie-order independent."""
    docs = _t(spark, sf_dir, "documents")
    feats = docs.select("lang", F.size(dedup.tokens("text")).alias("n_tokens"))
    # Scale-safe exact quantile: aggregate to a (lang, value) HISTOGRAM
    # first — the shuffle is bounded by distinct values, and the window
    # sort below runs over that tiny histogram, never the raw rows. A
    # row_number window partitioned by lang would sort an entire
    # language's corpus on ONE task (English = one straggler at 100 TB).
    hist = feats.groupBy("lang", "n_tokens").agg(F.count(F.lit(1)).alias("_c"))
    w_cum = Window.partitionBy("lang").orderBy("n_tokens")
    w_all = Window.partitionBy("lang")
    return (
        hist.withColumn("_cum", F.sum("_c").over(w_cum))
        .withColumn("_n", F.sum("_c").over(w_all))
        .withColumn("_k", F.expr("(_n + 1) div 2"))
        # the value whose cumulative rank range [_cum - _c + 1, _cum]
        # covers the lower-median rank k — exactly one row per lang
        .where(
            (F.col("_cum") >= F.col("_k"))
            & (F.col("_cum") - F.col("_c") < F.col("_k"))
        )
        .select(
            "lang",
            F.col("n_tokens").alias("median_tokens"),
            F.col("_n").alias("n_docs"),
        )
    )


SQL_MEDIAN_TOKENS = r"""
WITH feats AS (
    SELECT lang,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS n_tokens
    FROM documents
),
ranked AS (
    SELECT lang, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS cnt
    FROM feats
)
SELECT lang, CAST(n_tokens AS INTEGER) AS median_tokens,
       CAST(cnt AS BIGINT) AS n_docs
FROM ranked WHERE rn = (cnt + 1) // 2
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing for LLM training batches: per-source
    in-order char-budget bins; reports per-bin fill. The greedy walk is
    sequential per group (applyInPandas), groups parallelize; the oracle
    replays the walk with a recursive CTE carrying (bin, fill) state."""
    from dataproc_spark.extensions import packing

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    packed = packing.pack_greedy(docs, size_col="n_chars", budget=1000)
    return packing.pack_stats(packed, size_col="n_chars")


SQL_PACK_SEQUENCES = """
WITH RECURSIVE d AS (
    SELECT source, doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents
),
walk AS (
    SELECT source, n_chars, rn, CAST(0 AS BIGINT) AS bin_id,
           CAST(n_chars AS BIGINT) AS acc
    FROM d WHERE rn = 1
    UNION ALL
    SELECT d.source, d.n_chars, d.rn,
           CASE WHEN w.acc > 0 AND w.acc + d.n_chars > 1000
                THEN w.bin_id + 1 ELSE w.bin_id END,
           CASE WHEN w.acc > 0 AND w.acc + d.n_chars > 1000
                THEN CAST(d.n_chars AS BIGINT) ELSE w.acc + d.n_chars END
    FROM walk w JOIN d ON d.source = w.source AND d.rn = w.rn + 1
)
SELECT source, bin_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
FROM walk GROUP BY source, bin_id
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ≥2
    3-grams with the held-out eval slice (doc_id % 100 == 0) — per train
    doc, how many eval docs it collides with and the worst overlap."""
    docs = _t(spark, sf_dir, "documents")
    evalset = docs.where(F.col("doc_id") % 100 == 0)
    train = docs.where(F.col("doc_id") % 100 != 0)
    pairs = dedup.contamination_pairs(train, evalset, n=3, min_shared=2)
    return pairs.groupBy("train_id").agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("shared").alias("max_shared"),
    )


SQL_DECONTAMINATE = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
sh AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(list_slice(t, i, i + 2), ' '))
             ELSE [] END)) AS s
    FROM toks
),
hits AS (
    SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id, COUNT(*) AS shared
    FROM sh tr JOIN sh ev ON tr.s = ev.s
    WHERE tr.doc_id % 100 <> 0 AND ev.doc_id % 100 = 0
    GROUP BY tr.doc_id, ev.doc_id
    HAVING COUNT(*) >= 2
)
SELECT train_id, CAST(COUNT(*) AS BIGINT) AS n_eval_matches,
       CAST(MAX(shared) AS BIGINT) AS max_shared
FROM hits GROUP BY train_id
"""


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram language-model table: corpus-wide bigram counts with the
    top-3 continuations per leading token (support ≥ 10). Explode →
    partial+final hash aggregate → partial top-k per w1.

    Shuffle-key audit (r6): unlike ``doc_novelty``/``ngram_jaccard``,
    the (w1, w2) strings ARE the output payload here — hashing the
    grouping key would not narrow the exchange because the strings must
    travel to the reducers anyway. Partial (map-side) aggregation
    already collapses repeats before the shuffle; raw keys are correct.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = dedup.tokens("text")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    counts = (
        docs.select(F.explode(bigrams).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 10)
    )
    w = Window.partitionBy("w1").orderBy(F.col("cnt").desc(), F.col("w2").asc())
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("w1", "w2", F.col("cnt").cast("long").alias("cnt"), "rnk")
    )


SQL_BIGRAM_LM = r"""
WITH toks AS (
    SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
bg AS (
    SELECT unnest(list_transform(range(1, len(t)),
                  i -> {'w1': t[i], 'w2': t[i + 1]})) AS b
    FROM toks WHERE len(t) >= 2
),
counts AS (
    SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS cnt
    FROM bg GROUP BY b.w1, b.w2 HAVING COUNT(*) >= 10
),
ranked AS (
    SELECT w1, w2, cnt,
           ROW_NUMBER() OVER (
               PARTITION BY w1 ORDER BY cnt DESC, w2 ASC
           ) AS rnk
    FROM counts
)
SELECT w1, w2, CAST(cnt AS BIGINT) AS cnt, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 3
"""


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink + source roundtrip (the LLM training-data interchange
    format): write documents metadata as JSON Lines, read it back with an
    explicit schema, aggregate. The oracle computes the same aggregate
    straight from parquet — the roundtrip must be the identity."""
    import tempfile

    from dataproc_spark.io import read_jsonl, write_jsonl

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    out = tempfile.mkdtemp(prefix="jsonl_")
    write_jsonl(docs, out)
    back = read_jsonl(
        spark, out,
        schema="doc_id long, lang string, source string, n_chars long",
    )
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


SQL_JSONL_ROUNDTRIP = """
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents GROUP BY lang, source
"""


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality filtering: C4/Gopher-style keep rules over the
    quality features, reported as kept/dropped counts per lang."""
    docs = textstats.quality_features(_t(spark, sf_dir, "documents"))
    kept = (
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 1000)
        & (F.col("mean_tok_len_c") >= 200)
        & (F.col("mean_tok_len_c") <= 900)
        & (F.col("digit_ratio_m") < 300)
    )
    return (
        docs.withColumn("kept", kept.cast("int"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("n_kept"),
        )
    )


SQL_QUALITY_FILTER = r"""
WITH feat AS (
    SELECT lang, length(text) AS n_chars,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
    FROM documents
),
feat2 AS (
    SELECT lang, n_tokens,
           CASE WHEN n_tokens > 0
                THEN CAST(FLOOR(((n_chars - n_tokens + 1) * 100.0) / n_tokens) AS BIGINT)
                ELSE 0 END AS mean_tok_len_c,
           CASE WHEN n_chars > 0
                THEN CAST(FLOOR((n_digits * 1000.0) / n_chars) AS BIGINT)
                ELSE 0 END AS digit_ratio_m
    FROM feat
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_tokens BETWEEN 10 AND 1000
                      AND mean_tok_len_c BETWEEN 200 AND 900
                      AND digit_ratio_m < 300
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM feat2 GROUP BY lang
"""


def q_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-layout roundtrip with pruning: write documents
    partitioned by lang, read back ONE partition directory (the scan
    touches only lang=en files — directory pruning, the 100 TB lever for
    selective reads), aggregate. Partition values come back from directory
    names; the oracle filters the flat parquet."""
    import tempfile

    from dataproc_spark.storage import write_partitioned

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    out = tempfile.mkdtemp(prefix="part_")
    write_partitioned(docs, out, ["lang"])
    back = spark.read.parquet(out).where(F.col("lang") == "en")
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
    )


SQL_PARTITIONED_SCAN = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc
FROM documents WHERE lang = 'en' GROUP BY source
"""


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source roundtrip (the other columnar interchange format
    Spark ships native support for); aggregate must equal the parquet
    side exactly."""
    import tempfile

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    out = tempfile.mkdtemp(prefix="orc_")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.max("doc_id").alias("max_doc"),
    )


SQL_ORC_ROUNDTRIP = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MAX(doc_id) AS max_doc
FROM documents GROUP BY lang
"""


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus prep pipeline as ONE lazy plan:
    quality filter (C4/Gopher rules) → exact dedup (min-id winner per
    content hash) → deterministic train/val/test split → per-(split, lang)
    corpus accounting. Composes four operator families; Catalyst fuses the
    map-side stages, and the only shuffles are the dedup aggregate and the
    final counts."""
    docs = _t(spark, sf_dir, "documents")
    feats = textstats.quality_features(docs)
    kept = feats.where(
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 1000)
        & (F.col("mean_tok_len_c") >= 200)
        & (F.col("mean_tok_len_c") <= 900)
        & (F.col("digit_ratio_m") < 300)
    )
    winners = dedup.exact_dedup(kept).select("doc_id")
    deduped = kept.join(maybe_broadcast(winners), "doc_id", "left_semi")
    split = sampling.hash_split(deduped, "doc_id", "prep")
    return split.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


SQL_CORPUS_PREP = r"""
WITH feat AS (
    SELECT doc_id, lang, text, n_chars, length(text) AS len_c,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
    FROM documents
),
feat2 AS (
    SELECT doc_id, lang, text, n_chars, n_tokens,
           CASE WHEN n_tokens > 0
                THEN CAST(FLOOR(((len_c - n_tokens + 1) * 100.0) / n_tokens) AS BIGINT)
                ELSE 0 END AS mean_tok_len_c,
           CASE WHEN len_c > 0
                THEN CAST(FLOOR((n_digits * 1000.0) / len_c) AS BIGINT)
                ELSE 0 END AS digit_ratio_m
    FROM feat
),
kept AS (
    SELECT doc_id, lang, text, n_chars FROM feat2
    WHERE n_tokens BETWEEN 10 AND 1000
      AND mean_tok_len_c BETWEEN 200 AND 900
      AND digit_ratio_m < 300
),
winners AS (
    SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)
),
dd AS (
    SELECT k.doc_id, k.lang, k.n_chars
    FROM kept k JOIN winners w ON k.doc_id = w.doc_id
),
sp AS (
    SELECT lang, n_chars,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#prep'), 1, 8)
                     < 'cccccccc' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#prep'), 1, 8)
                     < 'e6666666' THEN 'val'
                ELSE 'test' END AS split
    FROM dd
)
SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM sp GROUP BY split, lang
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via inverted-index join."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, min_shared=2,
        jaccard_threshold_m=100,
    )


SQL_NGRAM_JACCARD = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
sh AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(list_slice(t, i, i + 2), ' '))
             ELSE [] END)) AS s
    FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
shared AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
)
SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared,
       CAST((shared * 1000) // (sa.n + sb.n - shared) AS BIGINT) AS jaccard_m
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE (shared * 1000) // (sa.n + sb.n - shared) >= 100
"""


def q_ngram_jaccard_maxdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs with the ``max_df`` stop-shingle cut:
    shingles appearing in more than 4 documents are dropped before the
    inverted-index self-join (the quadratic-posting-list mitigation at
    100 TB — a shingle in d docs contributes d(d−1)/2 join rows), and
    Jaccard is computed over the pruned shingle universe. At sf0.01 the
    cutoff sits at the df distribution's p99, so the gate proves the
    pruning actually bites while both engines agree on the result."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, min_shared=2,
        jaccard_threshold_m=100, max_df=4,
    )


SQL_NGRAM_JACCARD_MAXDF = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
sh0 AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(list_slice(t, i, i + 2), ' '))
             ELSE [] END)) AS s
    FROM toks
),
hot AS (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) > 4),
sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
shared AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
)
SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared,
       CAST((shared * 1000) // (sa.n + sb.n - shared) AS BIGINT) AS jaccard_m
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE (shared * 1000) // (sa.n + sb.n - shared) >= 100
"""


def q_decontaminate_maxdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with the train-side ``max_df`` stop-shingle cut:
    3-grams in more than 3 TRAIN documents are dropped from both sides
    before the cross-corpus join (a train-hot shingle multiplies every
    eval doc containing it by its whole posting list)."""
    docs = _t(spark, sf_dir, "documents")
    evalset = docs.where(F.col("doc_id") % 100 == 0)
    train = docs.where(F.col("doc_id") % 100 != 0)
    pairs = dedup.contamination_pairs(
        train, evalset, n=3, min_shared=2, max_df=3
    )
    return pairs.groupBy("train_id").agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("shared").alias("max_shared"),
    )


SQL_DECONTAMINATE_MAXDF = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
sh AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(list_slice(t, i, i + 2), ' '))
             ELSE [] END)) AS s
    FROM toks
),
hot AS (
    SELECT s FROM sh WHERE doc_id % 100 <> 0 GROUP BY s HAVING COUNT(*) > 3
),
kept AS (SELECT * FROM sh WHERE s NOT IN (SELECT s FROM hot)),
hits AS (
    SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id, COUNT(*) AS shared
    FROM kept tr JOIN kept ev ON tr.s = ev.s
    WHERE tr.doc_id % 100 <> 0 AND ev.doc_id % 100 = 0
    GROUP BY tr.doc_id, ev.doc_id
    HAVING COUNT(*) >= 2
)
SELECT train_id, CAST(COUNT(*) AS BIGINT) AS n_eval_matches,
       CAST(MAX(shared) AS BIGINT) AS max_shared
FROM hits GROUP BY train_id
"""


def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM token budgeting: BPE-style pre-token counts per source."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(textstats.bpe_token_count().cast("long")).alias("sum_bpe_tokens"),
        F.max(textstats.bpe_token_count().cast("long")).alias("max_bpe_tokens"),
    )


SQL_BPE_TOKEN_STATS = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT) AS sum_bpe_tokens,
       CAST(MAX(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT) AS max_bpe_tokens
FROM documents GROUP BY source
"""


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming op (applyInPandasWithState).

    Oracle-checkable since r2: the interval-merge state is order-
    independent across micro-batches, so the drained result must equal the
    batch gap rule (``> gap → new session``) computed by plain SQL.
    """
    return streaming.stream_session_counts(spark, f"{sf_dir}/events.parquet")


# Batch-equivalent session counts: same 30-min strict-gap rule as the
# streaming interval merge (gap <= 30min joins, > 30min splits), so the
# drained stream must hash-match this regardless of micro-batch slicing.
SQL_STREAM_SESSIONS = """
WITH e AS (
    SELECT user_id, epoch_ns(ts) AS tns FROM events
),
flagged AS (
    SELECT user_id,
           CASE WHEN lag(tns) OVER w IS NULL THEN 1
                WHEN tns - lag(tns) OVER w > 1800000000000 THEN 1
                ELSE 0 END AS new_sess
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tns)
)
SELECT user_id,
       CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM flagged GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# embeddings (similarity search)
# ---------------------------------------------------------------------------


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 with a trained KMeans coarse quantizer (rows-only:
    cluster assignments depend on MLlib internals, not SQL-expressible)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 500 == 0)
    return simsearch.ivf_topk(emb, queries_df, k=5, cells=8)

def q_ann_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 with deterministic label cells and exact-integer centroid
    probing (n_probe=2) — the hash-checked twin of the KMeans `ann_ivf`."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 100 == 0)
    return simsearch.ivf_exact_topk(emb, queries_df, k=5, n_probe=2)


SQL_ANN_IVF_EXACT = """
WITH cd AS (
    SELECT label, vec_id,
           unnest(range(0, len(embedding))) AS dim,
           unnest(list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS cv
    FROM embeddings
),
cent AS (
    SELECT label, dim, SUM(cv) // COUNT(*) AS cq
    FROM cd GROUP BY label, dim
),
qd AS (
    SELECT vec_id AS qid, dim, cv AS qv FROM cd WHERE vec_id % 100 = 0
),
ps AS (
    SELECT qid, label, SUM(qv * cq) AS cscore
    FROM qd JOIN cent USING (dim) GROUP BY qid, label
),
probed AS (
    SELECT qid, label FROM (
        SELECT qid, label,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY cscore DESC, label ASC
               ) AS prnk
        FROM ps
    ) WHERE prnk <= 2
),
cand AS (
    SELECT p.qid, c.vec_id, SUM(q.qv * c.cv) AS dot_q
    FROM probed p
    JOIN cd c ON c.label = p.label
    JOIN qd q ON q.qid = p.qid AND q.dim = c.dim
    WHERE c.vec_id <> p.qid
    GROUP BY p.qid, c.vec_id
)
SELECT qid, vec_id, CAST(dot_q AS BIGINT) AS dot_q, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT qid, vec_id, dot_q,
           ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY dot_q DESC, vec_id ASC
           ) AS rnk
    FROM cand
) WHERE rnk <= 5
"""


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs within a coarse bucket, exact-int scores."""
    return simsearch.near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold_dot_q=300_000
    )


SQL_EMBED_NEAR_DUP = """
WITH q AS (
    SELECT vec_id, label,
           list_transform(embedding,
                          x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(list_dot_product(a.v, b.v) AS BIGINT) AS dot_q
FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE CAST(list_dot_product(a.v, b.v) AS BIGINT) >= 300000
"""


def q_embed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup over embeddings (SemDeDup-style): same-cell near-dup
    pairs above an exact-integer cosine-surrogate threshold → connected
    components → keep the smallest vec_id per component. The embedding
    counterpart of the text dedup family: drops semantically redundant
    items, not just lexically identical ones."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = simsearch.near_dup_pairs(emb, threshold_dot_q=300_000)
    return dedup.dedup_keep_representatives(
        emb.select("vec_id", "label"), pairs, id_col="vec_id"
    )


SQL_EMBED_DEDUP = """
WITH RECURSIVE q AS (
    SELECT vec_id, label,
           list_transform(embedding,
                          x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
),
pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE CAST(list_dot_product(a.v, b.v) AS BIGINT) >= 300000
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, lbl) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
losers AS (SELECT node FROM comp WHERE node <> component)
SELECT e.vec_id, e.label
FROM embeddings e
LEFT JOIN losers ON e.vec_id = losers.node
WHERE losers.node IS NULL
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-5 neighbors for sampled queries (int scores)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    return simsearch.brute_force_topk(emb, queries, k=5)


SQL_ANN_TOPK = """
WITH q AS (
    SELECT vec_id, list_transform(embedding,
                                  x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
),
scored AS (
    SELECT qs.vec_id AS qid, c.vec_id AS vec_id,
           CAST(list_dot_product(qs.v, c.v) AS BIGINT) AS dot_q
    FROM (SELECT * FROM q WHERE vec_id % 100 = 0) qs
    JOIN q c ON c.vec_id <> qs.vec_id
)
SELECT qid, vec_id, dot_q,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot_q DESC, vec_id) AS INTEGER) AS rnk
FROM scored
QUALIFY rnk <= 5
"""


def q_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed top-5 (probe = own label cell), exact-int scores."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    return simsearch.bucketed_topk(emb, queries, k=5)


SQL_ANN_BUCKETED = """
WITH q AS (
    SELECT vec_id, label, list_transform(embedding,
                                         x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
),
scored AS (
    SELECT qs.vec_id AS qid, c.vec_id AS vec_id,
           CAST(list_dot_product(qs.v, c.v) AS BIGINT) AS dot_q
    FROM (SELECT * FROM q WHERE vec_id % 100 = 0) qs
    JOIN q c ON c.label = qs.label AND c.vec_id <> qs.vec_id
)
SELECT qid, vec_id, dot_q,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot_q DESC, vec_id) AS INTEGER) AS rnk
FROM scored
QUALIFY rnk <= 5
"""


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: per-query recall@5 of the IVF path
    (deterministic cells, n_probe=2) against exact brute-force top-5 —
    the measurement loop every production ANN deployment needs to tune
    its n_probe/recall trade-off. Both sides are exact-integer and
    deterministic, so recall itself is value-checkable cross-engine.

    Plan: the two top-k frames join on (qid, vec_id) — both are ≤ k rows
    per query, so the recall join is a broadcast over tiny inputs no
    matter the corpus size."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 100 == 0)
    exact = simsearch.brute_force_topk(emb, queries_df, k=5).select(
        "qid", "vec_id"
    )
    approx = simsearch.ivf_exact_topk(
        emb, queries_df, k=5, n_probe=2
    ).select("qid", "vec_id")
    base = exact.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("k_eff")
    )
    hits = (
        exact.join(approx, ["qid", "vec_id"], "leftsemi")
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return base.join(hits, "qid", "left").select(
        "qid",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.expr("coalesce(n_hits, 0) * 1000 div k_eff")
        .cast("long")
        .alias("recall_m"),
    )


SQL_ANN_RECALL = """
WITH q AS (
    SELECT vec_id, list_transform(embedding,
                                  x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
),
exact AS (
    SELECT qid, vec_id FROM (
        SELECT qs.vec_id AS qid, c.vec_id AS vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY qs.vec_id
                   ORDER BY CAST(list_dot_product(qs.v, c.v) AS BIGINT) DESC,
                            c.vec_id
               ) AS rnk
        FROM (SELECT * FROM q WHERE vec_id % 100 = 0) qs
        JOIN q c ON c.vec_id <> qs.vec_id
    ) WHERE rnk <= 5
),
cd AS (
    SELECT label, vec_id,
           unnest(range(0, len(embedding))) AS dim,
           unnest(list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS cv
    FROM embeddings
),
cent AS (
    SELECT label, dim, SUM(cv) // COUNT(*) AS cq
    FROM cd GROUP BY label, dim
),
qd AS (
    SELECT vec_id AS qid, dim, cv AS qv FROM cd WHERE vec_id % 100 = 0
),
ps AS (
    SELECT qid, label, SUM(qv * cq) AS cscore
    FROM qd JOIN cent USING (dim) GROUP BY qid, label
),
probed AS (
    SELECT qid, label FROM (
        SELECT qid, label,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY cscore DESC, label ASC
               ) AS prnk
        FROM ps
    ) WHERE prnk <= 2
),
cand AS (
    SELECT p.qid, c.vec_id, SUM(q2.qv * c.cv) AS dot_q
    FROM probed p
    JOIN cd c ON c.label = p.label
    JOIN qd q2 ON q2.qid = p.qid AND q2.dim = c.dim
    WHERE c.vec_id <> p.qid
    GROUP BY p.qid, c.vec_id
),
ivf AS (
    SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY dot_q DESC, vec_id ASC
               ) AS rnk
        FROM cand
    ) WHERE rnk <= 5
),
base AS (SELECT qid, COUNT(*) AS k_eff FROM exact GROUP BY qid),
hits AS (
    SELECT e.qid, COUNT(*) AS n_hits
    FROM exact e JOIN ivf USING (qid, vec_id) GROUP BY e.qid
)
SELECT b.qid,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) * 1000 // b.k_eff AS BIGINT) AS recall_m
FROM base b LEFT JOIN hits h USING (qid)
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking (`corpus.chunk_documents`): each doc split
    into consecutive 64-token training chunks; map-only (explode over the
    chunk count, not the token count). The oracle re-derives every chunk
    via DuckDB list slicing — token boundaries, short final chunks, and
    empty-doc exclusion all value-checked."""
    from dataproc_spark.extensions import corpus

    return corpus.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=64
    )


SQL_CHUNK_DOCUMENTS = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
), nz AS (
    SELECT doc_id, t, CAST(ceil(len(t) / 64.0) AS INTEGER) AS n_chunks
    FROM toks WHERE len(t) > 0
), ex AS (
    SELECT doc_id, t, unnest(range(0, n_chunks)) AS chunk_id FROM nz
)
SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
       array_to_string(t[(chunk_id * 64 + 1):((chunk_id + 1) * 64)], ' ')
           AS chunk_text,
       CAST(len(t[(chunk_id * 64 + 1):((chunk_id + 1) * 64)]) AS INTEGER)
           AS n_tokens
FROM ex
"""


def q_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle (`corpus.shuffle_order`): every doc
    gets a reproducible (shard, pos) epoch coordinate from md5 — one hash
    shuffle + per-shard numbering, never a global sort. The oracle
    recomputes the same permutation in DuckDB (md5 is engine-portable),
    proving order is content-derived, not partitioning-derived."""
    from dataproc_spark.extensions import corpus

    return corpus.shuffle_order(
        _t(spark, sf_dir, "documents").select("doc_id", "source"),
        id_col="doc_id",
        salt="epoch0",
        n_shards=16,
    )


SQL_SHUFFLE_ORDER = """
WITH h AS (
    SELECT doc_id, source,
           substr(md5(CAST(doc_id AS VARCHAR) || '#epoch0'), 1, 8) AS hx
    FROM documents
)
SELECT doc_id, source,
       CAST(strpos('0123456789abcdef', substr(hx, 1, 1)) - 1 AS INTEGER)
           AS shard,
       CAST(ROW_NUMBER() OVER (
            PARTITION BY substr(hx, 1, 1) ORDER BY hx, doc_id
       ) - 1 AS BIGINT) AS pos
FROM h
"""


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build (`corpus.inverted_index`): term → (doc, tf,
    sorted 0-based positions) postings, min_tf=2 pruning the singleton
    tail. posexplode → one hash aggregate on the term; the oracle
    re-derives positions with generate_subscripts."""
    from dataproc_spark.extensions import corpus

    return corpus.inverted_index(
        _t(spark, sf_dir, "documents"), min_tf=2
    )


SQL_INVERTED_INDEX = r"""
WITH base AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
), toks AS (
    SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) - 1 AS pos
    FROM base
)
SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf,
       array_to_string(list_sort(list(pos)), ',') AS positions
FROM toks GROUP BY term, doc_id HAVING COUNT(*) >= 2
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (`corpus.redact_pii`): email/IPv4/digit-run tokens,
    map-only regexp chain. Emits md5 of the redacted text (compact exact
    comparison) + per-pattern counts; the oracle replays the same
    engine-portable regexes in DuckDB (RE2 vs Java regex parity is the
    thing being proven — patterns avoid lookbehind/backreferences)."""
    from dataproc_spark.extensions import corpus

    red = corpus.redact_pii(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return red.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("redacted_md5"),
        "n_emails",
        "n_ips",
        "n_numruns",
    )


SQL_REDACT_PII = r"""
SELECT doc_id,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
           '\d[\d\- ]{7,}\d', '<NUM>', 'g')) AS redacted_md5,
       CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
           AS n_emails,
       CAST(len(regexp_extract_all(text,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
       CAST(len(regexp_extract_all(text,
           '\d[\d\- ]{7,}\d')) AS INTEGER) AS n_numruns
FROM documents
"""


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-passage removal: strip every token inside a
    3-gram shared by ≥2 documents (boilerplate/license/navigation chrome)
    while keeping the documents themselves — the within-document
    counterpart of the whole-document dedup family (Lee et al.-style
    passage dedup, bounded to n-grams so it stays relational)."""
    from dataproc_spark.extensions import corpus

    return corpus.remove_repeated_spans(
        _t(spark, sf_dir, "documents"), n=3, min_df=2
    )


SQL_DEDUP_SPANS = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
g1 AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
               i -> {'pos': i - 1,
                     'g': array_to_string(list_slice(t, i, i + 2), ' ')})) AS s
    FROM toks WHERE len(t) >= 3
),
grams AS (SELECT doc_id, s.pos AS pos, s.g AS g FROM g1),
hot AS (
    SELECT g
    FROM (SELECT g, COUNT(DISTINCT doc_id) AS dfd FROM grams GROUP BY g)
    WHERE dfd >= 2
),
cov AS (
    SELECT DISTINCT gr.doc_id, gr.pos + o.d AS cpos
    FROM grams gr
    JOIN hot USING (g)
    CROSS JOIN (SELECT unnest(range(0, 3)) AS d) o
),
covl AS (SELECT doc_id, list(cpos) AS cl FROM cov GROUP BY doc_id)
SELECT t.doc_id,
       CAST(COALESCE(len(c.cl), 0) AS BIGINT) AS n_removed,
       -- COALESCE: array_to_string([]) is NULL in DuckDB where Spark's
       -- array_join([]) is '' (fully-boilerplate docs hit this)
       COALESCE(array_to_string(
           list_transform(
               list_filter(range(1, len(t.t) + 1),
                           i -> c.cl IS NULL OR NOT list_contains(c.cl, i - 1)),
               i -> t.t[i]),
           ' '), '') AS text_clean
FROM toks t LEFT JOIN covl c USING (doc_id)
"""


def q_select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted corpus selection: keep the highest-quality documents whose
    cumulative token count fits a global training budget (here 20 000
    tokens; quality = alphabetic-character permille, ties by doc_id) —
    the data-selection step between scoring and training.

    Semantics are ONE cumulative window ordered (score desc, doc_id asc);
    the oracle states exactly that. ``analytics.select_under_budget``
    decomposes it scale-safely (histogram running total + per-bucket
    windows — no global sort of raw documents; plan shape pinned by
    test)."""
    from dataproc_spark.extensions.analytics import select_under_budget

    docs = _t(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        F.size(dedup.tokens("text")).cast("long").alias("n_tokens"),
        F.expr(
            "CASE WHEN length(text) > 0 THEN"
            " (length(regexp_replace(text, '[^A-Za-z]', '')) * 1000)"
            " div length(text) ELSE 0 END"
        )
        .cast("long")
        .alias("score_m"),
    )
    return select_under_budget(feats, budget=20_000).withColumnRenamed(
        "cum_weight", "cum_tokens"
    )


SQL_SELECT_TOKEN_BUDGET = r"""
WITH feats AS (
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS n_tokens,
           CASE WHEN len(text) > 0
                THEN (len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000)
                     // len(text)
                ELSE 0 END AS score_m
    FROM documents
),
cum AS (
    SELECT doc_id, score_m, n_tokens,
           SUM(n_tokens) OVER (
               ORDER BY score_m DESC, doc_id ASC ROWS UNBOUNDED PRECEDING
           ) AS cum_tokens
    FROM feats
)
SELECT doc_id, CAST(score_m AS BIGINT) AS score_m,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM cum WHERE cum_tokens <= 20000
"""


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative novelty score: the fraction of a document's
    distinct bigrams that appear in fewer than 3 documents (in exact
    integer permille). High novelty flags gibberish/noise (bigrams no
    other document uses); low novelty flags boilerplate — the
    integer-exact, cross-engine-checkable stand-in for the perplexity
    filters (CCNet-style) whose float log-probs can't hash-match across
    engines. One map-only bigram explode + one df aggregate + one
    per-doc aggregate; docs with no bigrams are excluded (undefined
    score). Implementation: ``textstats.rare_bigram_stats``."""
    return textstats.rare_bigram_stats(
        _t(spark, sf_dir, "documents"), min_df=3
    )


SQL_DOC_NOVELTY = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
    FROM documents
),
bg AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(1, len(t)),
               i -> array_to_string(list_slice(t, i, i + 1), ' ')))) AS bg
    FROM toks WHERE len(t) >= 2
),
dfc AS (SELECT bg, COUNT(*) AS dfd FROM bg GROUP BY bg)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN dfd < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       CAST(SUM(CASE WHEN dfd < 3 THEN 1 ELSE 0 END) * 1000 // COUNT(*)
            AS BIGINT) AS novelty_m
FROM bg JOIN dfc USING (bg)
GROUP BY doc_id
"""


def q_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: decile buckets of document length within each
    language (NTILE semantics under a total order — deterministic in any
    engine), then per-(lang, decile) counts and length ranges. The
    data-ordering step for curriculum / length-bucketed training schedules.

    Scale-safe exact plan: rather than `ntile` over the raw rows (which
    sorts an entire language on ONE task), aggregate to a (lang, n_chars)
    histogram, window over that tiny histogram to get each value's rank
    range, and intersect the range with NTILE's closed-form bucket
    boundaries (first n%10 buckets get n div 10 + 1 rows). The per-decile
    count/min/max depend only on how many rows of each value fall in each
    decile, so the result is bit-identical to raw-row NTILE regardless of
    the doc_id tie order.
    """
    docs = _t(spark, sf_dir, "documents")
    hist = (
        docs.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("_c"))
    )
    w_cum = Window.partitionBy("lang").orderBy("n_chars")
    w_all = Window.partitionBy("lang")
    spans = (
        hist.withColumn("_hi", F.sum("_c").over(w_cum))
        .withColumn("_lo", F.col("_hi") - F.col("_c") + 1)
        .withColumn("_n", F.sum("_c").over(w_all))
    )
    d = F.col("decile")
    q_sz = F.expr("_n div 10")
    rem = F.expr("_n % 10")
    bucket_start = (d - 1) * q_sz + F.least(d - 1, rem) + 1
    bucket_end = d * q_sz + F.least(d, rem)
    overlap = (
        F.least(F.col("_hi"), bucket_end)
        - F.greatest(F.col("_lo"), bucket_start)
        + 1
    )
    return (
        spans.withColumn("decile", F.explode(F.sequence(F.lit(1), F.lit(10))))
        .withColumn("_ov", overlap)
        .where(F.col("_ov") > 0)
        .groupBy("lang", "decile")
        .agg(
            F.sum("_ov").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


SQL_CURRICULUM_BINS = """
WITH b AS (
    SELECT lang, n_chars,
           NTILE(10) OVER (
               PARTITION BY lang ORDER BY n_chars, doc_id
           ) AS decile
    FROM documents
)
SELECT lang, CAST(decile AS INTEGER) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM b GROUP BY lang, decile
"""


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (`streaming.stream_static_enrich`): the
    events stream joined to the broadcast customer dimension, aggregated
    per market segment; availableNow drain must equal the batch
    join+aggregate (the oracle)."""
    return streaming.stream_static_enrich(
        spark,
        f"{sf_dir}/events.parquet",
        _t(spark, sf_dir, "customer"),
    )


SQL_STREAM_ENRICH = """
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_c
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream attribution join (`streaming.stream_stream_join`):
    purchases ⋈ same-user clicks within the preceding hour, BOTH sides
    streaming with watermarks + a time-range condition bounding join
    state. Append-mode drain must equal the batch join (the oracle —
    µs-precision time arithmetic both engines)."""
    return streaming.stream_stream_join(
        spark, f"{sf_dir}/events.parquet", gap_hours=1
    )


SQL_STREAM_STREAM_JOIN = """
WITH ev AS (
    SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS tus
    FROM events
)
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
       CAST(p.tus - c.tus AS BIGINT) AS delta_us
FROM ev p JOIN ev c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.tus >= p.tus - 3600000000 AND c.tus <= p.tus
"""


def q_events_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per user, the running count/sum of events in
    the PRECEDING HOUR of event time (``rangeBetween`` on the µs epoch —
    a value-based frame, not a row-count frame; peers with equal
    timestamps share one frame in both engines). The rate/rolling-feature
    window shape that ROWS frames cannot express."""
    ev = _t(spark, sf_dir, "events")
    tus = F.expr("(ts - pmod(ts, 1000)) div 1000")
    base = ev.select(
        "user_id",
        "event_id",
        tus.alias("tus"),
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-3_600_000_000, 0)
    )
    return base.select(
        "user_id",
        "event_id",
        "tus",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum("value_c").over(w).alias("sum_1h"),
    )


SQL_EVENTS_RANGE_WINDOW = """
WITH base AS (
    SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus,
           CAST(round(value * 100) AS BIGINT) AS value_c
    FROM events
)
SELECT user_id, event_id, CAST(tus AS BIGINT) AS tus,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(value_c) OVER w AS BIGINT) AS sum_1h
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY tus
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def q_cube_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (lang, source): all four aggregation
    granularities in one pass (the OLAP materialization shape; rollup is
    already gated — cube adds the cross-hierarchy cells)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.cube("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        F.grouping_id().cast("long").alias("gid"),
    )


SQL_CUBE_DOC_STATS = """
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS gid
FROM documents
GROUP BY CUBE (lang, source)
"""


def q_merge_schema_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution: two parquet file sets with DIFFERENT schemas
    (the second adds a ``lang`` column) unified by ``mergeSchema`` —
    rows from the narrow files surface null lang. The append-only
    corpus-growth pattern (new crawls add columns; old files stay).
    The oracle recomputes the union from the documents view."""
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    # per-run directory: a fixed shared path would let two concurrent
    # runs overwrite each other's files mid-scan
    out = tempfile.mkdtemp(prefix="dataproc_evo_")
    old = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars")
    new = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", "n_chars", "lang"
    )
    old.write.mode("overwrite").parquet(f"{out}/old")
    new.write.mode("overwrite").parquet(f"{out}/new")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/old", f"{out}/new"
    )
    # label by file-set parity, NOT coalesce: a value-null lang in the
    # wide files must stay null (the oracle's CASE keeps it null), while
    # coalesce would fold it into the schema-absent group
    return merged.groupBy(
        F.when(F.col("doc_id") % 2 == 0, F.lit("<pre-schema>"))
        .otherwise(F.col("lang"))
        .alias("lang")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
    )


SQL_MERGE_SCHEMA_SCAN = """
SELECT CASE WHEN doc_id % 2 = 0 THEN '<pre-schema>' ELSE lang END AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer PageRank (`graph.pagerank`) over the bipartite
    supplier↔part graph from lineitem (both directions, distinct edges),
    5 synchronous rounds. All-integer floor arithmetic makes the
    iteration bit-reproducible: the oracle replays the SAME five rounds
    as chained DuckDB CTEs — an iterative algorithm value-checked
    cross-engine, not just rows-counted."""
    from dataproc_spark.extensions import graph

    li = _t(spark, sf_dir, "lineitem")
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    p = F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
    edges = li.select(s.alias("src"), p.alias("dst")).union(
        li.select(p.alias("src"), s.alias("dst"))
    )
    return graph.pagerank(edges, n_iter=5)


def _pagerank_oracle_sql(n_iter: int = 5) -> str:
    base, num, den = 150000, 85, 100
    ctes = [
        """edges AS (
    SELECT DISTINCT src, dst FROM (
        SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
               'p' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem
        UNION ALL
        SELECT 'p' || CAST(l_partkey AS VARCHAR) AS src,
               's' || CAST(l_suppkey AS VARCHAR) AS dst FROM lineitem
    )
)""",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        "pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(n_iter):
        ctes.append(f"""pr{i + 1} AS (
    SELECT n.node,
           CAST({base} + (COALESCE(c.s, 0) * {num}) // {den} AS BIGINT) AS rank
    FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, SUM(p.rank // d.deg) AS s
        FROM edges e
        JOIN pr{i} p ON e.src = p.node
        JOIN outdeg d ON e.src = d.src
        GROUP BY e.dst
    ) c ON n.node = c.node
)""")
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank FROM pr{n_iter}"
    )


SQL_PAGERANK = _pagerank_oracle_sql(5)


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source roundtrip with RFC-4180 quoting (quoteAll +
    doubled-quote escape): free text with spaces/punctuation must survive
    byte-exact. Emits md5 of the text for compact exact comparison; the
    oracle reads the same md5 straight from parquet — the roundtrip must
    be the identity."""
    import tempfile

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    out = tempfile.mkdtemp(prefix="csv_rt_")
    (
        docs.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(out)
    )
    back = (
        spark.read.schema("doc_id long, text string, lang string")
        .option("header", True)
        .option("escape", '"')
        .csv(out)
    )
    return back.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        "lang",
    )


SQL_CSV_ROUNDTRIP = """
SELECT doc_id, md5(text) AS text_md5, lang FROM documents
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join (`skew.salted_join`): lineitem ⋈ orders on the
    order key with the left side scattered across 8 salt buckets and the
    right side replicated into each — then aggregated per order priority.
    The oracle computes the PLAIN join + aggregate: a value-exact proof
    that salting is semantics-preserving (the same guarantee the
    `salted_token_counts` gate gives for salted aggregation)."""
    from dataproc_spark import skew

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("rev_c"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    joined = skew.salted_join(li, orders, on=["okey"], salt=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("rev_c").alias("sum_rev_c"),
    )


SQL_SALTED_JOIN = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS sum_rev_c
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def q_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation (`approx.count_min_sketch` /
    `count_min_estimate`): build the 4×512 sketch over document tokens in
    one pass, then estimate the 20 most frequent tokens. md5-derived
    buckets make the sketch deterministic, so the oracle rebuilds the
    IDENTICAL sketch in DuckDB and the estimates value-match — an
    approximate structure with an exact cross-engine gate."""
    from dataproc_spark.extensions import approx

    toks = _t(spark, sf_dir, "documents").select(
        F.explode(dedup.tokens("text")).alias("token")
    )
    sketch = approx.count_min_sketch(toks, "token")
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
    )
    est = approx.count_min_estimate(sketch, top.select("token"), "token")
    return top.join(est, "token").select("token", "n", "est")


SQL_COUNT_MIN = r"""
WITH toks AS (
    SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                              x -> x <> '')) AS token
    FROM documents
), cells AS (
    SELECT token, d,
           CAST('0x' || substr(md5(token || '#cms' || CAST(d AS VARCHAR)),
                               1, 8) AS BIGINT) % 512 AS bucket
    FROM toks, unnest([0, 1, 2, 3]) AS u(d)
), sketch AS (
    SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM cells GROUP BY d, bucket
), top AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM toks GROUP BY token
    ORDER BY n DESC, token ASC LIMIT 20
), probes AS (
    SELECT t.token, t.n, u.d,
           CAST('0x' || substr(md5(t.token || '#cms' || CAST(u.d AS VARCHAR)),
                               1, 8) AS BIGINT) % 512 AS bucket
    FROM top t, unnest([0, 1, 2, 3]) AS u(d)
)
SELECT p.token, p.n, CAST(MIN(s.cnt) AS BIGINT) AS est
FROM probes p JOIN sketch s ON p.d = s.d AND p.bucket = s.bucket
GROUP BY p.token, p.n
"""


def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-filter (`approx.bloom_build` /
    `bloom_may_contain`): the blocklist is every doc fingerprint with
    doc_id % 7 == 0; all documents probe the 8192-bit filter. Members
    must always test true (no false negatives); non-member results
    reproduce exactly cross-engine because the md5 bit positions do —
    the oracle rebuilds the identical bitset in DuckDB."""
    from dataproc_spark.extensions import approx

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("fp")
    )
    blocked = docs.where(F.col("doc_id") % 7 == 0).select("fp")
    bloom = approx.bloom_build(blocked, "fp")
    probed = approx.bloom_may_contain(bloom, docs.select("fp"), "fp")
    return (
        docs.join(probed, "fp")
        .select("doc_id", "may_contain")
    )


SQL_BLOOM_FILTER = """
WITH docs AS (
    SELECT doc_id, md5(text) AS fp FROM documents
), pos AS (
    SELECT CAST('0x' || substr(md5(fp || '#bloom' || CAST(i AS VARCHAR)),
                               1, 8) AS BIGINT) % 8192 AS p
    FROM docs, unnest([0, 1, 2]) AS u(i)
    WHERE doc_id % 7 = 0
), bloom AS (
    SELECT p // 63 AS word, bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER))
               AS bits
    FROM pos GROUP BY p // 63
), probes AS (
    SELECT d.doc_id,
           CAST('0x' || substr(md5(d.fp || '#bloom' || CAST(u.i AS VARCHAR)),
                               1, 8) AS BIGINT) % 8192 AS p
    FROM docs d, unnest([0, 1, 2]) AS u(i)
)
SELECT pr.doc_id,
       CAST(MIN((COALESCE(b.bits, 0) >> CAST(pr.p % 63 AS INTEGER)) & 1) = 1
            AS BOOLEAN) AS may_contain
FROM probes pr LEFT JOIN bloom b ON pr.p // 63 = b.word
GROUP BY pr.doc_id
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change) run through the ``spark.sql``
    SURFACE, not the DataFrame API: the table registers as a temp view and
    the query is a SQL string — proving the engine's second public API
    front-end produces gate-identical plans/results. Discount bounds
    compare on exact integer cents (`round(x*100)`), never raw float
    thresholds."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_v")
    return spark.sql("""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100)
                        AS BIGINT)) AS BIGINT) AS revenue_c,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem_v
        WHERE l_shipdate >= TIMESTAMP_NTZ '1994-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP_NTZ '1995-01-01 00:00:00'
          AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24
    """)


SQL_TPCH_Q6 = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style (order priority checking) through the ``spark.sql``
    front-end: a correlated EXISTS subquery with a NON-EQUI predicate
    referencing the outer row (``l_shipdate > o_orderdate + 200 days`` —
    the testdata carries no l_commitdate/l_receiptdate, so "late" is
    defined against the order date). Catalyst decorrelates the EXISTS
    into a left-semi join; the date literal shape follows ``tpch_q6``.
    Ref parity: exercises the SQL-string API surface (reference
    `selectivesearch.py` exposes a query front-end; the SQL surface is
    this engine's second public API)."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders_v
        WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP_NTZ '1996-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem_v
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL '200' DAY
          )
        GROUP BY o_orderpriority
    """)


SQL_TPCH_Q4 = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 200 DAY)
GROUP BY o_orderpriority
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping) through the ``spark.sql`` front-end:
    six-table join with a symmetric two-nation disjunction and a
    per-year rollup. Revenue is summed as exact integer cents
    (per-item ROUND(x*100)) so the result hash-matches across engines.
    The nation pair keeps both join directions live (neither side can
    be pre-filtered away), exercising join reordering over the
    disjunction."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(volume_c) AS BIGINT) AS revenue_c
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) AS volume_c
            FROM supplier_v, lineitem_v, orders_v, customer_v,
                 nation_v n1, nation_v n2
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """)


SQL_TPCH_Q7 = """
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume_c) AS BIGINT) AS revenue_c
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS volume_c
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name='NATION_1' AND n2.n_name='NATION_2')
      OR (n1.n_name='NATION_2' AND n2.n_name='NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
) shipping GROUP BY 1, 2, 3
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share) through the ``spark.sql``
    front-end: eight-table join, nation twice in different roles
    (customer region membership vs supplier nationality), and a
    conditional-aggregate ratio. The share is exact integer permille —
    ``sum(case…)*1000 div sum(all)`` over integer cents — because a
    float ratio could not hash-match across engines."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT o_year,
               CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume_c
                             ELSE 0 END) * 1000 div SUM(volume_c)
                    AS BIGINT) AS mkt_share_m
        FROM (
            SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) AS volume_c,
                   n2.n_name AS nation
            FROM part_v, supplier_v, lineitem_v, orders_v, customer_v,
                 nation_v n1, nation_v n2, region_v
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey
              AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
              AND s_nationkey = n2.n_nationkey AND p_type = 'PROMO'
              AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
        ) all_nations
        GROUP BY o_year
    """)


SQL_TPCH_Q8 = """
SELECT o_year, CAST(SUM(CASE WHEN nation='NATION_3' THEN volume_c ELSE 0 END) * 1000
                // SUM(volume_c) AS BIGINT) AS mkt_share_m
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS volume_c,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
    AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
    AND s_nationkey = n2.n_nationkey AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
) all_nations GROUP BY o_year
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution) through the
    ``spark.sql`` front-end: LEFT OUTER JOIN with an extra non-key join
    predicate (the outer-join aggregate shape the prior SQL set didn't
    exercise), then a distribution-of-counts double aggregate.
    Customers with zero qualifying orders land in the c_count=0 bucket
    via the preserved null side."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer_v LEFT OUTER JOIN orders_v
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """)


SQL_TPCH_Q13 = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders GROUP BY c_count
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style (small-quantity-order revenue) through the
    ``spark.sql`` front-end: TWO correlated scalar subqueries against
    the same inner table (sum and count of the part's lineitems) —
    Catalyst decorrelates each into an aggregate + join. The threshold
    ``q < 0.2 * avg(q)`` is cross-multiplied to exact integers
    (``5*q*cnt < sum``; l_quantity is integral) so no float average is
    ever compared."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    div 7 AS BIGINT) AS avg_yearly_c,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem_v, part_v
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#4' AND p_type = 'PROMO'
          AND CAST(l_quantity AS BIGINT) * 5 *
              (SELECT COUNT(*) FROM lineitem_v l2
               WHERE l2.l_partkey = p_partkey)
              < (SELECT SUM(CAST(l2.l_quantity AS BIGINT))
                 FROM lineitem_v l2 WHERE l2.l_partkey = p_partkey)
    """)


SQL_TPCH_Q17 = """
WITH agg AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_q, COUNT(*) AS cnt_q
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) // 7 AS BIGINT)
           AS avg_yearly_c,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey JOIN agg USING (l_partkey)
WHERE p_brand = 'Brand#4' AND p_type = 'PROMO'
  AND CAST(l_quantity AS BIGINT) * 5 * cnt_q < sum_q
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style (suppliers who kept orders waiting) through the
    ``spark.sql`` front-end: the EXISTS + NOT EXISTS pair over the same
    inner table with correlated NON-EQUI predicates referencing TWO
    outer tables (l1 and orders) — the hardest decorrelation shape in
    the set. "Late" is ``l_shipdate > o_orderdate + 200 days`` (no
    commit/receipt dates in the testdata); the answer is each suspect
    nation's suppliers who were the ONLY late supplier on a finished
    multi-supplier order."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier_v, lineitem_v l1, orders_v, nation_v
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL '200' DAY
          AND EXISTS (
              SELECT 1 FROM lineitem_v l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem_v l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o_orderdate + INTERVAL '200' DAY
          )
          AND s_nationkey = n_nationkey
          AND n_name IN ('NATION_3', 'NATION_5', 'NATION_7')
        GROUP BY s_name
    """)


SQL_TPCH_Q21 = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate + INTERVAL 200 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate > o_orderdate + INTERVAL 200 DAY)
  AND s_nationkey = n_nationkey AND n_name IN ('NATION_3','NATION_5','NATION_7')
GROUP BY s_name
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style (global sales opportunity) through the
    ``spark.sql`` front-end: two uncorrelated scalar subqueries (the
    positive-balance sum and count, cross-multiplied so no float
    average is compared) plus a NOT EXISTS anti-join against recent
    orders. Country code is ``c_nationkey % 10`` (the testdata has no
    phone column); "no recent orders" replaces "no orders" because
    every testdata customer has at least one order."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
        FROM (
            SELECT c_nationkey % 10 AS cntrycode,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c,
                   c_custkey
            FROM customer_v
            WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5, 6, 7)
        ) c
        WHERE bal_c * (SELECT COUNT(*) FROM customer_v WHERE c_acctbal > 0.0)
              > (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                 FROM customer_v WHERE c_acctbal > 0.0)
          AND NOT EXISTS (
              SELECT 1 FROM orders_v o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP_NTZ '1999-01-01 00:00:00'
          )
        GROUP BY cntrycode
    """)


SQL_TPCH_Q22 = """
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
FROM (
  SELECT c_nationkey % 10 AS cntrycode,
         CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c, c_custkey
  FROM customer WHERE c_nationkey % 10 IN (1,2,3,4,5,6,7)
) c
WHERE bal_c * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
      > (SELECT SUM(CAST(ROUND(c_acctbal*100) AS BIGINT))
         FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY cntrycode
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style (returned item reporting) through the ``spark.sql``
    front-end: four-table join, quarter filter, returned-item revenue per
    customer, top-20 with a DETERMINISTIC total order (revenue desc, then
    custkey — a bare LIMIT over a float sort could not hash-match across
    engines). Revenue is exact integer cents; address/phone/comment
    columns do not exist in the testdata and are dropped from the
    projection."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS revenue_c,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_c,
               n_name
        FROM customer_v, orders_v, lineitem_v, nation_v
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP_NTZ '1996-04-01 00:00:00'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue_c DESC, c_custkey
        LIMIT 20
    """)


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
            AS BIGINT) AS revenue_c,
       CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_c DESC, c_custkey
LIMIT 20
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style (shipping mode / priority) through the
    ``spark.sql`` front-end: the join + dual conditional-count shape.
    The testdata has no l_shipmode/l_commitdate/l_receiptdate, so the
    grouping key is ``l_returnflag`` and "late" is
    ``l_shipdate > o_orderdate + 150 days`` (same adaptation as
    ``tpch_q4``); high/low priority is the URGENT+HIGH split of the
    original."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders_v, lineitem_v
        WHERE o_orderkey = l_orderkey
          AND l_shipdate > o_orderdate + INTERVAL '150' DAY
          AND l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'
        GROUP BY l_returnflag
    """)


SQL_TPCH_Q12 = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate > o_orderdate + INTERVAL 150 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect) through the ``spark.sql`` front-end:
    lineitem⋈part with a one-month shipdate window and a conditional
    revenue ratio. The share is exact integer permille
    (``sum(case…)*1000 div sum(all)`` over integer cents, the
    ``tpch_q8`` device) because a float percentage could not hash-match
    across engines; the testdata's p_type carries the bare 'PROMO'
    token, so equality replaces the LIKE 'PROMO%%' prefix test."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END)
                    * 1000 div SUM(rev_c) AS BIGINT) AS promo_share_m,
               CAST(SUM(rev_c) AS BIGINT) AS revenue_c
        FROM (
            SELECT p_type,
                   CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) AS rev_c
            FROM lineitem_v, part_v
            WHERE l_partkey = p_partkey
              AND l_shipdate >= TIMESTAMP_NTZ '1996-09-01 00:00:00'
              AND l_shipdate <  TIMESTAMP_NTZ '1996-10-01 00:00:00'
        ) promo
    """)


SQL_TPCH_Q14 = """
SELECT CAST(SUM(CASE WHEN p_type='PROMO' THEN rev_c ELSE 0 END) * 1000
            // SUM(rev_c) AS BIGINT) AS promo_share_m,
       CAST(SUM(rev_c) AS BIGINT) AS revenue_c
FROM (
  SELECT p_type, CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS rev_c
  FROM lineitem, part
  WHERE l_partkey = p_partkey
    AND l_shipdate >= TIMESTAMP '1996-09-01'
    AND l_shipdate <  TIMESTAMP '1996-10-01'
) promo
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier) through the ``spark.sql`` front-end: the
    original's revenue VIEW becomes a CTE referenced twice — once joined
    to supplier, once inside the scalar MAX subquery (Catalyst evaluates
    the aggregate subtree twice; at cluster scale the CTE is cheap
    relative to a cache round-trip). Revenue is exact integer cents so
    the MAX comparison is never a float equality."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) AS BIGINT)
                       AS total_revenue_c
            FROM lineitem_v
            WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP_NTZ '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue_c
        FROM supplier_v, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue_c = (SELECT MAX(total_revenue_c) FROM revenue)
    """)


SQL_TPCH_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
              AS BIGINT) AS total_revenue_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_c
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue_c = (SELECT MAX(total_revenue_c) FROM revenue)
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer) through the ``spark.sql``
    front-end: IN over a grouped-HAVING subquery on the same fact table
    that is also re-joined and re-aggregated outside — Catalyst plans
    the subquery as a left-semi join against the aggregate. Threshold
    300 sits near the testdata's 99.9th percentile of per-order
    quantity (the original's 300-of-~350 proportion). Quantities are
    integral doubles, summed then cast."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT c_name, c_custkey, o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_c,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        FROM customer_v, orders_v, lineitem_v
        WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem_v
                GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
            )
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
    """)


SQL_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_c,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue) through the ``spark.sql``
    front-end: the three-branch disjunction of conjunctive brand ×
    size × quantity ranges over lineitem⋈part. Only ``p_partkey =
    l_partkey`` is common to all branches, so Catalyst must keep the
    equi-join and evaluate the disjunction as a residual filter —
    the shape that breaks naive predicate pushdown. Shipmode /
    shipinstruct conjuncts don't exist in the testdata and are
    dropped; brands map onto the testdata's Brand#N domain."""
    register_tables(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS revenue_c,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem_v, part_v
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#7'  AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 30))
    """)


SQL_TPCH_Q19 = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
            AS BIGINT) AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand='Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand='Brand#7'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand='Brand#12' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))
"""


#: Derived partsupp: the testdata ships no partsupp table, so the five
#: TPC-H queries that need one (Q2/Q9/Q11/Q16/Q20) run over a
#: DETERMINISTIC derivation — 4 suppliers per part, availqty and
#: supplycost as integer formulas of (partkey, k) — built identically
#: as a Spark temp view and as a DuckDB CTE, so the oracle checks the
#: full query shape over the same rows.
_PARTSUPP_BODY = """
SELECT p_partkey AS ps_partkey,
       CAST((p_partkey + k * 7 + 1) %% (SELECT COUNT(*) FROM supplier{sfx})
            AS BIGINT) AS ps_suppkey,
       CAST((p_partkey * 7 + k * 13) %% 9999 + 1 AS BIGINT) AS ps_availqty,
       CAST((p_partkey * 31 + k * 17) %% 100000 + 1 AS BIGINT)
           AS ps_supplycost_c
FROM ({exploded})
"""

# the 4-way expansion is a LATERAL explode in the projection, not a
# cross join against a 4-row relation — the latter plans as a
# BroadcastNestedLoopJoin, which the registry's plan guard forbids
SPARK_PARTSUPP = _PARTSUPP_BODY.format(
    sfx="_v",
    exploded="SELECT p_partkey, explode(sequence(0, 3)) AS k FROM part_v",
).replace("%%", "%")
DUCK_PARTSUPP_CTE = "partsupp AS (" + _PARTSUPP_BODY.format(
    sfx="",
    exploded="SELECT p_partkey, unnest(range(0, 4)) AS k FROM part",
).replace("%%", "%") + ")"


def register_partsupp(spark: SparkSession, sf_dir: str) -> None:
    """`register_tables` + the derived ``partsupp_v`` view (see
    :data:`_PARTSUPP_BODY`)."""
    register_tables(spark, sf_dir)
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW partsupp_v AS {SPARK_PARTSUPP}")


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) through the ``spark.sql``
    front-end over the derived partsupp: the correlated scalar MIN
    subquery re-joins four tables inside the correlation — the widest
    decorrelation in the set. Deterministic top-100 (acctbal desc,
    nation, supplier, part); mfgr/address/phone/comment columns do not
    exist in the testdata and LIKE '%BRASS' becomes p_type equality."""
    register_partsupp(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(ROUND(s_acctbal * 100) AS BIGINT) AS acctbal_c,
               s_name, n_name, p_partkey
        FROM part_v, supplier_v, partsupp_v, nation_v, region_v
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_size = 15 AND p_type = 'PROMO'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND ps_supplycost_c = (
              SELECT MIN(ps2.ps_supplycost_c)
              FROM partsupp_v ps2, supplier_v s2, nation_v n2, region_v r2
              WHERE p_partkey = ps2.ps_partkey
                AND s2.s_suppkey = ps2.ps_suppkey
                AND s2.s_nationkey = n2.n_nationkey
                AND n2.n_regionkey = r2.r_regionkey
                AND r2.r_name = 'EUROPE')
        ORDER BY acctbal_c DESC, n_name, s_name, p_partkey
        LIMIT 100
    """)


SQL_TPCH_Q2 = f"""
WITH {DUCK_PARTSUPP_CTE}
SELECT CAST(ROUND(s_acctbal * 100) AS BIGINT) AS acctbal_c,
       s_name, n_name, p_partkey
FROM part, supplier, partsupp, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = 15 AND p_type = 'PROMO'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost_c = (
      SELECT MIN(ps2.ps_supplycost_c)
      FROM partsupp ps2, supplier s2, nation n2, region r2
      WHERE p_partkey = ps2.ps_partkey AND s2.s_suppkey = ps2.ps_suppkey
        AND s2.s_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
ORDER BY acctbal_c DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) through the ``spark.sql``
    front-end: six-table join with partsupp on the COMPOSITE
    (partkey, suppkey) key and profit as exact integer cents
    (revenue minus supplycost×quantity). '%green%' becomes '%red%'
    (the testdata's p_name vocabulary)."""
    register_partsupp(spark, sf_dir)
    return spark.sql("""
        SELECT nation, o_year, CAST(SUM(amount_c) AS BIGINT) AS sum_profit_c
        FROM (
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS INT) AS o_year,
                   CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)
                   - ps_supplycost_c * CAST(l_quantity AS BIGINT) AS amount_c
            FROM part_v, supplier_v, lineitem_v, partsupp_v, orders_v,
                 nation_v
            WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
              AND ps_partkey = l_partkey AND p_partkey = l_partkey
              AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
              AND p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year
    """)


SQL_TPCH_Q9 = f"""
WITH {DUCK_PARTSUPP_CTE}
SELECT nation, o_year, CAST(SUM(amount_c) AS BIGINT) AS sum_profit_c
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
         - ps_supplycost_c * CAST(l_quantity AS BIGINT) AS amount_c
  FROM part, supplier, lineitem, partsupp, orders, nation
  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
    AND ps_partkey = l_partkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) through the ``spark.sql`` front-end:
    grouped HAVING compared against an uncorrelated scalar aggregate of
    the SAME three-table join — integer cross-multiply (×1000) replaces
    the float fraction so the comparison hash-matches."""
    register_partsupp(spark, sf_dir)
    return spark.sql("""
        SELECT ps_partkey,
               CAST(SUM(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
        FROM partsupp_v, supplier_v, nation_v
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_1'
        GROUP BY ps_partkey
        HAVING SUM(ps_supplycost_c * ps_availqty) * 1000 > (
            SELECT SUM(ps_supplycost_c * ps_availqty)
            FROM partsupp_v, supplier_v, nation_v
            WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_1')
    """)


SQL_TPCH_Q11 = f"""
WITH {DUCK_PARTSUPP_CTE}
SELECT ps_partkey,
       CAST(SUM(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
FROM partsupp, supplier, nation
WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_1'
GROUP BY ps_partkey
HAVING SUM(ps_supplycost_c * ps_availqty) * 1000 > (
    SELECT SUM(ps_supplycost_c * ps_availqty)
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_1')
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) through the ``spark.sql``
    front-end: COUNT(DISTINCT) per 3-column group with a NOT IN
    anti-subquery. The comment-based supplier exclusion becomes
    negative-balance standing (no comment column in the testdata)."""
    register_partsupp(spark, sf_dir)
    return spark.sql("""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM partsupp_v, part_v
        WHERE p_partkey = ps_partkey
          AND p_brand <> 'Brand#5' AND p_type <> 'ECONOMY'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND ps_suppkey NOT IN (
              SELECT s_suppkey FROM supplier_v WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """)


SQL_TPCH_Q16 = f"""
WITH {DUCK_PARTSUPP_CTE}
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp, part
WHERE p_partkey = ps_partkey
  AND p_brand <> 'Brand#5' AND p_type <> 'ECONOMY'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) through the ``spark.sql``
    front-end: nested IN subqueries with a correlated scalar aggregate
    at the innermost level (availqty vs half the year's shipped
    quantity, integer cross-multiplied; parts with no shipments
    COALESCE to 0, so unexercised stock qualifies)."""
    register_partsupp(spark, sf_dir)
    return spark.sql("""
        SELECT s_name, s_suppkey
        FROM supplier_v, nation_v
        WHERE s_suppkey IN (
                SELECT ps_suppkey FROM partsupp_v
                WHERE ps_partkey IN (
                        SELECT p_partkey FROM part_v WHERE p_type = 'PROMO')
                  AND ps_availqty * 2 > (
                      SELECT COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0)
                      FROM lineitem_v
                      WHERE l_partkey = ps_partkey
                        AND l_suppkey = ps_suppkey
                        AND l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
                        AND l_shipdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'))
          AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
    """)


SQL_TPCH_Q20 = f"""
WITH {DUCK_PARTSUPP_CTE}
SELECT s_name, s_suppkey
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      AND ps_availqty * 2 > (
          SELECT COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0)
          FROM lineitem
          WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'))
  AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
"""


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced mixture resampling
    (``sampling.temperature_mixture``, α = 0.5): per-source targets
    ∝ sqrt(|source|) under a 2000-row budget, materialized as epoch
    repeats for upsampled sources + hash-selected subsets for
    downsampled ones. All-integer arithmetic end to end, so the oracle
    replays the exact rate table and draw comparisons."""
    out = sampling.temperature_mixture(
        _t(spark, sf_dir, "documents"),
        group_col="source", id_col="doc_id", salt="tmix", budget_rows=2000,
    )
    return out.select("doc_id", "source", "epoch")


SQL_TEMPERATURE_MIXTURE = """
WITH counts AS (
    SELECT source, COUNT(*) AS n FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(SUM(CAST(FLOOR(SQRT(n)) AS BIGINT)) AS BIGINT) AS tw
    FROM counts
),
rates AS (
    SELECT source, n,
           (2000 * CAST(FLOOR(SQRT(n)) AS BIGINT)) // tw AS target
    FROM counts, tot
),
r2 AS (
    SELECT source, n, target // n AS copies,
           (4294967296 * (target - (target // n) * n)) // n AS rem_rate
    FROM rates
),
drawn AS (
    SELECT d.doc_id, d.source,
           r.copies + CASE WHEN CAST('0x' || substr(
               md5(CAST(d.doc_id AS VARCHAR) || '#tmix'), 1, 8) AS BIGINT)
               < r.rem_rate THEN 1 ELSE 0 END AS k
    FROM documents d JOIN r2 r USING (source)
)
SELECT doc_id, source,
       CAST(unnest(generate_series(0, k - 1)) AS BIGINT) AS epoch
FROM drawn
"""


def q_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality calibration (``analytics.group_percentile``):
    each document's length score becomes its integer permille rank
    WITHIN its source, then the bottom decile of every source is
    dropped — "drop the worst 10%" holds per domain instead of
    deleting whole low-scoring domains."""
    from dataproc_spark.extensions.analytics import group_percentile

    docs = _t(spark, sf_dir, "documents")
    out = group_percentile(docs, ["source"], "n_chars", ["doc_id"])
    return out.where(F.col("permille") >= 100).select(
        "doc_id", "source", "permille"
    )


SQL_QUALITY_PERCENTILE = """
WITH ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS gn
    FROM documents
)
SELECT doc_id, source,
       CAST(((rn - 1) * 1000) // greatest(gn - 1, 1) AS BIGINT) AS permille
FROM ranked
WHERE ((rn - 1) * 1000) // greatest(gn - 1, 1) >= 100
"""


def q_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion dedup (``streaming.stream_incremental_dedup``):
    the events stream anti-joined against a static fingerprint store
    (every third event stands in for already-ingested history), then
    bounded-state in-stream dedup; the drained append output must equal
    the batch NOT EXISTS + DISTINCT (the oracle)."""
    ev = _t(spark, sf_dir, "events")
    fp = F.md5(
        F.concat_ws(
            "|",
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.round(F.col("value") * 100).cast("long").cast("string"),
        ).cast("binary")
    )
    store = (
        ev.where(F.col("event_id") % 3 == 0).select(fp.alias("fp")).distinct()
    )
    return streaming.stream_incremental_dedup(
        spark, f"{sf_dir}/events.parquet", store
    )


def q_embed_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic integer Lloyd k-means (``simsearch.embed_kmeans``,
    k=8, 2 iterations): seed = the 8 smallest vec_ids, argmin squared-L2
    assignment with pinned tie-breaks, integer-mean centroid updates.
    The oracle replays both iterations as chained CTEs — the same
    value-checked-iteration pattern as ``pagerank``."""
    return simsearch.embed_kmeans(
        _t(spark, sf_dir, "embeddings"), k=8, iters=2
    )


SQL_EMBED_KMEANS = """
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
),
c0 AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v AS c
    FROM q ORDER BY vec_id LIMIT 8
),
d1 AS (
    SELECT q.vec_id, q.v, c.cid,
           list_aggregate(list_transform(range(1, len(q.v) + 1),
               i -> (q.v[i] - c.c[i]) * (q.v[i] - c.c[i])), 'sum') AS dist
    FROM q CROSS JOIN c0 c
),
a1 AS (
    SELECT vec_id, v, cid AS cluster
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY dist, cid) AS rn FROM d1)
    WHERE rn = 1
),
c1 AS (
    SELECT cluster AS cid, list(m ORDER BY dim) AS c
    FROM (
        SELECT cluster, dim, CAST(SUM(val) // COUNT(*) AS BIGINT) AS m
        FROM (SELECT cluster, generate_subscripts(v, 1) AS dim,
                     unnest(v) AS val FROM a1)
        GROUP BY cluster, dim
    ) GROUP BY cluster
),
d2 AS (
    SELECT q.vec_id, q.v, c.cid,
           list_aggregate(list_transform(range(1, len(q.v) + 1),
               i -> (q.v[i] - c.c[i]) * (q.v[i] - c.c[i])), 'sum') AS dist
    FROM q CROSS JOIN c1 c
),
a2 AS (
    SELECT vec_id, v, cid AS cluster
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY dist, cid) AS rn FROM d2)
    WHERE rn = 1
),
c2 AS (
    SELECT cluster AS cid, list(m ORDER BY dim) AS c
    FROM (
        SELECT cluster, dim, CAST(SUM(val) // COUNT(*) AS BIGINT) AS m
        FROM (SELECT cluster, generate_subscripts(v, 1) AS dim,
                     unnest(v) AS val FROM a2)
        GROUP BY cluster, dim
    ) GROUP BY cluster
),
d3 AS (
    SELECT q.vec_id, c.cid,
           list_aggregate(list_transform(range(1, len(q.v) + 1),
               i -> (q.v[i] - c.c[i]) * (q.v[i] - c.c[i])), 'sum') AS dist
    FROM q CROSS JOIN c2 c
)
SELECT vec_id, CAST(cluster AS INT) AS cluster
FROM (
    SELECT vec_id, cid AS cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d3
) WHERE rn = 1
"""


def q_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge (``analytics.apply_changelog``): even-event rows build
    the per-user snapshot (latest value), odd-event rows form the
    changelog (clicks delete, everything else upserts); the latest
    change per key wins and the snapshot is touched only by one key
    anti-join. The MERGE INTO shape on plain parquet."""
    from dataproc_spark.extensions.analytics import apply_changelog

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    snapshot = (
        ev.where(F.col("event_id") % 2 == 0)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "ts", "value_c")
    )
    changes = ev.where(F.col("event_id") % 2 == 1).select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type") == "click", "D").otherwise("U").alias("op"),
        "value_c",
    )
    return apply_changelog(snapshot, changes)


SQL_APPLY_CHANGELOG = """
WITH ev AS (
    SELECT event_id, user_id, epoch_ns(ts) AS tsn, event_type,
           CAST(round(value * 100) AS BIGINT) AS value_c
    FROM events
),
snap AS (
    SELECT user_id, tsn AS ts, value_c FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY tsn DESC, event_id DESC) AS rn
        FROM ev WHERE event_id % 2 = 0
    ) WHERE rn = 1
),
latest AS (
    SELECT user_id, tsn AS ts, value_c,
           CASE WHEN event_type = 'click' THEN 'D' ELSE 'U' END AS op
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY tsn DESC, event_id DESC) AS rn
        FROM ev WHERE event_id % 2 = 1
    ) WHERE rn = 1
)
SELECT s.user_id, s.ts, s.value_c
FROM snap s
WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.user_id = s.user_id)
UNION ALL
SELECT user_id, ts, value_c FROM latest WHERE op = 'U'
"""


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order key arithmetic (``storage.z_value``): the
    data-skipping clustering key behind lakehouse OPTIMIZE ZORDER,
    computed over (user_id, event_id) folded into 12-bit lanes. The
    oracle rebuilds the identical bit interleave with shift arithmetic;
    the layout-level pruning benefit is pinned by the row-group
    intersection test in ``tests/test_storage_streaming.py``."""
    from dataproc_spark.storage import z_value

    ev = _t(spark, sf_dir, "events")
    a = F.pmod(F.col("user_id"), F.lit(4096)).cast("long")
    b = F.pmod(F.col("event_id"), F.lit(4096)).cast("long")
    return ev.select(
        "event_id", z_value([a, b], bits=12).alias("z")
    )


SQL_ZORDER_KEY = """
SELECT event_id,
       CAST(
         list_aggregate(list_transform(range(0, 12),
             j -> (((user_id % 4096) >> j) & 1) << (2 * j)), 'sum')
         + list_aggregate(list_transform(range(0, 12),
             j -> (((event_id % 4096) >> j) & 1) << (2 * j + 1)), 'sum')
       AS BIGINT) AS z
FROM events
"""


SQL_STREAM_INCREMENTAL_DEDUP = """
WITH fps AS (
    SELECT event_id, user_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS value_c,
           md5(CAST(user_id AS VARCHAR) || '|' || event_type || '|' ||
               CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)) AS fp
    FROM events
),
store AS (SELECT DISTINCT fp FROM fps WHERE event_id % 3 = 0)
SELECT DISTINCT f.fp, f.user_id, f.event_type, f.value_c
FROM fps f
WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.fp = f.fp)
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

#: name -> (spark callable, oracle SQL or None for rows-only checks)
#:
#: ORDERING CONTRACT: the driver's correctness gate records only the FIRST
#: 50 registry entries each round.  Entries are therefore ordered by
#: verification need, not by topic: (a) queries whose freshest driver
#: evidence is oldest (rotated into the window this round), (b) queries
#: whose implementation or oracle changed this round, (c) core sentinels,
#: then (d) everything already green in a recent round (the r3/r4
#: extension wave; their evidence stands in CORRECTNESS_r03/r04).
#: COVERAGE.md records which round vouches for which entry.
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # -- (a) r05 verification window: the 43 queries whose only driver
    # -- evidence was CORRECTNESS_r02 (rotated in), including the whole
    # -- events/streaming family repaired this round -----------------------
    "selection_rank": (q_selection_rank, SQL_SELECTION_RANK),
    "select_with_decay": (q_select_with_decay, SQL_SELECT_WITH_DECAY),
    "evaluate_buckets": (q_evaluate_buckets, SQL_EVALUATE_BUCKETS),
    "evaluate_measures": (q_evaluate_measures, SQL_EVALUATE_MEASURES),
    "trec_export": (q_trec_export, SQL_TREC_EXPORT),
    "cartesian": (q_cartesian, SQL_CARTESIAN),
    "load_selection_csv": (q_load_selection_csv, SQL_LOAD_SELECTION_CSV),
    "load_bucket_selection_csv": (
        q_load_bucket_selection_csv,
        SQL_LOAD_BUCKET_SELECTION_CSV,
    ),
    "shard_results_roundtrip": (
        q_shard_results_roundtrip,
        SQL_SHARD_RESULTS_ROUNDTRIP,
    ),
    "select_buckets": (q_select_buckets, SQL_SELECT_BUCKETS),
    "tpch_q1": (q_tpch_q1, SQL_TPCH_Q1),
    "tpch_q3": (q_tpch_q3, SQL_TPCH_Q3),
    "tpch_q5": (q_tpch_q5, SQL_TPCH_Q5),
    "rollup_pricing": (q_rollup_pricing, SQL_ROLLUP_PRICING),
    "top_customers": (q_top_customers, SQL_TOP_CUSTOMERS),
    "customers_without_orders": (
        q_customers_without_orders,
        SQL_CUSTOMERS_WITHOUT_ORDERS,
    ),
    "exists_orders": (q_exists_orders, SQL_EXISTS_ORDERS),
    "parts_above_brand_avg": (
        q_parts_above_brand_avg,
        SQL_PARTS_ABOVE_BRAND_AVG,
    ),
    "nations_above_avg_revenue": (
        q_nations_above_avg_revenue,
        SQL_NATIONS_ABOVE_AVG_REVENUE,
    ),
    "returnflag_pivot": (q_returnflag_pivot, SQL_RETURNFLAG_PIVOT),
    "priority_intersect": (q_priority_intersect, SQL_PRIORITY_INTERSECT),
    "priority_except": (q_priority_except, SQL_PRIORITY_EXCEPT),
    "left_join_fill": (q_left_join_fill, SQL_LEFT_JOIN_FILL),
    "orders_by_month": (q_orders_by_month, SQL_ORDERS_BY_MONTH),
    "union_all_sources": (q_union_all_sources, SQL_UNION_ALL_SOURCES),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "events_sliding": (q_events_sliding, SQL_EVENTS_SLIDING),
    "events_range_window": (q_events_range_window, SQL_EVENTS_RANGE_WINDOW),
    "cube_doc_stats": (q_cube_doc_stats, SQL_CUBE_DOC_STATS),
    "merge_schema_scan": (q_merge_schema_scan, SQL_MERGE_SCHEMA_SCAN),
    "events_sessionize": (q_events_sessionize, SQL_EVENTS_SESSIONIZE),
    "events_json": (q_events_json, SQL_EVENTS_JSON),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "latest_per_user": (q_latest_per_user, SQL_LATEST_PER_USER),
    "stream_hourly": (q_stream_hourly, SQL_EVENTS_HOURLY),
    "stream_sessions": (q_stream_sessions, SQL_STREAM_SESSIONS),
    "stream_dedup_bounded": (q_stream_dedup_bounded, SQL_STREAM_DEDUP),
    "stream_enrich": (q_stream_enrich, SQL_STREAM_ENRICH),
    "stream_stream_join": (q_stream_stream_join, SQL_STREAM_STREAM_JOIN),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash": (q_dedup_minhash, None),
    "dedup_minhash_portable": (
        q_dedup_minhash_portable, SQL_DEDUP_MINHASH_PORTABLE,
    ),
    "dedup_simhash": (q_dedup_simhash, None),
    # -- (b) failed in r03/r04 (events ts type), fixed this round ----------
    "interval_join": (q_interval_join, SQL_INTERVAL_JOIN),
    "top_events_daily": (q_top_events_daily, SQL_TOP_EVENTS_DAILY),
    "stream_dedup": (q_stream_dedup, SQL_STREAM_DEDUP),
    # -- (c) core sentinels -------------------------------------------------
    "select_top_t": (q_select_top_t, SQL_SELECT_TOP_T),
    "evaluate_sweep": (q_evaluate_sweep, SQL_EVALUATE_SWEEP),
    "resolve_buckets": (q_resolve_buckets, SQL_RESOLVE_BUCKETS),
    "tpch_q6": (q_tpch_q6, SQL_TPCH_Q6),
    # ======================= 50-entry window boundary ======================
    # -- (d) extension wave: green rows in CORRECTNESS_r03/r04 -------------
    "dedup_simhash_portable": (
        q_dedup_simhash_portable, SQL_DEDUP_SIMHASH_PORTABLE,
    ),
    "dedup_cc": (q_dedup_cc, SQL_DEDUP_CC),
    "pagerank": (q_pagerank, SQL_PAGERANK),
    "hash_split": (q_hash_split, SQL_HASH_SPLIT),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "doc_sample": (q_doc_sample, SQL_DOC_SAMPLE),
    "mixture_sample": (q_mixture_sample, SQL_MIXTURE_SAMPLE),
    "repetition_stats": (q_repetition_stats, SQL_REPETITION_STATS),
    "salted_token_counts": (q_salted_token_counts, SQL_SALTED_TOKEN_COUNTS),
    "salted_join": (q_salted_join, SQL_SALTED_JOIN),
    "count_min": (q_count_min, SQL_COUNT_MIN),
    "bloom_filter": (q_bloom_filter, SQL_BLOOM_FILTER),
    "tfidf_topk": (q_tfidf_topk, SQL_TFIDF_TOPK),
    "median_tokens": (q_median_tokens, SQL_MEDIAN_TOKENS),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "corpus_prep": (q_corpus_prep, SQL_CORPUS_PREP),
    "chunk_documents": (q_chunk_documents, SQL_CHUNK_DOCUMENTS),
    "shuffle_order": (q_shuffle_order, SQL_SHUFFLE_ORDER),
    "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
    "redact_pii": (q_redact_pii, SQL_REDACT_PII),
    "curriculum_bins": (q_curriculum_bins, SQL_CURRICULUM_BINS),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "bigram_lm": (q_bigram_lm, SQL_BIGRAM_LM),
    "jsonl_roundtrip": (q_jsonl_roundtrip, SQL_JSONL_ROUNDTRIP),
    "csv_roundtrip": (q_csv_roundtrip, SQL_CSV_ROUNDTRIP),
    "orc_roundtrip": (q_orc_roundtrip, SQL_ORC_ROUNDTRIP),
    "partitioned_scan": (q_partitioned_scan, SQL_PARTITIONED_SCAN),
    "label_centroids": (q_label_centroids, SQL_LABEL_CENTROIDS),
    "ann_ivf_exact": (q_ann_ivf_exact, SQL_ANN_IVF_EXACT),
    "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "ngram_jaccard_maxdf": (q_ngram_jaccard_maxdf, SQL_NGRAM_JACCARD_MAXDF),
    "decontaminate_maxdf": (q_decontaminate_maxdf, SQL_DECONTAMINATE_MAXDF),
    "quality_filter": (q_quality_filter, SQL_QUALITY_FILTER),
    "bpe_token_stats": (q_bpe_token_stats, SQL_BPE_TOKEN_STATS),
    "text_stats": (q_text_stats, SQL_TEXT_STATS),
    "token_topk": (q_token_topk, SQL_TOKEN_TOPK),
    "lang_predict": (q_lang_predict, SQL_LANG_PREDICT),
    "doc_fingerprint": (q_doc_fingerprint, SQL_DOC_FINGERPRINT),
    "doc_quality": (q_doc_quality, SQL_DOC_QUALITY),
    "multimodal_bytes": (q_multimodal_bytes, SQL_MULTIMODAL_BYTES),
    "embed_near_dup": (q_embed_near_dup, SQL_EMBED_NEAR_DUP),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "dedup_spans": (q_dedup_spans, SQL_DEDUP_SPANS),
    "ann_recall": (q_ann_recall, SQL_ANN_RECALL),
    "embed_dedup": (q_embed_dedup, SQL_EMBED_DEDUP),
    "doc_novelty": (q_doc_novelty, SQL_DOC_NOVELTY),
    "select_token_budget": (q_select_token_budget, SQL_SELECT_TOKEN_BUDGET),
    "stream_sink_roundtrip": (q_stream_sink_roundtrip, SQL_EVENTS_HOURLY),
    "funnel_steps": (q_funnel_steps, SQL_FUNNEL_STEPS),
    "retention_cohorts": (q_retention_cohorts, SQL_RETENTION_COHORTS),
    "scd2_intervals": (q_scd2_intervals, SQL_SCD2_INTERVALS),
    "user_event_sequences": (q_user_event_sequences, SQL_USER_EVENT_SEQUENCES),
    "stream_funnel": (q_stream_funnel, SQL_FUNNEL_STEPS),
    "sql_events_hourly": (q_sql_events_hourly, SQL_EVENTS_HOURLY),
    "events_resample": (q_events_resample, SQL_EVENTS_RESAMPLE),
    "dedup_cluster_sizes": (q_dedup_cluster_sizes, SQL_DEDUP_CLUSTER_SIZES),
    "events_pivot": (q_events_pivot, SQL_EVENTS_PIVOT),
    "incremental_dedup": (q_incremental_dedup, SQL_INCREMENTAL_DEDUP),
    "ann_topk": (q_ann_topk, SQL_ANN_TOPK),
    "ann_bucketed": (q_ann_bucketed, SQL_ANN_BUCKETED),
    "ann_ivf": (q_ann_ivf, None),
    "multimodal_decode": (q_multimodal_decode, SQL_MULTIMODAL_DECODE),
    "tpch_q4": (q_tpch_q4, SQL_TPCH_Q4),
    "tpch_q7": (q_tpch_q7, SQL_TPCH_Q7),
    "tpch_q8": (q_tpch_q8, SQL_TPCH_Q8),
    "tpch_q13": (q_tpch_q13, SQL_TPCH_Q13),
    "tpch_q17": (q_tpch_q17, SQL_TPCH_Q17),
    "tpch_q21": (q_tpch_q21, SQL_TPCH_Q21),
    "tpch_q22": (q_tpch_q22, SQL_TPCH_Q22),
    "sql_session_windows": (q_sql_session_windows, SQL_SESSION_WINDOWS),
    "tpch_q10": (q_tpch_q10, SQL_TPCH_Q10),
    "tpch_q12": (q_tpch_q12, SQL_TPCH_Q12),
    "tpch_q14": (q_tpch_q14, SQL_TPCH_Q14),
    "tpch_q15": (q_tpch_q15, SQL_TPCH_Q15),
    "tpch_q18": (q_tpch_q18, SQL_TPCH_Q18),
    "tpch_q19": (q_tpch_q19, SQL_TPCH_Q19),
    "temperature_mixture": (q_temperature_mixture, SQL_TEMPERATURE_MIXTURE),
    "quality_percentile": (q_quality_percentile, SQL_QUALITY_PERCENTILE),
    "stream_incremental_dedup": (
        q_stream_incremental_dedup,
        SQL_STREAM_INCREMENTAL_DEDUP,
    ),
    "embed_kmeans": (q_embed_kmeans, SQL_EMBED_KMEANS),
    "apply_changelog": (q_apply_changelog, SQL_APPLY_CHANGELOG),
    "zorder_key": (q_zorder_key, SQL_ZORDER_KEY),
    "tpch_q2": (q_tpch_q2, SQL_TPCH_Q2),
    "tpch_q9": (q_tpch_q9, SQL_TPCH_Q9),
    "tpch_q11": (q_tpch_q11, SQL_TPCH_Q11),
    "tpch_q16": (q_tpch_q16, SQL_TPCH_Q16),
    "tpch_q20": (q_tpch_q20, SQL_TPCH_Q20),
    "multimodal_resize": (q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
    "bpe_merges": (q_bpe_merges, SQL_BPE_MERGES),
    "corpus_diff": (q_corpus_diff, SQL_CORPUS_DIFF),
    "stream_hourly_append": (q_stream_hourly_append, SQL_STREAM_HOURLY_APPEND),
    "profile_table": (q_profile_table, SQL_PROFILE_TABLE),
    "validate_constraints": (q_validate_constraints, SQL_VALIDATE_CONSTRAINTS),
    "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
    "window_suite": (q_window_suite, SQL_WINDOW_SUITE),
    "stream_upsert": (q_stream_upsert, SQL_STREAM_UPSERT),
    "from_json_extract": (q_from_json_extract, SQL_FROM_JSON_EXTRACT),
    "hof_suite": (q_hof_suite, SQL_HOF_SUITE),
    "sql_udf_tokens": (q_sql_udf_tokens, SQL_SQL_UDF_TOKENS),
    "rfm_segments": (q_rfm_segments, SQL_RFM_SEGMENTS),
    "hourly_anomalies": (q_hourly_anomalies, SQL_HOURLY_ANOMALIES),
    "triangle_count": (q_triangle_count, SQL_TRIANGLE_COUNT),
    "token_quantiles": (q_token_quantiles, SQL_TOKEN_QUANTILES),
    "skew_report": (q_skew_report, SQL_SKEW_REPORT),
    "centroid_similarity": (q_centroid_similarity, SQL_CENTROID_SIMILARITY),
    "dedup_rates": (q_dedup_rates, SQL_DEDUP_RATES),
    "rank_correlation": (q_rank_correlation, SQL_RANK_CORRELATION),
}



#: flagship gates that should appear in every round's recorded window
ALWAYS_VERIFY = ("select_top_t", "evaluate_sweep", "resolve_buckets", "tpch_q6")

#: per-process cache for :func:`registry_order`, keyed on the artifact
#: files' (path, mtime, size) fingerprint
_REGISTRY_ORDER_CACHE: dict = {}


def registry_order(artifacts_dir: str | None = None) -> list[str]:
    """Registry names ordered by verification need, computed from the
    repo's own ``CORRECTNESS_r*.json`` artifacts.

    The driver records correctness rows for only the FIRST 50 entries it
    sees, so with ~100 registry entries the window must rotate or new and
    stale queries silently stop being verified (how the r4 events-ts
    breakage stayed invisible for a round). Priority buckets:

    1. entries whose LATEST recorded row is a failure (re-verify now),
    2. the :data:`ALWAYS_VERIFY` flagship sentinels,
    3. entries never recorded in any round,
    4. everything else, stalest green round first.

    Ties break by literal REGISTRY position, so the order is fully
    deterministic given the artifact files. The dynamic ordering only
    activates once round 5's artifact exists (``max recorded round >=
    5``); before that — including during round 5's own verify — the
    hand-curated literal order stands. Any artifact problem falls back to
    the literal order: ordering must never break ``queries()`` — but the
    fallback is loudly announced on stderr so a silently frozen rotation
    (the failure mode the rotation exists to prevent) stays visible.

    The computed order is cached per process, keyed on the artifact
    files' (path, mtime, size) fingerprint, so repeated
    ``queries()``/``oracle_sql()`` calls don't re-parse every
    ``CORRECTNESS_r*.json``.
    """
    import glob
    import json
    import os
    import re
    import sys

    names = list(REGISTRY)
    # resolve the artifact location ONCE — the fingerprint and the parse
    # below must always read the same files, or the cache key silently
    # desynchronizes from the data it stands for
    root = artifacts_dir or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    artifact_paths = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    )
    try:
        cache_key = tuple(
            (p, os.path.getmtime(p), os.path.getsize(p))
            for p in artifact_paths
        )
        cached = _REGISTRY_ORDER_CACHE.get(cache_key)
        if cached is not None:
            return list(cached)
    except Exception:
        cache_key = None
    try:
        latest_green: dict[str, int] = {}
        latest_any: dict[str, int] = {}
        max_round = 0
        for path in artifact_paths:
            m = re.search(r"_r0*(\d+)\.json$", path)
            if not m:
                continue
            rnd = int(m.group(1))
            with open(path) as fh:
                data = json.load(fh)
            if not isinstance(data, dict):
                continue
            max_round = max(max_round, rnd)
            for name, row in data.items():
                if not isinstance(row, dict):
                    continue
                latest_any[name] = max(latest_any.get(name, -1), rnd)
                green = (
                    row.get("rows_match") is True
                    and row.get("schema_match") is True
                    and row.get("hash_match") is not False
                )
                # rows-only entries (no oracle by design) are recorded as
                # rows_match=None with err='no_oracle'; the query RAN and
                # its weaker check passed — don't pin them in the failure
                # bucket forever
                rows_only_ok = (
                    row.get("rows_match") is None
                    and row.get("spark_rows") is not None
                    and row.get("err") in (None, "no_oracle")
                )
                if green or rows_only_ok:
                    latest_green[name] = max(latest_green.get(name, -1), rnd)
        if max_round < 5:
            return names
        pos = {n: i for i, n in enumerate(names)}

        def key(n: str):
            lg = latest_green.get(n, -1)
            la = latest_any.get(n, -1)
            if la > lg:  # latest recorded row failed
                bucket = 0
            elif n in ALWAYS_VERIFY:
                bucket = 1
            elif la == -1:  # never recorded
                bucket = 2
            else:
                bucket = 3
            return (bucket, lg, pos[n])

        ordered = sorted(names, key=key)
        if cache_key is not None:
            _REGISTRY_ORDER_CACHE[cache_key] = list(ordered)
        return ordered
    except Exception as exc:  # pragma: no cover - defensive
        print(
            "dataproc_spark.queries.registry_order: falling back to the "
            f"literal REGISTRY order ({type(exc).__name__}: {exc}); the "
            "verification rotation is FROZEN until the CORRECTNESS_r*.json "
            "artifacts parse again",
            file=sys.stderr,
        )
        return names


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name][0] for name in registry_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name][1]
        for name in registry_order()
        if REGISTRY[name][1] is not None
    }
