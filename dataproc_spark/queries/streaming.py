"""Structured Streaming gates (bounded availableNow drains).

Split out of the monolithic queries.py (r7); registry assembly lives in
``dataproc_spark.queries`` (the package __init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from dataproc_spark.extensions import dedup, sampling, streaming

# ---------------------------------------------------------------------------
# table access
# ---------------------------------------------------------------------------

from dataproc_spark.queries._tables import _t  # noqa: F401


def q_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming variant of events_hourly (availableNow drain);
    same oracle — batch/stream parity is the assertion."""
    return streaming.stream_hourly_counts(spark, f"{sf_dir}/events.parquet")


def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming variant of ``funnel_steps``
    (``applyInPandasWithState``, per-step timestamp lists in state so
    cross-batch disorder converges); same oracle — batch/stream parity
    is the assertion."""
    # max_files_per_trigger=None: ONE batch regardless of shard layout —
    # per-file batches with a 1 h watermark would drop cross-file late
    # rows the oracle counts if the driver ever ships a sharded events
    # dir (same contract as q_stream_upsert; r8 follow-up review)
    return streaming.stream_funnel_counts(
        spark, f"{sf_dir}/events.parquet", max_files_per_trigger=None
    ).select("user_id", "t_view", "t_click", "t_purchase", "steps")


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
        from dataproc_spark.core import local_frame

        return local_frame(spark, rollup.collect(), rollup.schema)
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
    pinned by its own driver gate, ``stream_upsert_multibatch``, and by
    ``test_stream_upsert_applies_batches_in_arrival_order``."""
    import shutil
    import tempfile

    from dataproc_spark.extensions.streaming import (
        _file_stream,
        read_latest_snapshot,
        stream_upsert_to_parquet,
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
        from dataproc_spark.core import local_frame

        return local_frame(spark, final.collect(), final.schema)
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
WHERE NOT EXISTS (SELECT 1 FROM latest l
                  WHERE l.user_id IS NOT DISTINCT FROM s.user_id)
UNION ALL
-- null-safe op/key tests mirror the engine: a NULL op upserts
-- (it is not a delete) and a NULL key still merges
SELECT user_id, ts, value_c FROM latest WHERE op IS DISTINCT FROM 'D'
"""


def q_stream_upsert_multibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-batch CDC upsert gate: the changelog is deterministically
    split into TWO micro-batches (``event_id % 3 == 1`` arrives first,
    ``% 3 == 2`` second — file mtimes order the file source) and merged
    sequentially into versioned snapshots. This pins the cross-batch
    contract the single-batch ``stream_upsert`` gate cannot see:
    **arrival order outranks event time across batches** — a user whose
    batch-2 change carries an OLDER event time than their batch-1
    change still ends up with the batch-2 value. The oracle replays the
    sequential merge as one ranked pass: precedence (batch, ts,
    event_id), batch first.

    Gate-scratch synthesis: the two batch files are cut from the events
    parquet with pyarrow (column-preserving filter, no Spark collect)
    and removed after the result materializes; at scale the changelog
    batches already EXIST as the arrival log on object storage."""
    import os as _os
    import shutil
    import tempfile
    import time

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from dataproc_spark.extensions.streaming import (
        _file_stream,
        read_latest_snapshot,
        stream_upsert_to_parquet,
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
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    # event_id % 3 (pyarrow integer divide truncates, ids are >= 0)
    mod = pc.subtract(
        tbl["event_id"], pc.multiply(pc.divide(tbl["event_id"], 3), 3)
    )
    root = tempfile.mkdtemp(prefix="upsertmb_")
    src = _os.path.join(root, "src")
    _os.makedirs(src)
    try:
        now = time.time()
        for batch_no, offset in ((1, -100.0), (2, 0.0)):
            part = tbl.filter(pc.equal(mod, batch_no))
            path = _os.path.join(src, f"batch{batch_no}.parquet")
            pq.write_table(part, path)
            _os.utime(path, (now + offset, now + offset))
        stream = (
            _file_stream(spark, src)  # maxFilesPerTrigger=1 -> 2 batches
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
        from dataproc_spark.core import local_frame

        return local_frame(spark, final.collect(), final.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_STREAM_UPSERT_MULTIBATCH = """
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
    -- sequential two-batch merge as one ranked pass: the batch number
    -- (event_id % 3; batch 2 arrives after batch 1) outranks event
    -- time, which outranks the id tie-break — the CDC log-replay
    -- contract
    SELECT user_id, tsn AS ts, value_c,
           CASE WHEN event_type = 'click' THEN 'D' ELSE 'U' END AS op
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY user_id
                      ORDER BY (event_id % 3) DESC, tsn DESC, event_id DESC
                  ) AS rn
        FROM ev WHERE event_id % 3 <> 0
    ) WHERE rn = 1
)
SELECT s.user_id, s.ts, s.value_c
FROM snap s
WHERE NOT EXISTS (SELECT 1 FROM latest l
                  WHERE l.user_id IS NOT DISTINCT FROM s.user_id)
UNION ALL
-- null-safe op/key tests mirror the engine: a NULL op upserts
-- (it is not a delete) and a NULL key still merges
SELECT user_id, ts, value_c FROM latest WHERE op IS DISTINCT FROM 'D'
"""


def q_stream_hourly_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode streaming hourly rollup
    (``streaming.stream_hourly_append``): windows emit exactly once when
    the watermark passes their end. The oracle replays the emission
    bound exactly — watermark = millisecond-floored max event time minus
    the 2-hour delay; only windows whose end ≤ watermark appear, the
    buffered tail stays in state by design."""
    # single batch for shard-layout independence (see q_stream_funnel)
    return streaming.stream_hourly_append(
        spark, f"{sf_dir}/events.parquet", max_files_per_trigger=None
    )


SQL_STREAM_HOURLY_APPEND = """
WITH hourly AS (
    SELECT (epoch_ns(ts) - ((epoch_ns(ts) % 3600000000000) + 3600000000000)
            % 3600000000000) // 3600000000000 AS hour_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_value_c
    -- the stream drops events at or before epoch 0 against the INITIAL
    -- zero watermark in the first micro-batch (operator docstring);
    -- replay that drop or the oracle emits pre-epoch windows the sink
    -- never saw (r7 review)
    FROM events WHERE epoch_ns(ts) > 0
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
    # NULL content is NOT a duplicate class (the exact_dedup policy):
    # groupBy would collapse every NULL-text batch doc into one group
    # and silently delete the rest as 'copies' (r8 follow-up review)
    null_key = F.when(F.col("_fp").isNull(), F.col("doc_id"))
    return (
        fresh.groupBy("_fp", null_key.alias("_nullkey"))
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
-- NULL content is not a duplicate class: each NULL-text doc its own group
GROUP BY fp, CASE WHEN fp IS NULL THEN doc_id END
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (dropDuplicates on (user, hour) over a file stream
    → per-user active-hour counts); oracle = batch COUNT(DISTINCT hour),
    proving micro-batch slicing doesn't change dedup semantics."""
    return streaming.stream_dedup_hours(spark, f"{sf_dir}/events.parquet")


SQL_STREAM_DEDUP = """
-- stream_dedup_hours has NO watermark, so epoch-adjacent events are
-- KEPT (its docstring recommends it for exactly such streams) — no
-- epoch filter here; the bounded variant below replays the drop
SELECT user_id,
       CAST(COUNT(DISTINCT
            (epoch_ns(ts) - ((epoch_ns(ts) % 3600000000000) + 3600000000000)
             % 3600000000000) // 3600000000000)
            AS BIGINT) AS n_active_hours
FROM events
WHERE ts IS NOT NULL  -- engine NULL-ts policy (r9): untimed rows excluded
GROUP BY user_id
"""

SQL_STREAM_DEDUP_BOUNDED = """
-- events at or before epoch 0 are dropped by the BOUNDED variant's
-- initial zero watermark in the first micro-batch — replay it
SELECT user_id,
       CAST(COUNT(DISTINCT
            (epoch_ns(ts) - ((epoch_ns(ts) % 3600000000000) + 3600000000000)
             % 3600000000000) // 3600000000000)
            AS BIGINT) AS n_active_hours
FROM events WHERE ts IS NOT NULL AND epoch_ns(ts) > 0
GROUP BY user_id
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
    -- untimed rows excluded (engine NULL-ts policy, r9 — the stateful
    -- operator skips NaN ts; the lag formulation now filters the same)
    SELECT user_id, epoch_ns(ts) AS tns FROM events
    WHERE ts IS NOT NULL
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
# stream enrichment / stream-stream joins
# ---------------------------------------------------------------------------


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
    # single batch for shard-layout independence (see q_stream_funnel)
    return streaming.stream_stream_join(
        spark, f"{sf_dir}/events.parquet", gap_hours=1,
        max_files_per_trigger=None,
    )


SQL_STREAM_STREAM_JOIN = """
WITH ev AS (
    SELECT event_id, user_id, event_type,
           -- pmod-floor micros (with_event_time floors; bare // would
           -- truncate pre-1970 sub-µs values one unit high — r7 review)
           (epoch_ns(ts) - ((epoch_ns(ts) % 1000) + 1000) % 1000) // 1000
               AS tus
    FROM events
)
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
       CAST(p.tus - c.tus AS BIGINT) AS delta_us
FROM ev p JOIN ev c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.tus >= p.tus - 3600000000 AND c.tus <= p.tus
"""


def q_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion dedup (``streaming.stream_incremental_dedup``):
    the events stream anti-joined against a static fingerprint store
    (every third event stands in for already-ingested history), then
    bounded-state in-stream dedup; the drained append output must equal
    the batch NOT EXISTS + DISTINCT (the oracle)."""
    ev = _t(spark, sf_dir, "events")
    # the SAME shared fingerprint the operator applies to the stream —
    # one function, not two copies that could drift (r7 review finding)
    fp = streaming.event_fingerprint()
    store = (
        ev.where(F.col("event_id") % 3 == 0).select(fp.alias("fp")).distinct()
    )
    return streaming.stream_incremental_dedup(
        spark, f"{sf_dir}/events.parquet", store
    )


SQL_STREAM_INCREMENTAL_DEDUP = """
WITH fps AS (
    SELECT event_id, user_id, event_type, ts,
           CAST(round(value * 100) AS BIGINT) AS value_c,
           md5(
               CASE WHEN user_id IS NULL THEN 'N'
                    ELSE 'V' || CAST(length(CAST(user_id AS VARCHAR)) AS VARCHAR)
                         || ':' || CAST(user_id AS VARCHAR) END ||
               CASE WHEN event_type IS NULL THEN 'N'
                    ELSE 'V' || CAST(length(event_type) AS VARCHAR)
                         || ':' || event_type END ||
               CASE WHEN value IS NULL THEN 'N'
                    ELSE 'V' || CAST(length(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)) AS VARCHAR)
                         || ':' || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) END
           ) AS fp
    FROM events
),
store AS (SELECT DISTINCT fp FROM fps WHERE event_id % 3 = 0)
SELECT DISTINCT f.fp, f.user_id, f.event_type, f.value_c
FROM fps f
-- the STREAMED side drops events at or before epoch 0 against the
-- initial zero watermark (dropDuplicatesWithinWatermark's first
-- micro-batch — same replay as the bounded dedup gate); the store side
-- is built as a STATIC frame and keeps them
WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.fp = f.fp)
  AND epoch_ns(f.ts) > 0
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
