"""Event-table gates: time series, windows, sessionization, CDC.

Split out of the monolithic queries.py (r7); registry assembly lives in
``dataproc_spark.queries`` (the package __init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from dataproc_spark import temporal
from dataproc_spark.extensions import streaming

# ---------------------------------------------------------------------------
# table access
# ---------------------------------------------------------------------------

from dataproc_spark.queries._tables import _t, register_tables  # noqa: F401


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): each event lands in two
    windows — the streaming-window shape expressed in batch.

    Half-hour ids use the pmod-before-div FLOOR (the repo convention —
    ``hourly_agg``'s docstring documents why): plain ``div`` truncates
    toward zero, so a pre-1970 event would land in windows {0, −1}
    instead of floor's {−1, −2}, making win_id 0 span a double-width
    (−30 min, +30 min) interval; the streaming ``F.window`` path floors,
    so batch/stream parity requires it (r7 review finding — the oracle
    previously replicated the same truncation, green-while-wrong)."""
    ev = _t(spark, sf_dir, "events")
    half = "((ts - pmod(ts, 1800000000000)) div 1800000000000)"
    half_hours = F.array(F.expr(half), F.expr(f"{half} - 1"))
    return (
        ev.select(F.explode(half_hours).alias("win_id"), "event_type", "value")
        .groupBy("win_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
        )
    )


SQL_EVENTS_SLIDING = """
-- floor-division half-hour ids, same remainder trick as SQL_EVENTS_HOURLY
SELECT win_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM (
    SELECT unnest([
               (epoch_ns(ts) - ((epoch_ns(ts) % 1800000000000)
                 + 1800000000000) % 1800000000000) // 1800000000000,
               (epoch_ns(ts) - ((epoch_ns(ts) % 1800000000000)
                 + 1800000000000) % 1800000000000) // 1800000000000 - 1
           ]) AS win_id,
           event_type, value
    FROM events
)
GROUP BY win_id, event_type
"""


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
WHERE ts IS NOT NULL  -- untimed rows excluded (engine NULL-ts policy, r9)
GROUP BY 1, 2
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) + per-user session stats.

    The ts column floors to microseconds first — the oracle compares
    µs-precision epoch_ns values, and every sibling event gate applies
    the same convention (r8 follow-up review finding)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.expr("(ts - pmod(ts, 1000)) div 1000 * 1000")
    )
    return streaming.session_stats(ev, gap_minutes=30)


SQL_EVENTS_SESSIONIZE = """
WITH e AS (
    -- untimed rows excluded (engine NULL-ts policy, r9)
    SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events
    WHERE ts IS NOT NULL
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

    # µs-truncated ns (the latest_per_user convention): the oracle's
    # epoch_ns sees µs precision, so raw-ns outputs and strict '>' step
    # comparisons would diverge under the TIMESTAMP(NANOS) contract
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.expr("((ts - pmod(ts, 1000)) div 1000) * 1000")
    )
    return funnel(ev, steps=("view", "click", "purchase")).select(
        "user_id", "t_view", "t_click", "t_purchase", "steps"
    )


SQL_FUNNEL_STEPS = """
WITH ev AS (
    -- untimed rows excluded (engine NULL-ts policy, r9: a NULL ts
    -- cannot participate in a time-ordered funnel)
    SELECT user_id, epoch_ns(ts) AS tns, event_type FROM events
    WHERE ts IS NOT NULL
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
    # sort on µs-floored ts (the latest_per_user convention) so same-µs
    # ties fall to event_id identically in both engines under the
    # TIMESTAMP(NANOS) contract (r7 review)
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.expr("((ts - pmod(ts, 1000)) div 1000) * 1000")
    )
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

    # µs-truncate BEFORE the history build (the latest_per_user
    # convention): the oracle emits epoch_ns of a µs-precision
    # timestamp, so under the TIMESTAMP(NANOS) contract raw-ns
    # valid_from/valid_to would carry sub-µs digits the oracle cannot
    # see — hash-divergent the day the driver ships nanos testdata
    # (r7 review finding; same-µs ordering ties flip too)
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("((ts - pmod(ts, 1000)) div 1000) * 1000").alias("ts"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
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
buckets AS (
    -- every bucket with ANY event (even all-NULL-valued) bounds the
    -- spine, matching the operator's groupBy over all events
    SELECT user_id, bucket_id FROM ev GROUP BY user_id, bucket_id
),
latest_nn AS (
    -- latest NON-NULL value per bucket, matching the operator's
    -- max(struct) over non-null-valued events
    SELECT user_id, bucket_id, vc AS value_c
    FROM (
        SELECT user_id, bucket_id, vc,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, bucket_id
                   ORDER BY tns DESC, event_id DESC
               ) AS rn
        FROM ev WHERE vc IS NOT NULL
    ) WHERE rn = 1
),
spine AS (
    SELECT user_id, unnest(range(MIN(bucket_id), MAX(bucket_id) + 1))
               AS bucket_id
    FROM buckets GROUP BY user_id
)
SELECT user_id, bucket_id, value_c,
       -- filled = the value CAME FROM an earlier bucket (own bucket had
       -- no non-null value AND something actually carried) — r8 review
       CAST(own_value IS NULL AND value_c IS NOT NULL AS INTEGER) AS filled
FROM (
    SELECT s.user_id, s.bucket_id,
           last_value(l.value_c IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.bucket_id
               ROWS UNBOUNDED PRECEDING
           ) AS value_c,
           l.value_c AS own_value
    FROM spine s
    LEFT JOIN latest_nn l USING (user_id, bucket_id)
)
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


def q_from_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-driven JSON parsing with the NATIVE ``from_json`` parser
    (vs ``events_json``'s regexp extraction): parse ``props`` to a
    typed struct, then aggregate the extracted field. The engine's
    structured-JSON path — schema projection happens inside the parser,
    not post-hoc string surgery."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json(F.col("props"), "k LONG").alias("p"), "event_type"
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


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: counts of (previous event type →
    next event type) steps per user under the total order (ts,
    event_id) — the Markov-chain view of user behavior behind
    next-action prediction and funnel discovery. ONE lag window per
    user (the sessionization plan shape) + one pair aggregate; no
    self-joins."""
    ev = _t(spark, sf_dir, "events")
    # µs-floored order key (latest_per_user convention): same-µs ties
    # must fall to event_id identically in both engines (r7 review)
    ts_us = F.expr("(ts - pmod(ts, 1000)) div 1000")
    w = Window.partitionBy("user_id").orderBy(
        ts_us.asc(), F.col("event_id").asc()
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
    # µs-floored order key throughout (latest_per_user convention, r7
    # review): same-µs ties must fall to event_id in both engines
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.expr("(ts - pmod(ts, 1000)) div 1000")
    )
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


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via bucket equi-join + residual filter (no
    nested-loop θ-join): views falling in the 30 minutes after each error
    event, counted per error (zero-preserving left join)."""
    # µs-floored boundaries (r7 review): the oracle's epoch_ns sees µs
    # precision, so a view 500 ns before an error must land on the same
    # side of the >= boundary in both engines
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.expr("((ts - pmod(ts, 1000)) div 1000) * 1000")
    )
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


def q_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge (``analytics.apply_changelog``): even-event rows build
    the per-user snapshot (latest value), odd-event rows form the
    changelog (clicks delete, everything else upserts); the latest
    change per key wins and the snapshot is touched only by one key
    anti-join. The MERGE INTO shape on plain parquet."""
    from dataproc_spark.extensions.analytics import apply_changelog

    # µs-truncated ns, matching the oracle's epoch_ns view of the data
    # (r7 review: raw-ns ts values and same-µs tie-breaks would diverge
    # under the TIMESTAMP(NANOS) contract)
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.expr("((ts - pmod(ts, 1000)) div 1000) * 1000").alias("ts"),
        "event_type",
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
WHERE NOT EXISTS (SELECT 1 FROM latest l
                  WHERE l.user_id IS NOT DISTINCT FROM s.user_id)
UNION ALL
-- null-safe op/key tests mirror the engine: a NULL op upserts
-- (it is not a delete) and a NULL key still merges
SELECT user_id, ts, value_c FROM latest WHERE op IS DISTINCT FROM 'D'
"""
