"""Tests for table-layout helpers (bucketed joins must be shuffle-free,
partitioned reads must prune) and streaming watermark semantics."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dataproc_spark import storage


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped at the end. Clean any stale state first:
    # a previously killed run can leave orphaned table directories that
    # make saveAsTable fail with LOCATION_ALREADY_EXISTS.
    import shutil

    for t in ("t_left", "t_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    storage.write_bucketed(left, "t_left", ["k"], num_buckets=8, sort_cols=["k"])
    storage.write_bucketed(right, "t_right", ["k"], num_buckets=8, sort_cols=["k"])
    joined = storage.read_table(spark, "t_left").join(
        storage.read_table(spark, "t_right"), "k"
    )
    assert joined.count() == 1000
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS t_left")
    spark.sql("DROP TABLE IF EXISTS t_right")


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.range(0, 100).select(
        (F.col("id") % 4).alias("shard"), F.col("id").alias("v")
    )
    path = str(tmp_path / "parts")
    storage.write_partitioned(df, path, ["shard"])
    back = spark.read.parquet(path).where(F.col("shard") == 2)
    assert back.count() == 25
    plan = _plan(back)
    # partition pruning: the shard predicate appears as a PartitionFilter,
    # and only one of four directories is listed
    assert "PartitionFilters" in plan
    assert back.rdd.getNumPartitions() <= 4


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """Event-time watermark semantics: a row arriving a micro-batch later,
    with event time older than (max seen - watermark), is dropped from its
    (already closed) window aggregate."""
    import uuid as _uuid

    h = 3_600_000_000_000  # 1 hour in ns
    d = str(tmp_path / "stream_in")
    import os

    os.makedirs(d)
    # Watermark drops require the window state to be already EVICTED: a row
    # arriving while its window state is still open merges in even when
    # older than the watermark (the lateness bound is a minimum guarantee).
    # Three micro-batches: b0 seeds h0+h10 (watermark -> h8, h0 still
    # open); b1 (h14) lets h0 emit+evict and moves the watermark to h12;
    # b2's late h0 row then hits evicted state and is dropped.
    batches = [
        ("batch1", [0 * h + 10, 10 * h + 10]),
        ("batch2", [14 * h + 10]),
        ("batch3", [0 * h + 20]),  # late: its window was evicted in b1
    ]
    for i, (fname, tss) in enumerate(batches):
        pq.write_table(
            pa.table({
                "ts": pa.array(tss, type=pa.int64()),
                "event_type": pa.array(["a"] * len(tss)),
                "value": pa.array([1.0] * len(tss)),
            }),
            f"{d}/{fname}.parquet",
        )
        # file source orders micro-batches by modification time
        os.utime(f"{d}/{fname}.parquet", (1_700_000_000 + 100 * i,) * 2)

    from dataproc_spark.extensions.streaming import with_event_time

    stream = (
        spark.readStream.schema("ts long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    agg = (
        with_event_time(stream)
        .withWatermark("event_time", "2 hours")
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            (F.unix_timestamp("window.start") / 3600).cast("long").alias("hour"),
            "n",
        )
    )
    name = f"wm_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")  # append emits only watermark-closed windows
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.hour, r.n) for r in spark.table(name).collect()}
    # h0 closed with exactly 1 event (late row dropped against evicted
    # state — with it surviving, a second (0, 1) row or (0, 2) would
    # appear); h10 closed with 1; h14 stays open (never emitted)
    assert got == {(0, 1), (10, 1)}


def test_stream_to_parquet_sink(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from dataproc_spark.extensions.streaming import stream_to_parquet

    src = str(tmp_path / "in")
    import os

    os.makedirs(src)
    pq.write_table(
        pa.table({"k": pa.array([1, 1, 2], type=pa.int64()),
                  "v": pa.array([10.0, 20.0, 30.0])}),
        f"{src}/data.parquet",
    )
    stream = spark.readStream.schema("k long, v double").parquet(src)
    agg = stream.groupBy("k").agg(F.sum("v").alias("total"))
    out = str(tmp_path / "out")
    stream_to_parquet(
        agg, out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        mode="overwrite", output_mode="complete",
    )
    back = {(r.k, r.total) for r in spark.read.parquet(out).collect()}
    assert back == {(1, 30.0), (2, 30.0)}


def test_approx_aggregates_within_bounds(spark):
    from pyspark.sql import functions as F

    from dataproc_spark.extensions import approx

    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 997).alias("v")
    )
    prof = {r.g: (r.n_rows, r.approx_distinct)
            for r in approx.distinct_profile(df, "g", "v", rsd=0.02).collect()}
    for g, (n_rows, ad) in prof.items():
        assert n_rows == n // 4
        # true distinct per group is 997; HLL at rsd=0.02 stays within ~3 sd
        assert abs(ad - 997) <= 997 * 0.06, (g, ad)
    qs = df.agg(approx.approx_quantiles("v", [0.5, 0.9]).alias("q")).first()["q"]
    assert abs(qs[0] - 498) <= 20 and abs(qs[1] - 897) <= 25


def test_write_shard_results_round_trip(spark, tmp_path):
    from dataproc_spark.io import load_shard_results, write_shard_results

    df = spark.createDataFrame(
        [(q, r, 10 + q, 100 + q, float(q), s, 0)
         for q in range(4) for s in range(3) for r in range(5)],
        schema="query int, rank int, ldocid long, gdocid long, "
               "score double, shard int, bucket int",
    )
    base = str(tmp_path / "run")
    paths = write_shard_results(df, base)
    assert len(paths) == 3
    assert all("#"
               in p and p.endswith(".results-1") for p in paths)
    back = load_shard_results(spark, base, 3)
    assert back.count() == 60
    # shard survives as a data column with correct values
    from pyspark.sql import functions as F
    per_shard = {r.shard: r.n for r in
                 back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_shard == {0: 20, 1: 20, 2: 20}


def test_session_window_matches_lag_formulation(spark):
    from dataproc_spark.extensions.streaming import session_stats, session_window_stats

    m = 60 * 1_000_000_000
    rows = [
        (1, 100, 0 * m), (2, 100, 10 * m), (3, 100, 50 * m),
        (4, 200, 0 * m), (5, 200, 100 * m),
    ]
    ev = spark.createDataFrame(rows, schema="event_id long, user_id long, ts long")
    a = {(r.user_id, r.n_sessions, r.max_session_events, r.n_events_total)
         for r in session_stats(ev, 30).collect()}
    b = {(r.user_id, r.n_sessions, r.max_session_events, r.n_events_total)
         for r in session_window_stats(ev, 30).collect()}
    assert a == b == {(100, 2, 2, 3), (200, 2, 1, 2)}


def test_parse_props(spark):
    from dataproc_spark.extensions.streaming import parse_props

    ev = spark.createDataFrame(
        [(1, '{"k": 42}'), (2, "not json"), (3, '{"k": 7}')],
        schema="event_id long, props string",
    )
    out = parse_props(ev)
    got = {(r.event_id, r.props_parsed.k if r.props_parsed else None)
           for r in out.collect()}
    assert got == {(1, 42), (2, None), (3, 7)}


def test_stream_sessions_late_event_across_batches(spark, tmp_path):
    """r1-review hazard: events arriving in a later micro-batch with
    earlier timestamps must not mint phantom sessions (interval state)."""
    import os
    import time

    import pandas as pd

    from dataproc_spark.extensions.streaming import stream_session_counts

    MIN = 60 * 1_000_000_000
    t0 = 1_700_000_000_000_000_000
    d = tmp_path / "ev"
    d.mkdir()
    f1, f2 = d / "a.parquet", d / "b.parquet"
    # user 1: batch 1 sees only the LAST event; the two earlier events
    #   arrive in batch 2 -> correct answer is 2 sessions (gap 30 min)
    # user 2: batch 1 sees two events 40 min apart (2 sessions); the
    #   batch-2 event lands between and bridges them -> 1 session
    pd.DataFrame(
        {"user_id": [1, 2, 2], "ts": [t0 + 120 * MIN, t0, t0 + 40 * MIN]}
    ).to_parquet(f1)
    pd.DataFrame(
        {"user_id": [1, 1, 2], "ts": [t0, t0 + 10 * MIN, t0 + 20 * MIN]}
    ).to_parquet(f2)
    now = time.time()
    os.utime(f1, (now - 100, now - 100))
    os.utime(f2, (now, now))
    out = stream_session_counts(spark, str(d), gap_minutes=30)
    got = {r.user_id: (r.n_sessions, r.n_events) for r in out.collect()}
    assert got == {1: (2, 3), 2: (1, 3)}


def test_stream_stream_join_buffers_across_batches(spark, tmp_path):
    """A click arriving in a LATER micro-batch than its purchase (but with
    earlier event time) must still match: stream-stream join state buffers
    the purchase until the watermark passes the range bound."""
    import os
    import time as _time

    from dataproc_spark.extensions.streaming import stream_stream_join

    h = 3_600_000_000_000  # 1 hour in ns
    d = str(tmp_path / "ssj_in")
    os.makedirs(d)

    def write(fname, rows):
        pq.write_table(
            pa.table({
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array([r[1] for r in rows], type=pa.int64()),
                "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
            }),
            f"{d}/{fname}.parquet",
        )

    # batch1: the purchase (t=10h) and an out-of-range click (t=5h)
    write("batch1", [(1, 10 * h, 7, "purchase"), (2, 5 * h, 7, "click")])
    _time.sleep(1.1)  # file source orders micro-batches by mod time
    # batch2: a click 30 min BEFORE the purchase, arriving after it
    write("batch2", [(3, 10 * h - h // 2, 7, "click")])

    out = stream_stream_join(spark, d, gap_hours=1).collect()
    assert {(r.purchase_id, r.click_id) for r in out} == {(1, 3)}
    assert out[0].delta_us == (h // 2) // 1000


def test_bounded_dedup_evicts_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics: a duplicate whose twin's
    state expired (watermark > twin + delay) but which itself is NOT late
    (event time >= watermark) is counted AGAIN — the documented trade for
    bounded state. Duplicates within the delay are suppressed.

    Timestamps sit far from epoch 0: the INITIAL watermark is 0, and the
    late-row filter drops anything at or below it — epoch-adjacent events
    would vanish in the very first batch.
    """
    import os
    import time as _time

    from dataproc_spark.extensions.streaming import stream_dedup_bounded

    m = 60_000_000_000  # 1 minute in ns
    base = 1000 * 60 * m  # hour-aligned, far from epoch
    d = str(tmp_path / "bdedup_in")
    os.makedirs(d)

    def write(fname, rows):
        pq.write_table(
            pa.table({
                "ts": pa.array([r[0] for r in rows], type=pa.int64()),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            }),
            f"{d}/{fname}.parquet",
        )

    # b1: user 1 at base (twice — in-delay dup suppressed); user 3 at
    # base+75min advances the watermark (30 min delay) to base+45min,
    # which expires user 1's dedup state (expiry base+30min)
    write("batch1", [(base, 1), (base + m, 1), (base + 75 * m, 3)])
    _time.sleep(1.1)
    # b2: eviction commits at batch END, so an intermediate batch lets
    # user 1's expired state actually leave the store (the row is an
    # in-delay duplicate for user 3 — suppressed, count unchanged)
    write("batch2", [(base + 76 * m, 3)])
    _time.sleep(1.1)
    # b3: same (user 1, hour) key at base+50min — newer than the
    # watermark (not late) but its twin's state is gone: counted again
    write("batch3", [(base + 50 * m, 1)])

    out = {
        r.user_id: r.n_active_hours
        for r in stream_dedup_bounded(spark, d, watermark="30 minutes").collect()
    }
    assert out[3] == 1
    assert out[1] == 2  # the same hour counted twice across eviction


def test_stream_funnel_late_view_across_batches(spark, tmp_path):
    """Order-independence: a 'view' arriving in a LATER micro-batch with
    an EARLIER timestamp must retroactively qualify a click/purchase the
    first batch already saw — a (t_view, t_click, ...) cursor cannot do
    this; per-step timestamp state can."""
    import os
    import time

    import pandas as pd

    from dataproc_spark.extensions.streaming import stream_funnel_counts

    t0 = 1_700_000_000_000_000_000
    S = 1_000_000_000
    d = tmp_path / "ev"
    d.mkdir()
    f1, f2 = d / "a.parquet", d / "b.parquet"
    # user 1: batch 1 has click@20 and purchase@30 but NO view -> steps 0
    #   (user absent); batch 2 delivers the late view@10 -> steps 3.
    # user 2: batch 1 has view@50, click@40 (click BEFORE view -> steps 1);
    #   batch 2 delivers a late view@35 -> click@40 now qualifies -> 2.
    pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2],
            "ts": [t0 + 20 * S, t0 + 30 * S, t0 + 50 * S, t0 + 40 * S],
            "event_type": ["click", "purchase", "view", "click"],
        }
    ).to_parquet(f1)
    pd.DataFrame(
        {
            "user_id": [1, 2],
            "ts": [t0 + 10 * S, t0 + 35 * S],
            "event_type": ["view", "view"],
        }
    ).to_parquet(f2)
    now = time.time()
    os.utime(f1, (now - 100, now - 100))
    os.utime(f2, (now, now))
    out = stream_funnel_counts(spark, str(d))
    got = {r.user_id: (r.t_view, r.t_click, r.t_purchase, r.steps)
           for r in out.collect()}
    assert got == {
        1: (t0 + 10 * S, t0 + 20 * S, t0 + 30 * S, 3),
        2: (t0 + 35 * S, t0 + 40 * S, None, 2),
    }


def test_write_training_shards_physical_order(spark, tmp_path):
    """The shard files must physically store rows in `pos` order so a
    trainer streaming shard k front-to-back reads the exact shuffle_order
    permutation — verified by reading the parquet files directly with
    pyarrow (no Spark read that could reorder)."""
    import glob

    import pyarrow.parquet as pq

    from dataproc_spark.extensions.corpus import (
        shuffle_order,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)],
        schema="doc_id long, text string",
    )
    out = str(tmp_path / "shards")
    write_training_shards(df, out, salt="e1")
    expect = {
        (r.shard, r.pos): r.doc_id
        for r in shuffle_order(df, salt="e1").collect()
    }
    seen = 0
    for shard_dir in sorted(glob.glob(f"{out}/shard=*")):
        shard = int(shard_dir.rsplit("=", 1)[1])
        rows = []
        for f in sorted(glob.glob(f"{shard_dir}/*.parquet")):
            t = pq.read_table(f, columns=["pos", "doc_id"])
            rows.extend(zip(t["pos"].to_pylist(), t["doc_id"].to_pylist()))
        assert [p for p, _ in rows] == sorted(p for p, _ in rows), shard
        for p, d in rows:
            assert expect[(shard, p)] == d
            seen += 1
    assert seen == 200


def test_stream_to_parquet_resumes_from_checkpoint(spark, tmp_path):
    """Restarting a drained stream with the SAME checkpoint must process
    only files that arrived since — no reprocessing, no duplicate rows in
    the sink (the exactly-once resume contract a production ingest relies
    on)."""
    import pandas as pd

    from dataproc_spark.extensions.streaming import (
        _file_stream,
        stream_to_parquet,
    )

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    t0 = 1_700_000_000_000_000_000
    pd.DataFrame(
        {"user_id": [1, 2], "ts": [t0, t0 + 1], "event_id": [1, 2]}
    ).to_parquet(src / "a.parquet")

    stream_to_parquet(_file_stream(spark, str(src)), out, checkpoint_dir=ck)
    first = spark.read.parquet(out)
    assert first.count() == 2

    pd.DataFrame(
        {"user_id": [3], "ts": [t0 + 2], "event_id": [3]}
    ).to_parquet(src / "b.parquet")
    stream_to_parquet(_file_stream(spark, str(src)), out, checkpoint_dir=ck)
    back = spark.read.parquet(out)
    assert back.count() == 3, "resume must add only the new file's rows"
    assert {r.event_id for r in back.collect()} == {1, 2, 3}


def test_stream_funnel_state_compacts(spark, tmp_path):
    """Watermark-driven state compaction, proven by reading the state
    store back: once the watermark passes a chain prefix, the prefix
    folds into the `resolved` array and the per-step timestamp pools are
    cleared (first unresolved step keeps only its current minimum;
    later steps keep only the post-watermark tail), and an event-time
    timeout is armed instead of NoTimeout. A bot user emitting views
    forever no longer grows an unbounded state row."""
    import os
    import time as _time

    import pandas as pd

    from dataproc_spark.extensions.streaming import stream_funnel_counts

    t0 = 1_700_000_000_000_000_000
    S = 1_000_000_000
    d = str(tmp_path / "fev")
    ck = str(tmp_path / "fck")
    os.makedirs(d)
    # b1: user 1 "bot" with 5 views + a click; user 99's far-future view
    # advances the watermark (30 min delay) past all of user 1's events
    pd.DataFrame(
        {
            "user_id": [1] * 6 + [99],
            "ts": [t0 + 100 * S, t0 + 101 * S, t0 + 102 * S, t0 + 103 * S,
                   t0 + 104 * S, t0 + 200 * S, t0 + 10_000 * S],
            "event_type": ["view"] * 5 + ["click", "view"],
        }
    ).to_parquet(f"{d}/a.parquet")
    # b2: user 1 purchases above the watermark -> its group is invoked
    # again and the now-final (view, click) prefix compacts
    pd.DataFrame(
        {"user_id": [1], "ts": [t0 + 9_000 * S], "event_type": ["purchase"]}
    ).to_parquet(f"{d}/b.parquet")
    now = _time.time()
    os.utime(f"{d}/a.parquet", (now - 100, now - 100))
    os.utime(f"{d}/b.parquet", (now, now))

    out = stream_funnel_counts(
        spark, d, watermark="30 minutes", checkpoint_dir=ck
    )
    got = {r.user_id: (r.t_view, r.t_click, r.t_purchase, r.steps)
           for r in out.collect()}
    # parity with the batch funnel semantics is unchanged by compaction
    assert got == {
        1: (t0 + 100 * S, t0 + 200 * S, t0 + 9_000 * S, 3),
        99: (t0 + 10_000 * S, None, None, 1),
    }

    state = {
        r.key.user_id: r.value
        for r in spark.read.format("statestore").load(ck).collect()
    }
    gs1 = state[1].groupState
    # resolved prefix folded, pools cleared/compacted: O(steps), not
    # O(lifetime funnel events) — the 5 views are GONE from state
    assert gs1.resolved == [t0 + 100 * S, t0 + 200 * S]
    assert gs1.ts_view == [] and gs1.ts_click == []
    assert gs1.ts_purchase == [t0 + 9_000 * S]
    assert gs1.n_events == 7  # the count survives compaction
    # event-time timeout armed at max(watermark, key's latest event) +
    # horizon (720h default): idle means "no activity since the key's
    # last event", and the event anchor is what keeps batch-0 keys (wm
    # still 0) evictable at all. Here the purchase at t0+9000s is later
    # than the watermark (t0+10000s − 30min = t0+8200s), so it anchors.
    evt_ms = (t0 + 9_000 * S) // 1_000_000
    assert state[1].timeoutTimestamp == evt_ms + 720 * 3_600_000


def test_stream_incremental_dedup_store_and_cross_batch(spark, tmp_path):
    """Fingerprints in the static store never emit; a duplicate arriving
    in a LATER micro-batch is suppressed by the in-stream state; only
    genuinely new fingerprints come out."""
    import hashlib
    import os
    import time

    import pandas as pd

    from dataproc_spark.extensions.streaming import stream_incremental_dedup

    MIN = 60 * 1_000_000_000
    t0 = 1_700_000_000_000_000_000
    d = tmp_path / "ev"
    d.mkdir()

    def row(u, et, v, ts):
        return {"user_id": u, "event_type": et, "value": v, "ts": ts}

    # A = (1, view, 1.0) is in the store; B repeats across batches
    pd.DataFrame([row(1, "view", 1.0, t0), row(2, "click", 2.0, t0 + MIN)]
                 ).to_parquet(d / "a.parquet")
    pd.DataFrame([row(2, "click", 2.0, t0 + 2 * MIN),
                  row(3, "buy", 3.0, t0 + 3 * MIN)]).to_parquet(d / "b.parquet")
    now = time.time()
    os.utime(d / "a.parquet", (now - 100, now - 100))
    os.utime(d / "b.parquet", (now, now))

    def fp(*fields):
        # the v3 length-prefixed encoding, built independently here so
        # the test arbitrates the shared function
        enc = "".join(
            "N" if f is None else f"V{len(str(f))}:{f}" for f in fields
        )
        return hashlib.md5(enc.encode()).hexdigest()

    fp_a = fp(1, "view", 100)
    store = spark.createDataFrame([(fp_a,)], schema="fp string")
    out = stream_incremental_dedup(spark, str(d), store)
    got = {(r.fp, r.user_id, r.event_type, r.value_c) for r in out.collect()}
    fp_b = fp(2, "click", 200)
    fp_c = fp(3, "buy", 300)
    assert got == {(fp_b, 2, "click", 200), (fp_c, 3, "buy", 300)}


def test_event_fingerprint_injection_proof(spark):
    """v3 encoding is a prefix-free code: separator/sentinel injection
    from string field values must NOT collide distinct events (r8 review
    finding — v2 collided ('7|view','x') with ('7','view|x'), and a
    literal '<NULL>' value with an actual NULL)."""
    from dataproc_spark.extensions.streaming import event_fingerprint

    rows = [("7|view", "x", 1.0), ("7", "view|x", 1.0),
            ("<NULL>", "t", 2.0), (None, "t", 2.0),
            ("V2:ab", "c", 3.0), ("V2:a", "bc", 3.0)]
    df = spark.createDataFrame(
        rows, schema="user_id string, event_type string, value double"
    )
    fps = [r.fp for r in df.select(event_fingerprint().alias("fp")).collect()]
    assert len(set(fps)) == len(fps), fps


def test_fingerprint_store_format_marker(spark, tmp_path):
    """A store stamped with an older encoding version is refused loudly
    (a silent mismatch would re-ingest all history as new); a store
    stamped with the current version, or an unstamped legacy store,
    passes validation."""
    from dataproc_spark.extensions.streaming import (
        FINGERPRINT_FORMAT,
        _check_fingerprint_store,
        stamp_fingerprint_store,
    )

    store = spark.createDataFrame([("abc",)], schema="fp string")
    # unstamped legacy store: accepted (documented migration note)
    _check_fingerprint_store(store)
    # current stamp: accepted
    stamped = stamp_fingerprint_store(store)
    assert stamped.columns == ["fp", "fp_format"]
    _check_fingerprint_store(stamped)
    # stale stamp: refused with the rebuild message
    import pytest as _pytest

    stale = store.withColumn("fp_format", F.lit(FINGERPRINT_FORMAT - 1))
    with _pytest.raises(ValueError, match="rebuild the store"):
        _check_fingerprint_store(stale)
    # MIXED store (fresh stamp appended onto stale history): must be
    # refused even when a current-format row sorts first — the r8 review
    # found a first()-based check waving the stale subset through
    mixed = stamped.unionByName(
        spark.createDataFrame([("old",)], schema="fp string").withColumn(
            "fp_format", F.lit(FINGERPRINT_FORMAT - 1)
        )
    )
    with _pytest.raises(ValueError, match="rebuild the store"):
        _check_fingerprint_store(mixed)
    # NULL markers ride the unstamped-legacy contract: accepted
    nullish = stamped.unionByName(
        spark.createDataFrame([("old",)], schema="fp string").withColumn(
            "fp_format", F.lit(None).cast("int")
        )
    )
    _check_fingerprint_store(nullish)


def test_apply_changelog_merge_semantics(spark):
    """Latest change per key wins; D deletes, U upserts, untouched keys
    carry over; a delete older than a later upsert does not win."""
    from dataproc_spark.extensions.analytics import apply_changelog

    snap = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 200), (3, 10, 300)],
        schema="user_id long, ts long, value_c long",
    )
    chg = spark.createDataFrame(
        [
            (2, 20, 1, "U", 250),   # update user 2
            (3, 20, 2, "D", 0),     # delete user 3
            (4, 20, 3, "U", 400),   # insert user 4
            (4, 15, 4, "D", 0),     # older delete of 4 -> loses to the U
        ],
        schema="user_id long, ts long, event_id long, op string, value_c long",
    )
    out = apply_changelog(snap, chg)
    got = {(r.user_id, r.ts, r.value_c) for r in out.collect()}
    assert got == {(1, 10, 100), (2, 20, 250), (4, 20, 400)}


def test_z_value_matches_python_interleave(spark):
    from dataproc_spark.storage import z_value

    df = spark.createDataFrame(
        [(5, 3), (0, 0), (4095, 4095), (1, 2)], schema="a long, b long"
    )
    out = {(r.a, r.b): r.z for r in df.select("a", "b", z_value(["a", "b"]).alias("z")).collect()}

    def morton(a, b, bits=12):
        z = 0
        for j in range(bits):
            z |= ((a >> j) & 1) << (2 * j)
            z |= ((b >> j) & 1) << (2 * j + 1)
        return z

    for (a, b), z in out.items():
        assert z == morton(a, b)


def test_write_zordered_prunes_row_groups(spark, tmp_path):
    """A 2-D box predicate must intersect strictly fewer parquet row
    groups under Z-order clustering than under single-column sorting —
    the data-skipping property the layout exists for."""
    import glob

    import pyarrow.parquet as pq

    from dataproc_spark.storage import write_zordered

    n = 200_000
    df = spark.range(n).selectExpr(
        "CAST(id % 1000 AS LONG) AS x",
        "CAST((id * 7919) % 1000 AS LONG) AS y",
    )
    plain_dir, z_dir = str(tmp_path / "plain"), str(tmp_path / "zord")
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(plain_dir))
    write_zordered(df, z_dir, ["x", "y"], bits=10, num_files=16)

    def groups_hit(d, lo, hi):
        """Row groups whose footer stats intersect y in [lo, hi] — the
        predicate is on the SECOND clustering dimension, where an
        x-sorted layout cannot prune at all."""
        hit = total = 0
        for f in glob.glob(f"{d}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            for g in range(md.num_row_groups):
                stats = {md.row_group(g).column(c).path_in_schema:
                         md.row_group(g).column(c).statistics
                         for c in range(md.row_group(g).num_columns)}
                total += 1
                if stats["y"].min <= hi and stats["y"].max >= lo:
                    hit += 1
        return hit, total

    ph, pt = groups_hit(plain_dir, 100, 150)
    zh, zt = groups_hit(z_dir, 100, 150)
    assert ph == pt            # x-sorted: every group spans all of y
    assert zh / zt <= 0.5      # z-order: most groups skipped on y alone


def test_stream_upsert_applies_batches_in_arrival_order(spark, tmp_path):
    """Two micro-batches merge sequentially into versioned snapshots:
    batch 2's change for a key REPLACES batch 1's even though it carries
    an earlier event time (the CDC log-replay contract: log position
    outranks event time across batches). Keys untouched by any batch
    carry over; deletes drop keys; v=<id> directories version the
    snapshots."""
    import os
    import time

    import pandas as pd

    from dataproc_spark.extensions.streaming import (
        _file_stream,
        read_latest_snapshot,
        stream_upsert_to_parquet,
    )

    t0 = 1_700_000_000_000_000_000
    d = tmp_path / "chg"
    d.mkdir()
    # batch 1: upsert user 1 -> 111 (ts t0+5), delete user 2
    pd.DataFrame([
        {"user_id": 1, "ts": t0 + 5, "event_id": 10, "op": "U", "value_c": 111},
        {"user_id": 2, "ts": t0 + 6, "event_id": 11, "op": "D", "value_c": 0},
    ]).to_parquet(d / "a.parquet")
    # batch 2: user 1 again with an EARLIER ts -> still wins (arrival order)
    pd.DataFrame([
        {"user_id": 1, "ts": t0 + 1, "event_id": 12, "op": "U", "value_c": 222},
        {"user_id": 4, "ts": t0 + 2, "event_id": 13, "op": "U", "value_c": 444},
    ]).to_parquet(d / "b.parquet")
    now = time.time()
    os.utime(d / "a.parquet", (now - 100, now - 100))
    os.utime(d / "b.parquet", (now, now))

    snapshot = spark.createDataFrame(
        [(1, t0, 100), (2, t0, 200), (3, t0, 300)],
        schema="user_id long, ts long, value_c long",
    )
    snap_dir = str(tmp_path / "snap")
    stream = _file_stream(spark, str(d))
    stream_upsert_to_parquet(
        stream, snapshot, snap_dir, checkpoint_dir=str(tmp_path / "ckpt")
    )
    final = read_latest_snapshot(spark, snap_dir)
    got = {(r.user_id, r.ts, r.value_c) for r in final.collect()}
    assert got == {(1, t0 + 1, 222), (3, t0, 300), (4, t0 + 2, 444)}
    versions = sorted(p for p in os.listdir(snap_dir) if p.startswith("v="))
    assert "v=-1" in versions and len(versions) == 3


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from dataproc_spark.storage import compact_parquet

    path = str(tmp_path / "many")
    spark.range(10_000).repartition(16).write.parquet(path)
    import glob

    assert len(glob.glob(f"{path}/part-*")) == 16
    n = compact_parquet(spark, path, target_bytes=10**9)
    assert n == 1
    assert len(glob.glob(f"{path}/part-*.parquet")) == 1
    assert spark.read.parquet(path).count() == 10_000


def test_vacuum_snapshots_keeps_newest(tmp_path):
    import os

    from dataproc_spark.storage import vacuum_snapshots

    snap = tmp_path / "snap"
    for v in (-1, 0, 1, 2):
        (snap / f"v={v}").mkdir(parents=True)
        (snap / f"v={v}" / "data").write_text("x")
    removed = vacuum_snapshots(str(snap), keep_last=2)
    assert removed == ["v=-1", "v=0"]
    assert sorted(os.listdir(snap)) == ["v=1", "v=2"]
    # never removes the newest even with keep_last=0
    assert vacuum_snapshots(str(snap), keep_last=0) == ["v=1"]
    assert os.listdir(snap) == ["v=2"]


def test_compact_parquet_recovers_from_crashed_swap(spark, tmp_path):
    """Crash-recovery contract (r6 ADVICE): a crash between the two
    renames leaves only '__compact_old' — the next invocation must
    restore it and complete; stale '__compact_tmp' or already-swapped
    '__compact_old' leftovers must not poison the rewrite."""
    import glob
    import os
    import shutil

    from dataproc_spark.storage import compact_parquet

    path = str(tmp_path / "data")
    spark.range(1_000).repartition(4).write.parquet(path)

    # crash between rename(path, old) and rename(tmp, path): dataset dir
    # is absent, old holds the intact pre-swap data, tmp is partial
    os.rename(path, path + "__compact_old")
    os.makedirs(path + "__compact_tmp")
    with open(path + "__compact_tmp/part-junk.parquet", "w") as fh:
        fh.write("not parquet")
    n = compact_parquet(spark, path, target_bytes=10**9)
    assert n == 1
    assert spark.read.parquet(path).count() == 1_000
    assert not os.path.exists(path + "__compact_old")
    assert not os.path.exists(path + "__compact_tmp")

    # crash after the swap but before cleanup: old lingers NEXT TO a
    # complete dataset — must be dropped, not merged or crashed on
    shutil.copytree(path, path + "__compact_old")
    n = compact_parquet(spark, path, target_bytes=10**9)
    assert n == 1
    assert spark.read.parquet(path).count() == 1_000
    assert not os.path.exists(path + "__compact_old")
    assert len(glob.glob(f"{path}/part-*.parquet")) == 1


def test_stream_upsert_replay_base_contract(tmp_path):
    """_replay_base returns the immediate predecessor and fails loudly
    when vacuum removed it (r6 ADVICE: no empty-max ValueError, no
    silent stale-base merge that drops intermediate batches)."""
    from dataproc_spark.extensions.streaming import _replay_base

    assert _replay_base([-1], 0, "d") == -1
    assert _replay_base([-1, 0, 1], 2, "d") == 1
    # crashed batch 5 replays after vacuum kept only v=3: stale base
    with pytest.raises(RuntimeError, match="vacuum"):
        _replay_base([3], 5, "d")
    # vacuum removed even the initial snapshot
    with pytest.raises(RuntimeError, match="predecessor"):
        _replay_base([], 0, "d")
    # predecessor present among later (crashed-attempt) versions is fine
    assert _replay_base([3, 4, 5], 5, "d") == 4


def test_write_zordered_wide_range_integer_exact(spark, tmp_path):
    """Columns whose (max-min)*hi exceeds 2^53 must still cluster by the
    EXACT integer z-key (r6 ADVICE: the old float scaling silently
    degraded bucket assignment). Verified by recomputing the scaled
    z-key in exact Python integers and checking every output file is
    internally sorted by it."""
    import glob

    import pyarrow.parquet as pq

    from dataproc_spark.storage import write_zordered

    n, bits = 20_000, 10
    hi = (1 << bits) - 1
    # span = n * 2^41 ~ 2^55.3 > 2^53: the float path is inexact here
    df = spark.range(n).selectExpr(
        "CAST((id * 7919) % 20000 AS LONG) * CAST(pow(2, 41) AS LONG) AS x",
        "CAST((id * 104729) % 20000 AS LONG) * CAST(pow(2, 41) AS LONG) AS y",
    )
    pdf = df.toPandas()
    mins, maxs = pdf.min(), pdf.max()

    def scale(v, mn, mx):
        span = max(int(mx) - int(mn), 1)
        d = int(v) - int(mn)
        if span * hi < (1 << 63):
            return (d * hi) // span
        return d // (span // hi + 1)

    def zkey(x, y):
        sx, sy = scale(x, mins.x, maxs.x), scale(y, mins.y, maxs.y)
        z = 0
        for j in range(bits):
            z |= ((sx >> j) & 1) << (2 * j)
            z |= ((sy >> j) & 1) << (2 * j + 1)
        return z

    out = str(tmp_path / "zwide")
    write_zordered(df, out, ["x", "y"], bits=bits, num_files=8)
    total = 0
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        t = pq.read_table(f).to_pandas()
        total += len(t)
        keys = [zkey(r.x, r.y) for r in t.itertuples()]
        assert keys == sorted(keys), f"file {f} not sorted by exact z-key"
    assert total == n


def test_stream_upsert_gate_shard_tolerant(spark, tmp_path):
    """The stream_upsert gate's one-micro-batch oracle precondition must
    not depend on the testdata shipping as a single file: against a
    3-file sharded copy of events.parquet the gate returns the identical
    snapshot (max_files_per_trigger=None takes all shards in one
    batch)."""
    import glob

    from dataproc_spark.queries import q_stream_upsert

    sf = "/root/testdata/sf0.001"
    base = {tuple(r) for r in q_stream_upsert(spark, sf).collect()}
    root = str(tmp_path / "sharded_sf")
    import os

    os.makedirs(root)
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ev.repartition(3).write.parquet(f"{root}/events.parquet")
    assert len(glob.glob(f"{root}/events.parquet/part-*")) >= 3
    sharded = {tuple(r) for r in q_stream_upsert(spark, root).collect()}
    assert sharded == base and len(base) > 0


def test_write_zordered_full_long_range_no_wrap(spark, tmp_path):
    """A column spanning more than half the int64 range (e.g. xxhash64
    keys) must still produce monotone, in-range z-lanes — the naive
    `col - min` subtraction wraps for such spans (r7 review finding)."""
    import glob

    import pyarrow.parquet as pq

    from dataproc_spark.storage import write_zordered

    n, bits = 5_000, 8
    df = spark.range(n).selectExpr(
        "xxhash64(id) AS x", "xxhash64(id, 7L) AS y"
    )
    out = str(tmp_path / "zhash")
    write_zordered(df, out, ["x", "y"], bits=bits, num_files=4)
    total = 0
    # within each file the x-lane quotients must be non-decreasing in z,
    # and critically the write must not scramble: re-read and count
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        total += pq.read_table(f).num_rows
    assert total == n
    # the z-clustering property: x-range per file strictly narrower than
    # the global range for at least one file (a wrapped key degenerates
    # to arbitrary scatter, where every file spans ~the full range)
    spans = []
    glob_min, glob_max = None, None
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        t = pq.read_table(f, columns=["x"]).to_pandas()
        spans.append(int(t.x.max()) - int(t.x.min()))
        glob_min = min(glob_min, int(t.x.min())) if glob_min is not None else int(t.x.min())
        glob_max = max(glob_max, int(t.x.max())) if glob_max is not None else int(t.x.max())
    assert min(spans) < (glob_max - glob_min) * 0.9


def test_compact_parquet_recovers_crashed_partition_swap(spark, tmp_path):
    """A PARTITION that crashed mid-swap leaves only its scratch sibling
    inside the root; the next root invocation must restore it before
    compacting (r8 follow-up review finding — previously the partition's
    data stayed stranded forever, and a single-partition root even
    raised 'no parquet data files found')."""
    import glob
    import os

    from dataproc_spark.storage import compact_parquet

    root = str(tmp_path / "sink")
    spark.range(500).withColumn("batch", F.lit(0)).write.partitionBy(
        "batch"
    ).parquet(root)
    spark.range(500, 1000).repartition(4).write.mode("overwrite").parquet(
        f"{root}/batch=1"
    )
    # crash mid-swap of batch=1: the partition dir is renamed away
    os.rename(f"{root}/batch=1", f"{root}/.batch=1__compact_old")
    n = compact_parquet(spark, root, target_bytes=10**9)
    assert n >= 2  # both partitions compacted
    got = spark.read.parquet(root)
    assert got.count() == 1000
    assert not os.path.exists(f"{root}/.batch=1__compact_old")

    # legacy (pre-dot) naming from a crash under the old scheme heals too
    os.rename(f"{root}/batch=1", f"{root}/batch=1__compact_old")
    compact_parquet(spark, root, target_bytes=10**9)
    assert spark.read.parquet(root).count() == 1000
    assert not os.path.exists(f"{root}/batch=1__compact_old")


def test_compact_scratch_dirs_invisible_to_readers(spark, tmp_path):
    """Scratch dirs are dot-prefixed, so Spark's partition discovery on
    the root ignores a mid-rewrite (or crash-leftover) temp dir instead
    of surfacing it as a bogus extra partition with duplicated rows."""
    import os

    root = str(tmp_path / "sink")
    spark.range(100).withColumn("batch", F.lit(0)).write.partitionBy(
        "batch"
    ).parquet(root)
    # a concurrent compaction of batch=0 is mid-rewrite: its full tmp
    # copy exists under the dot name
    spark.read.parquet(f"{root}/batch=0").write.parquet(
        f"{root}/.batch=0__compact_tmp"
    )
    got = spark.read.parquet(root)
    assert got.count() == 100  # not 200
    assert [r.batch for r in got.select("batch").distinct().collect()] == [0]
    os.system(f"rm -rf {root}/.batch=0__compact_tmp")


def test_stream_session_counts_skips_null_ts(spark, tmp_path):
    """A NULL ts row must be skipped (like batch sessionize), not crash
    the whole query with int(NaN)."""
    from dataproc_spark.extensions.streaming import stream_session_counts

    d = tmp_path / "ev"
    d.mkdir()
    S = 1_000_000_000
    t0 = 1_700_000_000 * S
    pq.write_table(
        pa.table({
            "user_id": pa.array([1, 1, 1], type=pa.int64()),
            "ts": pa.array([t0, None, t0 + 10_000 * S], type=pa.int64()),
        }),
        f"{d}/f.parquet",
    )
    got = {r.user_id: (r.n_sessions, r.n_events)
           for r in stream_session_counts(spark, str(d)).collect()}
    assert got == {1: (2, 2)}


def test_file_stream_escapes_glob_metacharacters(spark, tmp_path):
    """A single-file path whose NAME contains glob metacharacters must
    still stream its rows (pathGlobFilter is a glob; unescaped it
    matches nothing and the stream silently drains empty)."""
    from dataproc_spark.extensions.streaming import _file_stream

    f = tmp_path / "events[2024].parquet"
    pq.write_table(
        pa.table({"ts": pa.array([1, 2, 3], type=pa.int64())}), str(f)
    )
    from dataproc_spark.extensions.streaming import _drain

    got = _drain(_file_stream(spark, str(f)), "append", "globesc")
    assert got.count() == 3


def test_read_latest_snapshot_empty_dir_is_loud(spark, tmp_path):
    from dataproc_spark.extensions.streaming import read_latest_snapshot

    empty = tmp_path / "snap"
    empty.mkdir()
    with pytest.raises(RuntimeError, match="no v=<id> snapshot"):
        read_latest_snapshot(spark, str(empty))
    with pytest.raises(RuntimeError, match="no v=<id> snapshot"):
        read_latest_snapshot(spark, str(tmp_path / "missing"))


def test_stream_funnel_duplicate_steps_raise(spark, tmp_path):
    from dataproc_spark.extensions.streaming import stream_funnel_counts

    with pytest.raises(ValueError, match="distinct"):
        stream_funnel_counts(spark, str(tmp_path), steps=("view", "view"))


def test_stream_funnel_batch0_keys_get_timeout(spark, tmp_path):
    """Keys whose ONLY batch arrives while the watermark is still 0 (the
    initial backlog) must still have the idle-eviction timeout armed —
    anchored at the key's own latest event — or their state lives
    forever (r8 follow-up review finding)."""
    import pandas as pd

    from dataproc_spark.extensions.streaming import stream_funnel_counts

    d = tmp_path / "ev"
    d.mkdir()
    S = 1_000_000_000
    t0 = 1_700_000_000 * S
    pd.DataFrame({
        "user_id": [1, 1],
        "ts": [t0, t0 + 60 * S],
        "event_type": ["view", "click"],
    }).to_parquet(f"{d}/only.parquet")
    ck = str(tmp_path / "ck")
    stream_funnel_counts(spark, str(d), checkpoint_dir=ck)
    state = {
        r.key.user_id: r.value
        for r in spark.read.format("statestore").load(ck).collect()
    }
    # single micro-batch: watermark was 0 throughout, yet the timeout is
    # armed at latest-event + horizon (720h default)
    evt_ms = (t0 + 60 * S) // 1_000_000
    assert state[1].timeoutTimestamp == evt_ms + 720 * 3_600_000
