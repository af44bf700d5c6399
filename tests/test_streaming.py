"""Streaming twins must agree with their batch counterparts once the
stream is fully drained (availableNow + watermark-closed windows)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from team_aragon_spark.sources.catalog import read_table
from team_aragon_spark.streaming import events_stream as es

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-encode the ns-timestamp events parquet as µs for the file source."""
    out = tmp_path_factory.mktemp("events_us")
    read_table(spark, "events", SF_SMOKE).coalesce(2).write.mode("overwrite").parquet(str(out))
    return str(out)


def test_hourly_stream_matches_batch(spark, events_dir, tmp_path_factory):
    stream = es.read_events_stream(spark, events_dir)
    result = es.run_to_completion(
        es.hourly_event_stats_stream(stream),
        "hourly_out",
        str(tmp_path_factory.mktemp("ckpt1")),
    )
    batch = (
        read_table(spark, "events", SF_SMOKE)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    s = {tuple(r) for r in result.collect()}
    b = {tuple(r) for r in batch.collect()}
    # append-mode emits only watermark-closed windows; every emitted
    # window must match batch exactly, and most windows must be emitted.
    assert s <= b
    assert len(s) >= len(b) - 24  # at most the tail beyond the watermark is open


def test_session_stream_runs(spark, events_dir, tmp_path_factory):
    stream = es.read_events_stream(spark, events_dir)
    result = es.run_to_completion(
        es.user_sessions_stream(stream),
        "sessions_out",
        str(tmp_path_factory.mktemp("ckpt2")),
    )
    rows = result.collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)


def test_session_stream_converges_to_batch_on_closed_sessions(
    spark, events_dir, tmp_path_factory
):
    """q102's value contract, not just liveness: stage the events plus
    ONE sentinel event 10 days later (single fake user), so the final
    watermark passes every real session's close — session_window must
    then emit exactly the batch lag+cumsum sessionizer's answer
    (user_id, session_start=min ts, n_events) for every real user."""
    import datetime

    from team_aragon_spark.operators import windows as W

    ev = read_table(spark, "events", SF_SMOKE)
    mx = ev.agg(F.max("ts").cast("timestamp")).collect()[0][0]
    src = tmp_path_factory.mktemp("sess_conv_src")
    spark.read.parquet(events_dir).write.mode("append").parquet(str(src))
    sentinel = spark.createDataFrame(
        [(10**9, mx + datetime.timedelta(days=10), -1, "flush", 0.0, "{}")],
        es.EVENTS_STREAM_SCHEMA,
    )
    sentinel.coalesce(1).write.mode("append").parquet(str(src))

    result = es.run_to_completion(
        es.user_sessions_stream(es.read_events_stream(spark, str(src))),
        "sessions_conv_out",
        str(tmp_path_factory.mktemp("ckpt_sc")),
    )
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in result.collect()
        if r.user_id != -1
    }
    batch = (
        W.sessionize(ev)
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.col("ts").cast("timestamp")).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    expect = {(r.user_id, r.session_start, r.n_events) for r in batch.collect()}
    assert got == expect
    assert len(expect) > 0


def test_session_window_exact_gap_boundary_merges(spark, tmp_path_factory):
    """Pins the q151 oracle's boundary convention: two events EXACTLY
    gap (30 min) apart MERGE into one session under Spark's
    session_window, matching the lag+cumsum oracle's strict
    ``diff > gap`` split rule (is_new only when strictly greater).
    The corpus has no exact-boundary gap, so without this plant the
    oracle agreement would be data-dependent."""
    import datetime

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    gap = datetime.timedelta(minutes=30)
    rows = [
        # user 1: exactly gap apart -> ONE session of 2 (the pin)
        (1, base, 1, "click", 0.0, "{}"),
        (2, base + gap, 1, "click", 0.0, "{}"),
        # user 2: 1s inside the gap -> one session of 2
        (3, base, 2, "click", 0.0, "{}"),
        (4, base + gap - datetime.timedelta(seconds=1), 2, "click", 0.0, "{}"),
        # user 3: 1s beyond the gap -> two sessions of 1
        (5, base, 3, "click", 0.0, "{}"),
        (6, base + gap + datetime.timedelta(seconds=1), 3, "click", 0.0, "{}"),
    ]
    src = tmp_path_factory.mktemp("sess_boundary_src")
    planted = spark.createDataFrame(rows, es.EVENTS_STREAM_SCHEMA)
    planted.coalesce(1).write.mode("append").parquet(str(src))
    sentinel = spark.createDataFrame(
        [(10**9, base + datetime.timedelta(days=10), -1, "flush", 0.0, "{}")],
        es.EVENTS_STREAM_SCHEMA,
    )
    sentinel.coalesce(1).write.mode("append").parquet(str(src))
    result = es.run_to_completion(
        es.user_sessions_stream(es.read_events_stream(spark, str(src))),
        "sessions_boundary_out",
        str(tmp_path_factory.mktemp("ckpt_sb")),
    )
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in result.collect()
        if r.user_id != -1
    }
    assert got == {
        (1, base, 2),
        (2, base, 2),
        (3, base, 1),
        (3, base + gap + datetime.timedelta(seconds=1), 1),
    }


def test_sliding_stream_runs(spark, events_dir, tmp_path_factory):
    stream = es.read_events_stream(spark, events_dir)
    result = es.run_to_completion(
        es.sliding_value_stream(stream),
        "sliding_out",
        str(tmp_path_factory.mktemp("ckpt3")),
    )
    assert result.count() > 0


def test_stateful_running_totals_match_batch(spark, events_dir, tmp_path_factory):
    """applyInPandasWithState lifetime totals: after draining the whole
    stream, the LAST emit per user must equal the batch groupBy —
    regardless of how availableNow split the input into micro-batches."""
    from team_aragon_spark.streaming.stateful import running_user_totals_stream

    stream = es.read_events_stream(spark, events_dir)
    q = (
        running_user_totals_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt4")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM user_totals").collect()
    last = {}  # memory sink appends in emit order; later rows overwrite
    for r in emitted:
        last[r.user_id] = (r.n_events, r.total_value, r.max_value)
    batch = {
        r.user_id: (r.n, round(r.tot, 2), r.mx)
        for r in read_table(spark, "events", SF_SMOKE)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tot"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert last == batch


def test_stream_stream_join_matches_batch_range_join(spark, events_dir, tmp_path_factory):
    """The watermarked stream-stream join must emit exactly the pairs
    the batch bucketed range join (q41's operator) produces."""
    from team_aragon_spark.operators.range_join import interval_join

    stream = es.read_events_stream(spark, events_dir)
    result = es.run_to_completion(
        es.clicks_after_errors_stream(stream),
        "ss_join_out",
        str(tmp_path_factory.mktemp("ckpt5")),
    )
    got = {(r.user_id, r.error_id, r.click_id) for r in result.collect()}

    ev = read_table(spark, "events", SF_SMOKE)
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("w_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    expect = {
        (r.user_id, r.error_id, r.click_id)
        for r in interval_join(
            clicks, errors, "click_ts", "w_start", "w_end",
            equi_keys=["user_id"], bucket_width=86_400,
        ).collect()
    }
    assert got == expect
    assert len(expect) > 0


def test_streaming_dedup_removes_redelivered_events(spark, tmp_path_factory):
    """A source directory containing every event TWICE (simulated
    redelivery) must dedup to exactly the distinct event ids."""
    src = tmp_path_factory.mktemp("dup_src")
    base = read_table(spark, "events", SF_SMOKE).coalesce(1)
    base.write.mode("append").parquet(str(src))
    base.write.mode("append").parquet(str(src))  # redelivery
    n_distinct = base.select("event_id").distinct().count()

    stream = es.read_events_stream(spark, str(src))
    result = es.run_to_completion(
        es.deduped_events_stream(stream),
        "dedup_out",
        str(tmp_path_factory.mktemp("ckpt6")),
    )
    assert result.count() == n_distinct
    assert result.select("event_id").distinct().count() == n_distinct


def test_exactly_once_sink_epoch_replay(spark, events_dir, tmp_path_factory):
    """foreachBatch + append_batch: the drained stream lands every
    event exactly once across multiple micro-batches, and a REPLAYED
    epoch (same batch_id, as after a checkpoint-recovery) overwrites
    its own partition instead of duplicating."""
    from team_aragon_spark.pipeline.sinks import ParquetStore
    from team_aragon_spark.streaming.sink import write_stream_exactly_once

    store = ParquetStore(str(tmp_path_factory.mktemp("land")))
    # several source files + maxFilesPerTrigger=1 → several epochs
    multi = str(tmp_path_factory.mktemp("events_multi"))
    spark.read.parquet(events_dir).repartition(3).write.mode("overwrite").parquet(multi)
    events_dir = multi
    stream = (
        spark.readStream.schema(spark.read.parquet(events_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = write_stream_exactly_once(
        stream, store, "events_landed", str(tmp_path_factory.mktemp("ckpt_eo"))
    )
    q.awaitTermination()

    src = spark.read.parquet(events_dir)
    landed = store.read(spark, "events_landed")
    assert landed.count() == src.count()
    assert landed.select("event_id").distinct().count() == src.count()

    raw = spark.read.parquet(store.path("events_landed"))
    n_epochs = raw.select("__batch").distinct().count()
    assert n_epochs > 1  # maxFilesPerTrigger=1 really produced several epochs
    n_epoch0_before = raw.filter(F.col("__batch") == "epoch0").count()

    # simulate the failure-recovery replay of epoch 0: same id, 50 rows
    store.append_batch(src.limit(50), "events_landed", "epoch0")
    raw_after = spark.read.parquet(store.path("events_landed"))
    # epoch0's partition was REPLACED, no other epoch touched
    assert raw_after.filter(F.col("__batch") == "epoch0").count() == 50
    assert raw_after.count() == src.count() - n_epoch0_before + 50


def test_latest_wins_state_converges_and_is_bucket_scoped(
    spark, events_dir, tmp_path_factory
):
    """The multi-batch latest-wins drain must equal the batch q95
    aggregate value-for-value, and a micro-batch touching one user
    must rewrite ONLY that user's bucket."""
    import os

    from team_aragon_spark.streaming.sink import (
        apply_latest_wins_batch,
        latest_wins_state_stream,
    )

    state = str(tmp_path_factory.mktemp("lw_state"))
    ckpt = str(tmp_path_factory.mktemp("lw_ckpt"))
    staged = str(tmp_path_factory.mktemp("lw_src"))
    ev = spark.read.parquet(events_dir)
    # two deliveries + two drains over a shared checkpoint → two epochs
    ev.filter("pmod(event_id, 2) = 0").coalesce(1).write.mode("overwrite").parquet(staged)
    latest_wins_state_stream(spark, staged, state, ckpt)
    ev.filter("pmod(event_id, 2) = 1").coalesce(1).write.mode("append").parquet(staged)
    final = latest_wins_state_stream(spark, staged, state, ckpt)
    src = spark.read.parquet(staged)
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    batch = src.groupBy("user_id").agg(
        F.max_by("value", ordk).alias("last_value"),
        F.max_by("event_type", ordk).alias("last_event_type"),
        F.max("ts").alias("last_ts"),
    )
    got = {
        r.user_id: (r.last_value, r.last_event_type, r.last_ts)
        for r in final.collect()
    }
    want = {
        r.user_id: (r.last_value, r.last_event_type, r.last_ts)
        for r in batch.collect()
    }
    assert got == want
    # multiple real epochs were merged (maxFilesPerTrigger=1)
    epochs = [d for d in os.listdir(state) if d.startswith("epoch=")]
    assert len(epochs) > 1, epochs
    # bucket-scoped write: a batch with one user touches one bucket
    one_user = src.orderBy("event_id").limit(1)
    next_ep = max(int(e.split("=")[1]) for e in epochs) + 1
    apply_latest_wins_batch(one_user, next_ep, state)
    new_buckets = os.listdir(os.path.join(state, f"epoch={next_ep}"))
    assert len([d for d in new_buckets if d.startswith("bucket=")]) == 1


def test_latest_wins_state_replay_is_idempotent(spark, events_dir, tmp_path_factory):
    """Re-applying an epoch with the SAME batch_id (the foreachBatch
    crash-replay contract) must leave the state byte-identical: the
    merge is a semilattice join and the epoch overwrites its own
    snapshot."""
    from team_aragon_spark.streaming.sink import (
        apply_latest_wins_batch,
        read_latest_state,
    )

    state = str(tmp_path_factory.mktemp("lw_replay"))
    src = spark.read.parquet(events_dir)
    first = src.filter("event_id % 2 = 0")
    second = src.filter("event_id % 2 = 1")
    apply_latest_wins_batch(first, 0, state)
    apply_latest_wins_batch(second, 1, state)
    before = {tuple(r) for r in read_latest_state(spark, state).collect()}
    # crash between epoch-1 write and checkpoint commit: epoch 1 replays
    apply_latest_wins_batch(second, 1, state)
    after = {tuple(r) for r in read_latest_state(spark, state).collect()}
    assert after == before
    # and a duplicate DELIVERY (same rows, new epoch) also converges
    apply_latest_wins_batch(second, 2, state)
    again = {tuple(r) for r in read_latest_state(spark, state).collect()}
    assert again == before


def test_latest_wins_killed_mid_stream_recovers_from_checkpoint(
    spark, events_dir, tmp_path_factory
):
    """TRUE failure recovery, not just epoch-replay algebra: a query
    is KILLED mid-stream — batch 0 commits, batch 1 writes a PARTIAL
    state snapshot and then dies before the checkpoint commit — and a
    fresh query restarted on the SAME checkpoint must re-execute the
    uncommitted batch from the offset log (same batch_id, same files),
    overwrite the partial epoch, drain the rest, and converge to the
    batch answer exactly (q114's semilattice claim, now proven across
    a process-style restart instead of a clean drain)."""
    import os

    from team_aragon_spark.streaming.events_stream import EVENTS_STREAM_SCHEMA
    from team_aragon_spark.streaming.sink import (
        apply_latest_wins_batch,
        read_latest_state,
    )

    state = str(tmp_path_factory.mktemp("lwr_state"))
    ckpt = str(tmp_path_factory.mktemp("lwr_ckpt"))
    staged = str(tmp_path_factory.mktemp("lwr_src"))
    ev = spark.read.parquet(events_dir)
    # 4 single-file deliveries so maxFilesPerTrigger=1 yields 4 batches
    for k in range(4):
        ev.filter(f"pmod(event_id, 4) = {k}").coalesce(1).write.mode(
            "append"
        ).parquet(staged)

    class _Boom(Exception):
        pass

    def crashing_apply(b, batch_id):
        if batch_id == 1:
            # partial write: half the micro-batch lands in the epoch
            # snapshot, then the "process" dies before the commit
            apply_latest_wins_batch(b.limit(b.count() // 2), batch_id, state)
            raise _Boom("injected crash after partial epoch write")
        apply_latest_wins_batch(b, batch_id, state)

    q = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(crashing_apply)
        .option("checkpointLocation", ckpt)
        .start()
    )
    import pytest as _pt

    from pyspark.errors import StreamingQueryException

    with _pt.raises(StreamingQueryException):
        q.awaitTermination()
    # the crash landed AFTER batch 0 committed and left a partial epoch 1
    committed = os.listdir(os.path.join(ckpt, "commits"))
    assert "0" in committed and "1" not in committed
    assert os.path.isdir(os.path.join(state, "epoch=1"))  # partial snapshot
    partial_rows = spark.read.parquet(os.path.join(state, "epoch=1")).count()

    # restart on the SAME checkpoint with the non-crashing sink
    q2 = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(
            lambda b, i: apply_latest_wins_batch(b, i, state)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    final = read_latest_state(spark, state)
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    batch = spark.read.parquet(staged).groupBy("user_id").agg(
        F.max_by("value", ordk).alias("last_value"),
        F.max_by("event_type", ordk).alias("last_event_type"),
        F.max("ts").alias("last_ts"),
    )
    got = {r.user_id: (r.last_value, r.last_event_type, r.last_ts) for r in final.collect()}
    want = {r.user_id: (r.last_value, r.last_event_type, r.last_ts) for r in batch.collect()}
    assert got == want
    # the replayed batch actually re-ran under its original id: the
    # checkpoint now records batch 1 committed, and epoch 1's snapshot
    # was overwritten with the FULL micro-batch's state (>= the
    # partial's touched-state rows — equal only if the dropped half
    # introduced no new (user, bucket) state, which got==want above
    # already rules out mattering)
    assert "1" in os.listdir(os.path.join(ckpt, "commits"))
    ep1 = spark.read.parquet(os.path.join(state, "epoch=1"))
    assert ep1.count() >= partial_rows


def test_watermark_drops_late_event_across_restarts(spark, tmp_path_factory):
    """The late-data contract itself, planted: once the watermark has
    closed and emitted an hour window, a late event for that hour
    arriving in a LATER drain (same checkpoint — the watermark is
    restored from state) must be silently dropped: the window is never
    re-emitted and the late row is counted nowhere.  A companion event
    within the watermark IS counted — proving the drop is the
    watermark, not the restart."""
    import datetime

    from team_aragon_spark.streaming.events_stream import (
        EVENTS_STREAM_SCHEMA,
        hourly_event_stats_stream,
    )

    src = str(tmp_path_factory.mktemp("late_src"))
    ckpt = str(tmp_path_factory.mktemp("late_ckpt"))
    emitted = str(tmp_path_factory.mktemp("late_emit"))
    h0 = datetime.datetime(2024, 1, 1, 0, 0)

    def stage(rows):
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        q = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .parquet(src)
            .transform(hourly_event_stats_stream)
            .writeStream.foreachBatch(
                lambda b, i: b.write.mode("append").parquet(emitted)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def emissions():
        try:
            return [
                ((r.hour.hour), r.event_type, r.n_events)
                for r in spark.read.parquet(emitted).collect()
            ]
        except Exception:
            return []

    # drain 1: ten 00:xx clicks + a 12:00 driver -> watermark 10:00,
    # hour-0 window closes and emits n=10
    rows = [
        (i, h0 + datetime.timedelta(minutes=5 * (i + 1)), 1, "click", 1.0, "{}")
        for i in range(10)
    ]
    rows.append((100, h0 + datetime.timedelta(hours=12), 1, "click", 1.0, "{}"))
    stage(rows)
    drain()
    assert (0, "click", 10) in emissions()

    # drain 2: one LATE event back in hour 0 (watermark restored at
    # 10:00 from the checkpoint) + one event at 11:50 within watermark
    stage([
        (200, h0 + datetime.timedelta(minutes=30), 1, "click", 1.0, "{}"),
        (201, h0 + datetime.timedelta(hours=11, minutes=50), 1, "click", 1.0, "{}"),
    ])
    drain()

    # drain 3: far-future driver closes every remaining window
    stage([(300, h0 + datetime.timedelta(days=2), 1, "click", 1.0, "{}")])
    drain()

    got = emissions()
    hour0 = [e for e in got if e[0] == 0]
    assert hour0 == [(0, "click", 10)], (
        f"late event must be dropped, window never re-emitted: {hour0}"
    )
    assert (11, "click", 1) in got  # within-watermark companion counted
    assert (12, "click", 1) in got  # drain-1 driver emitted once closed
