"""Exactly-once streaming sink: foreachBatch → idempotent batch append.

Structured Streaming's ``foreachBatch`` hands every micro-batch a
stable ``batch_id`` that is REPLAYED WITH THE SAME ID after a failure
(the checkpoint re-offers the epoch until it commits).  Pairing that
id with :meth:`ParquetStore.append_batch` — dynamic overwrite of the
batch's own hive partition — makes the sink end-to-end exactly-once:
a replayed epoch overwrites its own partition instead of appending a
duplicate, which is precisely the dedup contract Spark asks sinks to
provide for exactly-once semantics (Structured Streaming programming
guide, "foreachBatch ... batchId ... can be used to deduplicate and
achieve exactly-once guarantees").

At 100 TB this is the standard streaming→lake landing pattern: state
lives in the checkpoint, data lands partitioned by epoch (+ the
table's own date partition), and the compactor folds epoch partitions
into scan-friendly files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from team_aragon_spark.pipeline.sinks import ParquetStore


def write_stream_exactly_once(
    stream_df: DataFrame,
    store: ParquetStore,
    table: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Land a stream into ``store``/``table`` with replay-safe epochs.

    Append-mode source semantics are the caller's concern (aggregation
    streams must be watermark-closed); this function only guarantees
    each delivered micro-batch lands exactly once.
    """

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        store.append_batch(batch_df, table, f"epoch{batch_id}")

    writer = (
        stream_df.writeStream.foreachBatch(_land)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming latest-wins keyed state (incremental CDC compaction)
# ---------------------------------------------------------------------------
#
# The streaming twin of q95's batch latest-wins aggregate: a keyed
# state table maintained incrementally by foreachBatch upserts.  Two
# design decisions carry the correctness story:
#
# 1. The state holds ONLY latest-wins fields, so the per-key merge is
#    max(struct(last_ts, last_event_id, ...)) — a semilattice join
#    (idempotent, commutative, associative).  Epoch REPLAY after a
#    crash and at-least-once DUPLICATE delivery both converge to the
#    same state with no transactional bookkeeping; counters or sums
#    would need epoch-versioned bases instead.
# 2. State is hash-bucketed by key and each micro-batch rewrites only
#    the buckets its keys touch, as a new per-epoch snapshot
#    (state/epoch=N/bucket=B).  Readers resolve each bucket to its
#    newest epoch, so per-batch write cost is O(touched-bucket
#    volume), never O(|state|); replay of epoch N rebuilds from
#    epochs < N (deterministic) and overwrites its own snapshot.
#    At 100 TB n_buckets scales up (65k buckets ~ 1-2 GB each) and a
#    compactor folds old epochs, exactly like ParquetStore epochs.


_STATE_COLS = ("last_ts", "last_event_id", "last_value", "last_event_type")


def _resolve_latest_buckets(
    state_dir: str, before_epoch: int | None = None, buckets: list[int] | None = None
) -> list[str]:
    """Map each bucket to its newest epoch snapshot (< before_epoch if
    given); returns the parquet paths to read.  Driver-side listing of
    |epochs| x |buckets| directory names — a metastore lookup at
    cluster scale, bounded and data-free."""
    import os

    if not os.path.isdir(state_dir):
        return []
    epochs = sorted(
        (
            int(d.split("=", 1)[1])
            for d in os.listdir(state_dir)
            if d.startswith("epoch=")
        ),
        reverse=True,
    )
    want = set(buckets) if buckets is not None else None
    newest: dict[int, str] = {}
    for ep in epochs:
        if before_epoch is not None and ep >= before_epoch:
            continue
        ep_dir = os.path.join(state_dir, f"epoch={ep}")
        for d in os.listdir(ep_dir):
            if not d.startswith("bucket="):
                continue
            b = int(d.split("=", 1)[1])
            if (want is None or b in want) and b not in newest:
                newest[b] = os.path.join(ep_dir, d)
    return list(newest.values())


def read_latest_state(spark, state_dir: str, before_epoch: int | None = None,
                      buckets: list[int] | None = None, key: str = "user_id"):
    """Current state: per bucket, its newest epoch snapshot."""
    paths = _resolve_latest_buckets(state_dir, before_epoch, buckets)
    if not paths:
        return None
    return spark.read.parquet(*paths).select(key, *_STATE_COLS)


def apply_latest_wins_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    key: str = "user_id",
    n_buckets: int = 16,
) -> None:
    """Merge one micro-batch into the keyed state (see module note).

    Replay-safe by construction: the base read excludes epochs >=
    batch_id, the merge is a semilattice join, and the write
    overwrites epoch=batch_id's own snapshot."""
    import os

    from pyspark.sql import functions as F

    ordk = F.struct(F.col("ts"), F.col("event_id"))
    batch_latest = batch_df.groupBy(key).agg(
        F.max_by("ts", ordk).alias("last_ts"),
        F.max_by("event_id", ordk).alias("last_event_id"),
        F.max_by("value", ordk).alias("last_value"),
        F.max_by("event_type", ordk).alias("last_event_type"),
    )
    bucket = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets)).cast("int")
    batch_latest = batch_latest.withColumn("bucket", bucket).persist()
    touched = [r.bucket for r in batch_latest.select("bucket").distinct().collect()]
    base = read_latest_state(
        batch_df.sparkSession, state_dir, before_epoch=batch_id, buckets=touched, key=key
    )
    merged = batch_latest.select(key, *_STATE_COLS)
    if base is not None:
        merged = merged.unionByName(base)
    w = F.max(F.struct(*_STATE_COLS)).alias("w")
    out = (
        merged.groupBy(key)
        .agg(w)
        .select(key, *[F.col(f"w.{c}").alias(c) for c in _STATE_COLS])
        .withColumn("bucket", bucket)
    )
    out.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(state_dir, f"epoch={batch_id}")
    )
    batch_latest.unpersist()


def latest_wins_state_stream(
    spark,
    src_path: str,
    state_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Drain all currently-staged event files through the latest-wins
    upsert sink and return the resulting state.

    One call = one availableNow drain.  The checkpoint persists across
    calls, so staging more files and calling again processes ONLY the
    new files into new epochs — the production resume/ingest cadence,
    and the way callers (q114, tests) exercise REAL multi-epoch
    incremental merges.  (A single drain admits all staged files into
    one micro-batch: this Spark build's file source does not apply
    maxFilesPerTrigger under Trigger.AvailableNow.)"""
    from team_aragon_spark.streaming.events_stream import EVENTS_STREAM_SCHEMA

    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(src_path)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, i: apply_latest_wins_batch(b, i, state_dir, key, n_buckets)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_latest_state(spark, state_dir, key=key)
