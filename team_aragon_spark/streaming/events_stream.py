"""Structured Streaming over the events table (extension; the
reference has no streaming — SURVEY.md §2.H — its 'weekly cadence' is
manual batch re-runs).

The batch queries in plans/star_queries (q27 hourly stats, q29
sessions) get streaming twins here: same aggregation logic, plus
watermarks for late data and bounded state.  File source is used for
local verification (``availableNow`` drains a directory of parquet
like a replayed Kafka topic); in production the source line is the
only thing that changes (``format("kafka")``).

Scale notes: state size is (windows × event_types) for the windowed
agg and (active sessions) for session_window — both bounded by the
watermark, so a 1000-executor streaming job holds state in the
HDFS/RocksDB-backed store, keyed by the same groupBy columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Events parquet re-encoded to µs timestamps for the file source (the
# raw testdata is TIMESTAMP(NANOS), which the batch catalog adapts;
# streaming readers need a declared schema up front).
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based streaming source (drop-in stand-in for Kafka).

    Deliberately sets NO ``maxFilesPerTrigger``: the exact-equality
    oracles (q99 dedup replay, q101 stream-stream join) rely on an
    availableNow drain pulling every staged file into one micro-batch,
    so duplicate deliveries are deduplicated in-batch even when their
    event time trails the advanced watermark.  A capped trigger would
    let ``dropDuplicatesWithinWatermark`` re-emit late redeliveries in
    a later batch and break the batch-equality contract.
    """
    return spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(path)


def hourly_event_stats_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of q27: tumbling 1-hour windows per event_type.

    The watermark bounds state: windows older than (max event time -
    watermark) are finalized and evicted.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("win.start").alias("hour"), "event_type", "n_events", "total_value")
    )


def sliding_value_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding windows (1 h length, 15 min slide) — each event lands in 4
    overlapping windows; state is 4× the tumbling case, still
    watermark-bounded.

    Emits (count, rounded sum), not avg: event values carry fixed
    decimal precision, so window averages tie at the rounding digit
    (sum/n landing exactly on ...5) often enough that IEEE
    accumulation order decides the rounded direction and cross-engine
    value oracles flip — measured 3 boundary flips in ~2900 windows at
    round(avg, 4).  count+sum is the q46 contract and division-free;
    callers derive avg when they need it.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("win.start").alias("win_start"), "n_events", "total_value")
    )


def user_sessions_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization with the native session_window — the
    streaming twin of q29's lag+cumsum batch plan.  Sessions close when
    no event arrives within ``gap``; the watermark finalizes them."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sess.start").alias("session_start"), "n_events")
    )


def clicks_after_errors_stream(
    events: DataFrame,
    horizon: str = "1 day",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: every click within ``horizon`` after an
    error by the same user — the streaming twin of the batch bucketed
    range join (q41, operators/range_join.py).

    Both sides carry watermarks and the join has a time-range
    condition, so the state store retains each side only for
    (watermark + horizon): bounded state, exactly the interval the
    join can still match.  Inner joins emit as soon as a match
    arrives; a full availableNow drain therefore yields exactly the
    batch result (asserted in tests).

    ``how="left_outer"`` keeps every ERROR: matched rows emit like the
    inner join; an error with no click in its horizon emits ONCE with
    null click columns — but only when the join watermark (min of
    both sides) passes ``error_ts + horizon`` and the state store can
    prove no match can still arrive.  That is the stateful-expiry
    behavior the inner join never exercises, and why a complete drain
    needs the watermark pushed past every real error's horizon (q168
    appends far-future click+error sentinels; a 'flush'-typed
    sentinel would be filtered out before the watermark is computed
    and advance nothing).
    """
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return errors.join(
        clicks,
        F.expr(
            f"""e_user = c_user AND
                click_ts >= error_ts AND
                click_ts <= error_ts + INTERVAL {horizon}"""
        ),
        how,
    ).select(F.col("e_user").alias("user_id"), "error_id", "click_id", "click_ts")


def enriched_purchases_stream(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment join — the remaining core streaming
    join family next to the stream-stream join above: each micro-batch
    of purchase events inner-joins the STATIC customer dimension
    (broadcast per batch; the static side is re-planned each trigger,
    so a dim-table refresh is picked up without restarting the query).

    Stateless by construction — no watermark, no join state store:
    append mode emits each matched stream row exactly once, so a full
    availableNow drain equals the batch inner join exactly (q105's
    full value oracle).  At 100 TB the static side stays a broadcast
    as long as the dim fits (~GBs); beyond that Spark falls back to a
    per-batch shuffled join automatically.
    """
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    return (
        events.filter(F.col("event_type") == "purchase")
        .join(dim, "user_id")
        .select("event_id", "user_id", "c_mktsegment", "value")
    )


def deduped_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once dedup on event_id.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key
    only until the watermark passes the key's event time — bounded
    state, unlike plain dropDuplicates on a stream (which retains
    every key forever).  The streaming twin of the batch first-wins
    dedup (operators/dedup.py): at-least-once sources (Kafka replays,
    file redelivery) become exactly-once downstream.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_completion(stream_df: DataFrame, query_name: str, checkpoint_dir: str) -> DataFrame:
    """Drain all available input through the streaming query into an
    in-memory sink and return the result as a batch DataFrame
    (local verification harness; production uses a real sink +
    continuous trigger)."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
