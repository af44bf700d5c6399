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
