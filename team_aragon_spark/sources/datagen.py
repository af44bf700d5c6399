"""Custom Python Data Source (Spark 4 API): deterministic corpus datagen.

The pattern every engine's connector suite ships (TPC datagen in
Trino/Flink, ``rate`` in Spark): a source that SYNTHESIZES rows
instead of reading files, for load tests and scale rehearsals —
``spark.read.format("aragon_datagen").option("rows", 1e6).load()``.

Demonstrates the full Python DataSource surface on the engine's own
document schema:

- batch reader with PARTITION-PARALLEL generation: ``partitions()``
  splits the row range into ``numPartitions`` independent slices, so
  generation scales out exactly like a scan (no driver bottleneck);
- micro-batch stream reader (``SimpleDataSourceStreamReader``) with
  monotone integer offsets, bounded by ``rows`` so ``availableNow``
  drains terminate.

Every row is a PURE FUNCTION of its index (md5-seeded), so the data
is identical across partitionings, retries, and batch/stream reads —
the property that makes generated fixtures usable in correctness
tests, not just throughput runs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
_WORDS = (
    "the fast slow key order sort table scan merge part window small "
    "large spark group query row data filter customer line join stream "
    "hash index plan shuffle broadcast cache"
).split()
_LANGS = ("en", "es", "de", "fr", "zh")


def _row(i: int) -> tuple:
    """Deterministic row ``i`` — stable under any partitioning/replay."""
    h = hashlib.md5(f"aragon:{i}".encode()).digest()
    n_words = 20 + h[0] % 40
    words = [_WORDS[(h[j % 16] + i * (j + 1)) % len(_WORDS)] for j in range(n_words)]
    text = " ".join(words)
    return (i, text, _LANGS[h[1] % len(_LANGS)], f"src{h[2] % 4}", len(text))


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("numPartitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n_rows // self.n_parts))
        return [_Slice(s, min(s + step, self.n_rows)) for s in range(0, self.n_rows, step)]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class _StreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["i"]
        hi = min(lo + self.per_batch, self.n_rows)
        return iter([_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([_row(i) for i in range(start["i"], end["i"])])


class AragonDataGenSource(DataSource):
    """``spark.dataSource.register(AragonDataGenSource)`` then
    ``spark.read.format("aragon_datagen")`` / ``spark.readStream...``."""

    @classmethod
    def name(cls) -> str:
        return "aragon_datagen"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)
