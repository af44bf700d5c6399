"""Custom Python Data Source (Spark 4 API): the datagen connector must
generate partition-parallel, fully deterministic rows in both batch
and micro-batch stream modes."""

from __future__ import annotations

import os
import time


def _register(spark):
    from team_aragon_spark.sources.datagen import AragonDataGenSource

    try:
        spark.dataSource.register(AragonDataGenSource)
    except Exception:
        pass  # already registered in this session


def test_datagen_batch_deterministic(spark):
    _register(spark)
    df = (
        spark.read.format("aragon_datagen")
        .option("rows", 5000)
        .option("numPartitions", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8  # generation parallelizes like a scan
    assert df.count() == 5000
    assert df.select("doc_id").distinct().count() == 5000
    # rows are a pure function of their index: identical under ANY partitioning
    df2 = (
        spark.read.format("aragon_datagen")
        .option("rows", 5000)
        .option("numPartitions", 3)
        .load()
    )
    assert {tuple(r) for r in df.collect()} == {tuple(r) for r in df2.collect()}
    # generated corpus is usable by the text operators (schema parity)
    assert set(df.columns) == {"doc_id", "text", "lang", "source", "n_chars"}


def test_datagen_stream_drains_bounded_rows(spark, tmp_path):
    _register(spark)
    stream = (
        spark.readStream.format("aragon_datagen")
        .option("rows", 500)
        .option("rowsPerBatch", 120)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dg_stream_out")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .start()
    )
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline and n < 500:
            n = spark.sql("SELECT count(*) AS n FROM dg_stream_out").collect()[0].n
            time.sleep(0.5)
    finally:
        q.stop()
    assert n == 500  # bounded source stops advancing its offset at `rows`
    assert (
        spark.sql("SELECT count(DISTINCT doc_id) AS d FROM dg_stream_out").collect()[0].d == 500
    )
