"""JSONL (newline-delimited JSON) staging of the documents corpus.

Training-data interchange is overwhelmingly JSONL — crawls, curation
dumps, and eval sets arrive as one JSON object per line, not parquet.
The engine therefore needs the JSONL leg of the source matrix proven:
write the corpus out through Spark's JSON sink and read it back
through the JSON source WITH AN EXPLICIT SCHEMA (the production
posture: schema inference is a dev convenience that costs an extra
full pass over 100 TB and silently widens types; a declared schema
makes drift visible as nulls instead).

Faithfulness is the interesting property: JSON escaping must
round-trip every byte of ``text`` (embedded quotes, backslashes,
newlines, non-ASCII) — ``q325_jsonl_ingest_consistency`` pins that by
aggregating per-source digests from the JSONL copy and comparing them
against the DuckDB oracle computed on the ORIGINAL parquet, so any
lossy escape or dropped row flips the value hash.

Write-once / atomic staging discipline: ``sources/staging.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from team_aragon_spark.sources.staging import stage_once, stage_root

DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def staged_documents_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table staged as JSONL and read back with the
    declared schema (never inference)."""
    from team_aragon_spark.sources.catalog import read_table

    path = os.path.join(
        stage_root(sf_dir, "documents", "aragon_jsonl"), "documents_jsonl"
    )
    stage_once(
        path,
        lambda tmp: read_table(spark, "documents", sf_dir)
        .write.mode("overwrite")
        .json(tmp),
    )
    return spark.read.schema(DOCUMENTS_SCHEMA).json(path)
