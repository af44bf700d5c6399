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

Staging is write-once per (sf, source fingerprint) with the same
atomic-rename discipline as ``sources/partitioned.py``.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _stage_root(sf_dir: str) -> str:
    sf = os.path.basename(sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
        fp = f"{sf}-{int(st.st_mtime)}-{st.st_size}"
    except OSError:
        fp = sf
    return os.path.join(tempfile.gettempdir(), "aragon_jsonl", fp)


def staged_documents_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table staged as JSONL and read back with the
    declared schema (never inference)."""
    from team_aragon_spark.sources.catalog import read_table

    path = os.path.join(_stage_root(sf_dir), "documents_jsonl")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = path + f".__stage{os.getpid()}"
        read_table(spark, "documents", sf_dir).write.mode("overwrite").json(tmp)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            os.rename(tmp, path)
        except OSError:
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                raise
    return spark.read.schema(DOCUMENTS_SCHEMA).json(path)
