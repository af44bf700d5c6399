#!/usr/bin/env python
"""Generate an N-times scaled copy of a testdata scale-factor directory.

Usage::

    python scripts/make_scaled_sf.py SRC_DIR DST_DIR N

Produces DST_DIR/{table}.parquet with N replicas of each fact/bridge
table, remapping surrogate keys per replica so referential integrity
holds (customer->orders->lineitem, part, supplier, events.user_id,
documents.doc_id, embeddings.vec_id).  Dimension tables (region,
nation) are copied unchanged — dims do not grow with fact volume.

Two tables need more than a key shift to keep their workloads
realistic at scale:

- ``documents.text`` is salted per replica (a replica token woven in
  every 3 words) so a document and its replica-i copy are NOT
  near-duplicates (3-word-shingle Jaccard collapses to ~0.15, LSH
  band-collision probability ~0.09 at b=32/r=3); without
  this every doc would arrive with N-1 planted near-dups and the LSH
  dedup workload would measure an artificial N^2 pair explosion
  instead of N-times more documents at the corpus's natural dup rate.
  Within a replica the original near-dup structure is preserved
  exactly (the salt is position- and replica-keyed, identical across
  docs of one replica).
- ``embeddings.embedding`` is rotated by ``i mod dim`` positions per
  replica — an orthogonal transform, so every within-replica cosine
  (planted ANN neighbors, cluster geometry) is preserved bit-for-bit
  while cross-replica cosines decorrelate to the random-vector
  baseline.

Streams one replica at a time through a ParquetWriter, so peak memory
is one replica of one table regardless of N.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# table -> {column: offset-unit}; each replica i adds i * unit(column)
# where unit is (max base key + 1) of the key's home table.
KEYED = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
HOME_KEY = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
COPY_AS_IS = ["region", "nation"]
SALT_EVERY = 3  # words between salt tokens in replicated documents
# (matched to the engine's 3-word shingles: every shingle window of a
# salted copy except one-in-three contains a replica token, driving
# cross-replica Jaccard below the LSH candidate floor)


def _key_units(src: str) -> dict[str, int]:
    units: dict[str, int] = {}
    for table, col in HOME_KEY.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[col])
        units[table] = int(pa.compute.max(t.column(0)).as_py()) + 1
    ev = pq.read_table(os.path.join(src, "events.parquet"), columns=["user_id"])
    units["events_user"] = int(pa.compute.max(ev.column(0)).as_py()) + 1
    return units


def _salt_text(texts: list[str | None], i: int) -> list[str | None]:
    tok = f"zq{i}z"
    out: list[str | None] = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        words = t.split(" ")
        salted: list[str] = []
        for j, w in enumerate(words):
            if j and j % SALT_EVERY == 0:
                salted.append(tok)
            salted.append(w)
        out.append(" ".join(salted))
    return out


def _replica(table: str, base: pa.Table, i: int, units: dict[str, int]) -> pa.Table:
    t = base
    for col, unit in KEYED.get(table, {}).items():
        idx = t.schema.get_field_index(col)
        shifted = pa.compute.add(t.column(idx), i * units[unit])
        t = t.set_column(idx, t.schema.field(idx), shifted.cast(t.schema.field(idx).type))
    if i == 0:
        return t
    if table == "documents":
        idx = t.schema.get_field_index("text")
        salted = pa.array(_salt_text(t.column(idx).to_pylist(), i), type=pa.string())
        t = t.set_column(idx, t.schema.field(idx), salted)
        nidx = t.schema.get_field_index("n_chars")
        nchars = pa.compute.utf8_length(t.column(idx)).cast(pa.int64())
        t = t.set_column(nidx, t.schema.field(nidx), nchars)
    if table == "embeddings":
        idx = t.schema.get_field_index("embedding")
        col = t.column(idx).combine_chunks()
        mat = np.asarray(col.flatten(), dtype=np.float32).reshape(len(t), -1)
        rolled = np.roll(mat, i % mat.shape[1], axis=1)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(rolled.ravel(), type=pa.float32()), mat.shape[1]
        ).cast(t.schema.field(idx).type)
        t = t.set_column(idx, t.schema.field(idx), arr)
    return t


def main() -> None:
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    units = _key_units(src)
    for table in COPY_AS_IS:
        base = pq.read_table(os.path.join(src, f"{table}.parquet"))
        pq.write_table(base, os.path.join(dst, f"{table}.parquet"))
        print(f"{table}: copied {len(base)} rows")
    for table in KEYED:
        base = pq.read_table(os.path.join(src, f"{table}.parquet"))
        out = os.path.join(dst, f"{table}.parquet")
        with pq.ParquetWriter(out, base.schema) as w:
            for i in range(n):
                w.write_table(_replica(table, base, i, units))
        print(f"{table}: {len(base)} x {n} = {len(base) * n} rows")


if __name__ == "__main__":
    main()
