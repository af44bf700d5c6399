"""Shared write-once staging for derived source-format copies.

``sources/partitioned.py`` (hive-partitioned orders), ``sources/
jsonl.py`` (documents as JSONL), and ``sources/orc.py`` (events as
ORC) all stage a derived copy of one testdata table under a
deterministic temp path.  The discipline lives here once:

- **Stage key** = sf name + source-content fingerprint (mtime+size of
  the source parquet), so regenerated testdata can never silently
  reuse a stale staged copy.
- **Write-once**: the ``_SUCCESS`` marker gates re-staging, so
  repeated or concurrent query invocations reuse one copy.
- **Atomic**: write to a pid-suffixed temp dir, ``os.rename`` into
  place.  A failed rename is treated as a lost concurrency race ONLY
  if the winner's complete copy is present; a genuine rename failure
  (EXDEV, permissions) must not destroy the only copy.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable


def stage_root(sf_dir: str, src_table: str, family: str) -> str:
    """Deterministic staging root for ``src_table`` of ``sf_dir``
    under ``$TMPDIR/<family>/``, keyed by source fingerprint."""
    sf = os.path.basename(sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, f"{src_table}.parquet")
    try:
        st = os.stat(src)
        fp = f"{sf}-{int(st.st_mtime)}-{st.st_size}"
    except OSError:
        fp = sf
    return os.path.join(tempfile.gettempdir(), family, fp)


def stage_once(path: str, write_fn: Callable[[str], None]) -> str:
    """Ensure ``path`` holds a complete staged copy: call
    ``write_fn(tmp_dir)`` to produce it (the writer must emit a
    ``_SUCCESS`` marker, as every Spark sink does), then rename into
    place.  Returns ``path``."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = path + f".__stage{os.getpid()}"
        write_fn(tmp)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            os.rename(tmp, path)
        except OSError:
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                raise
    return path
