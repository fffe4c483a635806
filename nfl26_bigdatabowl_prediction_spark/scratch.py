"""Process-scoped scratch directories for checkpoint-style temp data.

Queries that materialize an intermediate (e.g. q_setsim_join's
shingle projection, q_schema_evolution's two parquet versions) return
DataFrames that LAZILY read the materialized files, so the directory
must outlive the query function — it cannot be deleted inside it.
Allocating every such directory under one per-process root and
removing the root at interpreter exit (atexit) gives the earliest
safe cleanup point: repeated bench/driver/test runs no longer
accumulate unbounded /tmp disk, while every DataFrame handed back to
a caller stays readable for the life of the session.

Each allocation is still per-invocation (mkdtemp under the root), so
concurrent sessions and repeated calls never race on a shared path.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """Return a fresh empty directory removed at process exit."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="nfl26_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
