"""sources/python_ds.py — Python DataSource thread-affinity regression.

Round-6/7 regression: ``q_python_datasink``'s ``.save()`` raised
DATA_SOURCE_NOT_FOUND under the 8-thread oracle pool.  Bisected in
round 8: NOT a register-vs-save ordering race — the deterministic
repro is (1) run the Python STREAMING source query, (2) run the sink
query on the MAIN thread, then (3) run the sink from a FRESH thread;
step 3's writer lookup consults the JVM thread-local active session
(unset on a py4j-pinned thread) and misses the session's registered
Python sources.  The fix is two-part: registration centralized in
``ensure_python_sources`` (once per session, module lock, called from
``get_spark``), and ``activate_session`` binding the thread-local
active session before the write.  These tests pin the exact repro
sequence plus the general concurrent shape.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from nfl26_bigdatabowl_prediction_spark.plans.registry import QUERIES
from nfl26_bigdatabowl_prediction_spark.sources.python_ds import (
    ensure_python_sources,
)

from .conftest import SF_DIR


def test_sink_from_fresh_thread_after_stream_and_main_save(spark):
    # the deterministic round-6/7 failure sequence, step by step
    assert QUERIES["q_stream_python_source"](spark, SF_DIR).count() > 0
    main_n = QUERIES["q_python_datasink"](spark, SF_DIR).count()
    assert main_n > 0
    with ThreadPoolExecutor(max_workers=2) as pool:
        counts = list(
            pool.map(
                lambda _: QUERIES["q_python_datasink"](spark, SF_DIR).count(),
                range(2),
            )
        )
    assert counts == [main_n, main_n], counts


def test_python_datasource_queries_run_concurrently(spark):
    names = ["q_python_datasource", "q_python_datasink",
             "q_stream_python_source"]

    def run(name):
        return QUERIES[name](spark, SF_DIR).count()

    # 2 rounds x 3 queries on a 6-wide pool: every pairwise overlap of
    # (read, write, stream) gets a chance to interleave
    with ThreadPoolExecutor(max_workers=6) as pool:
        counts = list(pool.map(run, names * 2))
    assert all(c > 0 for c in counts), counts
    # both rounds of the same query agree
    assert counts[:3] == counts[3:], counts


def test_ensure_python_sources_idempotent(spark):
    # many concurrent ensure calls on one session: exactly-once
    # registration must make this a no-op storm, not a race
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(lambda _: ensure_python_sources(spark), range(32)))
    assert spark.read.format("synth_seq").load().count() == 4000
