"""Streaming source over the events table.

Batch twin: ``sources.io.table`` — same nanos→micros normalization,
same integer-time representation, plus a proper event-time TIMESTAMP
column (streaming window/watermark operators require TimestampType).

At scale this source is a directory the ingest system appends parquet
files to; ``maxFilesPerTrigger`` bounds micro-batch size so one giant
backfill drop can't blow executor memory.  The file source tracks
progress in the checkpoint — exactly-once per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl26_bigdatabowl_prediction_spark.sources.io import normalize_ts

# Streaming state-store instance count is pinned to
# spark.sql.shuffle.partitions at the stream's FIRST micro-batch and
# persists in the checkpoint.  The session default is sized to cores
# for BATCH shuffles (AQE coalesces those at runtime; streaming has no
# AQE), so a 100k-row test stream would schedule one stateful task and
# commit one state-store delta per core every micro-batch — pure
# fixed overhead at this volume.  Streams therefore execute on an
# isolated-SQLConf twin session sized by this knob; production sizes
# it to stream volume (state partitions ≈ peak keys / partition
# budget), which is exactly what "set it at first run, the checkpoint
# keeps it" supports.
STREAM_SHUFFLE_PARTITIONS = 8


# One twin per (parent session, shuffle_partitions): creating a fresh
# never-stopped newSession() per events_stream call leaked a session
# each stream AND scattered memory-sink registrations across twins —
# callers resolving spark.table(queryName) need every stream of one
# parent to land in one catalog (round-9 ADVICE).  Keyed on the parent
# session itself via WeakKeyDictionary, NOT id(spark): CPython reuses
# a collected object's id, so an id-keyed map could silently hand a
# new, unrelated session the dead parent's twin (stale catalog, wrong
# conf lineage) — and the weak key means a collected parent's twins
# drop out of the map instead of accumulating (round-10 ADVICE).
import weakref

_TWINS: "weakref.WeakKeyDictionary[SparkSession, dict[tuple, SparkSession]]" = (
    weakref.WeakKeyDictionary()
)

# (resolved_dir, glob) → StructType from the parquet footer probe.
# Fixture/ingest dirs are schema-stable for the life of a process (see
# the in-function comment); entries are tiny (schemas, not data).
_SCHEMA_CACHE: dict[tuple[str, str], "object"] = {}


def stream_exec_session(
    spark: SparkSession,
    shuffle_partitions: int = STREAM_SHUFFLE_PARTITIONS,
    no_data_batches: bool = True,
) -> SparkSession:
    """Isolated-SQLConf twin of ``spark`` for executing a test-scale
    stream.  ``newSession()`` shares the SparkContext (and inherits
    every builder-level conf from session.py via the context
    SparkConf) but gets its own mutable SQLConf — so right-sizing the
    stream's state partitioning cannot race the 12-way oracle pool
    that shares the parent session across threads.  Memoized per
    parent: every stream of one caller session executes (and registers
    its memory-sink table) in the SAME twin catalog (one twin per conf
    variant — the variant key only changes which catalog a query's
    memory sink lands in, and callers always resolve through the
    returned DataFrame's own session).

    ``no_data_batches=False`` selects a twin with
    ``spark.sql.streaming.noDataMicroBatches.enabled=false``: after
    the last data batch Spark normally runs one extra empty batch to
    advance the watermark (state eviction, outer-join null emission,
    event-time timeouts, watermark persistence for a later resume).
    Queries whose OUTPUT provably never depends on that batch — inner
    joins, NoTimeout stateful ops, complete-mode aggregations, exact
    dedup — skip it and save a full plan+state+commit cycle per run.
    Queries that DO emit on watermark advance (left-outer join,
    event-time TTL) or resume a checkpoint whose watermark must
    reflect the previous drain (the two-phase late-data harness) must
    keep the default."""
    per_parent = _TWINS.setdefault(spark, {})
    key = (shuffle_partitions, no_data_batches)
    twin = per_parent.get(key)
    if twin is None:
        twin = spark.newSession()
        twin.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        if not no_data_batches:
            twin.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", "false"
            )
        per_parent[key] = twin
    return twin


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    glob: str = "events.parquet",
    no_data_batches: bool = True,
) -> DataFrame:
    """``readStream`` over the events parquet with event-time column.

    SESSION SWAP: the returned stream is bound to the memoized
    stream-scoped twin of ``spark`` (see ``stream_exec_session``), not
    to ``spark`` itself — a memory-sink ``queryName`` registers in the
    twin's catalog, so resolve result tables via
    ``stream_exec_session(spark).table(name)`` (or keep a handle on
    the returned DataFrame's ``sparkSession``), not the session you
    passed in.

    Emits the batch-identical columns (``ts`` int64 epoch-micros, the
    engine's canonical exact time) plus ``event_time`` TIMESTAMP for
    watermarks/windows.  UTC session timezone (session.py) makes
    ``unix_micros(event_time) == ts`` exactly.

    Streaming file sources never infer, so the explicit schema is
    probed from one batch-read footer — this keeps the source correct
    for both physical ``ts`` layouts the driver has shipped
    (TIMESTAMP(NANOS) via ``nanosAsLong`` → int64; TIMESTAMP(MICROS)
    → timestamp_ntz), with the same normalize_ts as the batch twin.
    """
    # Execute on the stream-scoped twin session (see
    # stream_exec_session): everything built downstream of this
    # reader — stateful ops, sinks, the memory table — binds to it,
    # so its right-sized shuffle/state partitioning applies to the
    # whole streaming query without touching the caller's conf.
    spark = stream_exec_session(spark, no_data_batches=no_data_batches)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Two physical layouts exist: the driver's fixtures are a single
    # file per table (stream the shared dir, pathGlobFilter selects
    # the events file), while Spark-written derivatives (the 8x/64x
    # probes — and any real ingest directory) are a DIRECTORY of part
    # files named part-*.parquet, which the table-name filter would
    # exclude entirely (UNABLE_TO_INFER_SCHEMA).  Streaming the table
    # directory itself is also the production shape: an ingest system
    # appends files under one table root.
    import os

    table_dir = os.path.join(sf_dir, glob)
    if os.path.isdir(table_dir) and "*" not in glob:
        sf_dir, glob = table_dir, "*.parquet"
    # Footer-probe once per (dir, glob) per process: the probe is a
    # full batch-read plan (~0.2 s), and the bench/driver create the
    # same stream 4x per query — re-probing every call was ~3 s of
    # pure fixed overhead across the family.  Correctness stance: a
    # production ingest directory DECLARES its schema (exactly what
    # this explicit-schema reader models); files appended mid-session
    # must match it, which is also Spark's own assumption for a
    # running stream (schema is fixed at query start).
    key = (sf_dir, glob)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = (
            spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema
        )
        _SCHEMA_CACHE[key] = schema
    # The file stream source requires a *directory*; pathGlobFilter
    # selects just the events table out of the shared sf_dir.
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_ts(reader.parquet(sf_dir)).withColumn(
        "event_time", F.timestamp_micros(F.col("ts"))
    )
