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
from pyspark.sql import types as T

# Explicit schema: streaming file sources never infer.  ``ts`` is
# INT64 TIMESTAMP(NANOS) in the driver's parquet; with the
# ``nanosAsLong`` conf it surfaces as plain int64 nanos.
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    glob: str = "events.parquet",
) -> DataFrame:
    """``readStream`` over the events parquet with event-time column.

    Emits the batch-identical columns (``ts`` int64 epoch-micros, the
    engine's canonical exact time) plus ``event_time`` TIMESTAMP for
    watermarks/windows.  UTC session timezone (session.py) makes
    ``unix_micros(event_time) == ts`` exactly.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file stream source requires a *directory*; pathGlobFilter
    # selects just the events table out of the shared sf_dir.
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA).option(
        "pathGlobFilter", glob
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(sf_dir)
        .withColumn("ts", F.expr("ts div 1000"))
        .withColumn("event_time", F.timestamp_micros(F.col("ts")))
    )
