"""Structured Streaming queries under the driver contract (SURVEY §2.8).

The reference has no streaming (pure batch, main_cuda.py:125-138);
these queries are the engine's streaming extension, judged by the
strongest check available: run the *streaming* pipeline to completion
with Trigger.AvailableNow and hash-compare against a DuckDB batch
oracle.  Structured Streaming's incrementalized-batch semantics make
the two answers identical — that equivalence is exactly what these
queries verify.

Session gap / EWM recurrence oracles are plain SQL (lag-flag-cumsum
sessionization; recursive-CTE recurrence), so even the stateful
operators get full value-hash checks, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import (
    events_stream,
    run_available_now,
    session_windows,
    streaming_ewm,
    tumbling_counts,
)

QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap in micros


# --------------------------------------------------------------------------
# Streaming tumbling-window aggregation (watermarked).  Hour windows
# align to the epoch ⇒ oracle is date_trunc('hour').  Complete mode:
# a drained finite source never advances the watermark past the tail
# windows, so append would withhold them.
# --------------------------------------------------------------------------
@q(
    "q_stream_tumbling",
    """
    SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           SUM(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_stream(spark, sf_dir)
    return run_available_now(tumbling_counts(ev), output_mode="complete")


# --------------------------------------------------------------------------
# Streaming session windows per user (gap 30 min).  Oracle: lag-flag-
# cumsum sessionization — new session iff the gap to the previous
# event is ≥ 30 min, matching session_window's merge rule (an event
# extends a session only while strictly inside prev_end = prev + gap).
# Sessions are identified by their start time, not ordinal.
# --------------------------------------------------------------------------
@q(
    "q_stream_session",
    f"""
    WITH base AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
    ), flagged AS (
        SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                            >= {GAP_US} THEN 1 ELSE 0 END AS new_sess
        FROM base
    ), sess AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM flagged
    )
    SELECT user_id, MIN(ts_us) AS sess_start_us, COUNT(*) AS n_events,
           SUM(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS value_sum
    FROM sess GROUP BY user_id, sess_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_stream(spark, sf_dir)
    return run_available_now(session_windows(ev, gap="30 minutes"), output_mode="complete")


# --------------------------------------------------------------------------
# Stateful streaming EWM (applyInPandasWithState) — same recurrence,
# same literals as batch q_ewm ⇒ bitwise-equal to the recursive-CTE
# oracle when the stream is drained in event order.
# --------------------------------------------------------------------------
@q(
    "q_stream_ewm",
    """
    WITH RECURSIVE base AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        FROM events
    ), ewm_rec AS (
        SELECT user_id, event_id, rn, value, value AS ewm03
        FROM base WHERE rn = 1
        UNION ALL
        SELECT b.user_id, b.event_id, b.rn, b.value,
               0.3 * b.value + 0.7 * e.ewm03
        FROM base b JOIN ewm_rec e ON b.user_id = e.user_id AND b.rn = e.rn + 1
    )
    SELECT user_id, event_id, value, ewm03 FROM ewm_rec
    """,
)
def q_stream_ewm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_stream(spark, sf_dir)
    return run_available_now(streaming_ewm(ev, alpha=0.3), output_mode="append")
