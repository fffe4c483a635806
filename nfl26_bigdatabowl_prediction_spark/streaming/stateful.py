"""Custom stateful streaming operator: per-key EWM
(``applyInPandasWithState``).

The reference's EWM (main_mps.py:233-240, ``ewm(alpha,
adjust=False)``) is a per-trajectory recurrence y_t = α·x_t +
(1−α)·y_{t−1} — exactly the shape that needs *managed state* when
the trajectory arrives as a stream: the carry is one double per key.

Batch twin: plans/events_windows.py::q_ewm (fold over the collected
trajectory).  Both run the identical IEEE double recurrence with
identical literals, so a stream processed in event order produces
bitwise-equal EWMs to the batch fold and the DuckDB recursive CTE.

Scale: state is one (double, long) pair per user_id — the state
store holds |keys| entries regardless of stream length.  Rows are
sorted within each micro-batch; cross-batch order is the file
source's responsibility (event-time-ordered ingest), mirroring the
reference's assumption that frames arrive in frame_id order.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewm03", T.DoubleType()),
    ]
)

EWM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ewm", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _make_ewm_fn(alpha: float):
    one_minus = 1.0 - alpha

    def ewm_fn(
        key: Any, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last: float | None
        n: int
        if state.exists:
            last, n = state.get
        else:
            last, n = None, 0
        # Drain the WHOLE group before sorting: a group whose rows span
        # an Arrow record-batch boundary arrives as multiple chunks in
        # shuffle (arbitrary) order, so per-chunk sorting silently
        # processes out of event-time order.  Found by the round-8
        # 8x-scale differential — at sf0.01 no group ever split, at 8x
        # ~1-in-150 groups did.  Memory stays bounded by one KEY's
        # micro-batch rows, the same bound the recurrence itself needs.
        chunks = [p for p in pdf_iter if len(p)]
        for pdf in ([pd.concat(chunks, ignore_index=True)] if chunks else []):
            pdf = pdf.sort_values(["ts", "event_id"])
            out = []
            for v in pdf["value"]:
                v = float(v)
                last = v if last is None else alpha * v + one_minus * last
                out.append(last)
                n += 1
            pdf = pdf.assign(ewm03=out)
            yield pdf[["user_id", "event_id", "value", "ewm03"]]
        if last is not None:
            state.update((last, n))

    return ewm_fn


def streaming_ewm(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Per-user streaming EWM.  Works on both streaming and batch
    DataFrames (applyInPandasWithState requires a stream; batch
    callers use the batch q_ewm instead)."""
    return events.select("user_id", "event_id", "ts", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _make_ewm_fn(alpha),
        outputStructType=EWM_OUTPUT_SCHEMA,
        stateStructType=EWM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# State API v2 (``transformWithStateInPandas``): the Spark 4.x
# arbitrary-stateful-processing surface — typed state handles
# (ValueState here; ListState/MapState/timers available) managed by
# the processor object, replacing applyInPandasWithState's single
# tuple.  Operator: per-user running stats (count, max, exact int64
# cents sum) emitted as an update row per key per micro-batch; the
# final row per key equals the batch groupBy — that equivalence is
# the oracle.  State is one (long, double, long) per key: store size
# is |keys|, independent of stream length.
# --------------------------------------------------------------------------
try:  # Spark >= 4.0
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    _HAS_TWS = True
except ImportError:  # pragma: no cover - older runtime
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False

RUNNING_STATS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_max", T.DoubleType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

_RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("vmax", T.DoubleType()),
        T.StructField("cents", T.LongType()),
    ]
)


class RunningStatsProcessor(StatefulProcessor):
    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState("running", _RUNNING_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, vmax, cents = (
            self._state.get() if self._state.exists() else (0, None, 0)
        )
        for pdf in rows:
            n += len(pdf)
            bmax = float(pdf["value"].max()) if len(pdf) else None
            if bmax is not None:
                vmax = bmax if vmax is None else max(vmax, bmax)
            # exact integer accumulation: summation order irrelevant
            cents += int(pdf["value"].mul(100).round(0).astype("int64").sum())
        self._state.update((n, vmax, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_max": [vmax],
                "value_sum": [cents / 100.0],
            }
        )

    def close(self) -> None:
        pass


def _running_stats_v1_fn(
    key: Any, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, vmax, cents = state.get if state.exists else (0, None, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        if len(pdf):
            bmax = float(pdf["value"].max())
            vmax = bmax if vmax is None else max(vmax, bmax)
        cents += int(pdf["value"].mul(100).round(0).astype("int64").sum())
    state.update((n, vmax, cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_max": [vmax],
            "value_sum": [cents / 100.0],
        }
    )


def streaming_running_stats(events: DataFrame, use_v2: bool = False) -> DataFrame:
    """Per-user running (count, max, exact-cents sum).

    ``use_v2=True`` routes through ``transformWithStateInPandas``
    (state API v2, RunningStatsProcessor above) — the preferred
    production surface, but its driver worker needs ``google.protobuf``
    which this sandbox lacks, so the default is the v1
    ``applyInPandasWithState`` path computing the identical recurrence
    with the identical state tuple.
    """
    keyed = events.select("user_id", "value").groupBy("user_id")
    if use_v2:
        return keyed.transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(),
            outputStructType=RUNNING_STATS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    return keyed.applyInPandasWithState(
        _running_stats_v1_fn,
        outputStructType=RUNNING_STATS_OUTPUT_SCHEMA,
        stateStructType=_RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("stage", T.LongType()),
        T.StructField("ts_us", T.LongType()),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t1", T.LongType()),
        T.StructField("t2", T.LongType()),
        T.StructField("t3", T.LongType()),
    ]
)

_FUNNEL_GAP_US = 3600 * 10**6


def _funnel_fn(
    key: Any, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user earliest-completion funnel state machine
    (view → click → purchase, 1 h per-hop bound — q_window_funnel's
    batch semantics).  Emits one row per STAGE ADVANCE, so the
    accumulated append output is identical however the micro-batches
    split (each advance fires exactly once); like streaming_ewm, the
    state machine assumes event-time-ordered arrival across batches
    (exact under the drained single-source run the oracle checks)."""
    t1: int | None
    t2: int | None
    t3: int | None
    if state.exists:
        # Stage timestamps are stored as nullable LongType directly —
        # no -1 sentinel, so a legitimate ts of exactly 0 us (epoch)
        # round-trips unchanged across micro-batches.
        t1, t2, t3 = (v if v is not None else None for v in state.get)
    else:
        t1 = t2 = t3 = None
    # Whole-group drain before sorting: Arrow batch-boundary splits
    # deliver a group as multiple arbitrary-order chunks (see ewm_fn;
    # found by the round-8 8x differential).
    chunks = [p for p in pdf_iter if len(p)]
    for pdf in ([pd.concat(chunks, ignore_index=True)] if chunks else []):
        pdf = pdf.sort_values(["ts", "event_id"])
        out = {"user_id": [], "event_id": [], "stage": [], "ts_us": []}
        for uid, eid, ts, et in zip(
            pdf["user_id"], pdf["event_id"], pdf["ts"], pdf["event_type"]
        ):
            ts = int(ts)
            stage = None
            if et == "view" and t1 is None:
                t1, stage = ts, 1
            elif (
                et == "click"
                and t1 is not None
                and t2 is None
                and t1 < ts <= t1 + _FUNNEL_GAP_US
            ):
                t2, stage = ts, 2
            elif (
                et == "purchase"
                and t2 is not None
                and t3 is None
                and t2 < ts <= t2 + _FUNNEL_GAP_US
            ):
                t3, stage = ts, 3
            if stage is not None:
                out["user_id"].append(int(uid))
                out["event_id"].append(int(eid))
                out["stage"].append(stage)
                out["ts_us"].append(ts)
        yield pd.DataFrame(out)
    state.update((t1, t2, t3))


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Per-user stateful funnel over the event stream."""
    return events.select("user_id", "event_id", "ts", "event_type").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _funnel_fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_funnel_late(events: DataFrame) -> DataFrame:
    """Funnel with a 1 h event-time watermark: rows behind the
    checkpointed watermark are dropped BEFORE the state machine sees
    them (measured boundary on Spark 4.1: a row survives iff
    ts_us > watermark_ms * 1000, strictly).  State itself is never
    evicted (NoTimeout) — this is the late-DATA axis; see
    streaming_funnel_ttl for state eviction.  ``event_time`` must
    survive the projection or the watermark filter is lost."""
    return events.withWatermark("event_time", "1 hour").select(
        "user_id", "event_id", "ts", "event_type", "event_time"
    ).groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _funnel_ttl_fn(
    key: Any, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """_funnel_fn plus event-time state EVICTION: an incomplete funnel
    whose last stage advance is more than the 1 h gap behind the
    watermark times out — one expiry row (stage 0, event_id NULL,
    ts = last advance) is emitted and the state removed.  A COMPLETED
    funnel removes its state immediately (nothing left to time out).
    Measured Spark 4.1 boundary: a timeout fires iff its timestamp is
    STRICTLY below the watermark (ms); timestamps are registered with
    a wm+1 clamp because Spark rejects timeouts at-or-below the
    current watermark.  The clamp only DELAYS firing, never changes
    the emitted row (ts = the stored last advance), so it is safe in
    multi-batch drains too: a natural expiry already behind the
    watermark re-registers at wm+1 and fires in the next batch whose
    watermark exceeds it — at the latest the trailing AvailableNow
    batch (regression:
    test_funnel_ttl_multibatch_drain_fires_each_expiry_once)."""
    def _row(uid: int, eid: int | None, stage: int, ts: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": pd.Series([uid], dtype="int64"),
                "event_id": pd.Series([eid], dtype="Int64"),
                "stage": pd.Series([stage], dtype="int64"),
                "ts_us": pd.Series([ts], dtype="int64"),
            }
        )

    if state.hasTimedOut:
        t1, t2, _t3 = (v if v is not None else None for v in state.get)
        last = t2 if t2 is not None else t1
        state.remove()
        yield _row(int(key[0]), None, 0, int(last))
        return
    t1: int | None
    t2: int | None
    t3: int | None
    if state.exists:
        t1, t2, t3 = (v if v is not None else None for v in state.get)
    else:
        t1 = t2 = t3 = None
    # Whole-group drain before sorting: Arrow batch-boundary splits
    # deliver a group as multiple arbitrary-order chunks (see ewm_fn;
    # found by the round-8 8x differential).
    chunks = [p for p in pdf_iter if len(p)]
    for pdf in ([pd.concat(chunks, ignore_index=True)] if chunks else []):
        pdf = pdf.sort_values(["ts", "event_id"])
        out = {"user_id": [], "event_id": [], "stage": [], "ts_us": []}
        for uid, eid, ts, et in zip(
            pdf["user_id"], pdf["event_id"], pdf["ts"], pdf["event_type"]
        ):
            ts = int(ts)
            stage = None
            if et == "view" and t1 is None:
                t1, stage = ts, 1
            elif (
                et == "click"
                and t1 is not None
                and t2 is None
                and t1 < ts <= t1 + _FUNNEL_GAP_US
            ):
                t2, stage = ts, 2
            elif (
                et == "purchase"
                and t2 is not None
                and t3 is None
                and t2 < ts <= t2 + _FUNNEL_GAP_US
            ):
                t3, stage = ts, 3
            if stage is not None:
                out["user_id"].append(int(uid))
                out["event_id"].append(int(eid))
                out["stage"].append(stage)
                out["ts_us"].append(ts)
        yield pd.DataFrame(out)
    if t3 is not None:
        if state.exists:
            state.remove()
    elif t1 is not None:
        state.update((t1, t2, t3))
        last = t2 if t2 is not None else t1
        timeout_ms = (last + _FUNNEL_GAP_US) // 1000
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))
    # no view yet: no state, nothing to expire


def streaming_funnel_ttl(events: DataFrame) -> DataFrame:
    """Funnel with event-time TTL eviction (1 h watermark)."""
    return events.withWatermark("event_time", "1 hour").select(
        "user_id", "event_id", "ts", "event_type", "event_time"
    ).groupBy("user_id").applyInPandasWithState(
        _funnel_ttl_fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
