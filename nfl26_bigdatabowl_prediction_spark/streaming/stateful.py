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
        for pdf in pdf_iter:
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
