"""Grouped-map pairwise interaction kernel (SURVEY §2.9 U3).

The reference computes per-frame all-pairs features with a numpy
kernel over each (game, play, frame) group (nn-mps.py:321-426,
add.txt) — rows in ≠ rows out, the one honest grouped-map UDF in the
codebase.  This is its Spark form: ``groupBy(bucket).applyInPandas``
with an Arrow-batched numpy kernel, the *physical alternative* to the
relational self-join plan in plans/trajectory.py::q_pairwise.

When to prefer which (both are one shuffle on the group key):
* relational self-join — whole-stage codegen, no Python workers, and
  the optimizer can prune/push through it; the pair fanout
  materializes as rows (bounded: |group|² per group).
* grouped-map kernel — the fanout stays inside a |group|×|group|
  numpy matrix per group (never rows), so it wins when groups are
  wide (the reference's 22-player frames are 484-cell matrices) or
  when the per-pair math outgrows SQL.  Costs Arrow transfer + a
  Python worker pool.

The kernel reproduces the relational plan's exact arithmetic
(int64-scaled micro sums, HALF_UP rounding, packed-long argmin with
id tiebreak), so both implementations return bitwise-identical
DataFrames — tests/test_pairwise_kernel.py asserts it.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAIRWISE_SCHEMA = (
    "event_id bigint, user_id bigint, n_pairs bigint, n_ally bigint, "
    "mean_dist_ally double, min_dist double, max_dist double, "
    "nearest_event_id bigint, nearest_value double"
)

HOUR_US = 3_600_000_000


def _round_half_up_micros(d: np.ndarray) -> np.ndarray:
    """HALF_UP integer micros of a non-negative float array —
    matching Spark's round(x * 1e6, 0) (np.rint would round
    half-to-even)."""
    return np.floor(d * 1_000_000.0 + 0.5).astype(np.int64)


def _pairwise_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    n = len(pdf)
    ev_id = pdf["event_id"].to_numpy(np.int64)
    user = pdf["user_id"].to_numpy(np.int64)
    val = pdf["value"].to_numpy(np.float64)
    typ = pdf["event_type"].to_numpy()

    if n < 2:
        # Singleton group: the relational plan's left join leaves the
        # stats NULL (not NaN) — nullable dtypes make Arrow emit nulls.
        none_f = pd.array([None] * n, dtype="Float64")
        return pd.DataFrame(
            {
                "event_id": ev_id,
                "user_id": user,
                "n_pairs": np.zeros(n, np.int64),
                "n_ally": np.zeros(n, np.int64),
                "mean_dist_ally": none_f,
                "min_dist": none_f,
                "max_dist": none_f,
                "nearest_event_id": pd.array([None] * n, dtype="Int64"),
                "nearest_value": none_f,
            }
        )

    dist = np.abs(val[:, None] - val[None, :])  # |group|² matrix, never rows
    off_diag = ~np.eye(n, dtype=bool)
    ally = (typ[:, None] == typ[None, :]) & off_diag

    micros = _round_half_up_micros(dist)
    n_pairs = np.full(n, n - 1, np.int64)
    n_ally = ally.sum(axis=1).astype(np.int64)
    ally_micro_sum = np.where(ally, micros, 0).sum(axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_raw = ally_micro_sum / n_ally / 1_000_000.0
    # n_ally == 0 → NULL (nullable Float64), matching sum/NULLIF(n,0)
    mean_dist_ally = pd.array(
        np.where(n_ally > 0, mean_raw, np.nan), dtype="Float64"
    )
    mean_dist_ally[n_ally == 0] = None
    big = np.where(off_diag, dist, np.inf)
    min_dist = big.min(axis=1)
    max_dist = np.where(off_diag, dist, -np.inf).max(axis=1)

    # packed-long argmin: (dist_micros << 32) | neighbor id — identical
    # tiebreak to the relational plan and the DuckDB oracle.
    packed = np.where(
        off_diag, micros * 4_294_967_296 + ev_id[None, :], np.iinfo(np.int64).max
    )
    nearest_idx = packed.argmin(axis=1)
    return pd.DataFrame(
        {
            "event_id": ev_id,
            "user_id": user,
            "n_pairs": n_pairs,
            "n_ally": n_ally,
            "mean_dist_ally": mean_dist_ally,
            "min_dist": min_dist,
            "max_dist": max_dist,
            "nearest_event_id": ev_id[nearest_idx],
            "nearest_value": val[nearest_idx],
        }
    )


def pairwise_features_grouped(events: DataFrame, bucket_us: int = HOUR_US) -> DataFrame:
    """All-pairs interaction features per time bucket via
    applyInPandas — same output contract as plans/trajectory.py::
    q_pairwise (NULL stats for singleton groups)."""
    ev = events.select(
        "user_id",
        "event_id",
        "value",
        "event_type",
        F.expr(f"ts div {bucket_us}").alias("bucket"),
    )
    return ev.groupBy("bucket").applyInPandas(
        lambda pdf: _pairwise_kernel(pdf), schema=PAIRWISE_SCHEMA
    )
