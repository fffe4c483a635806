"""Window-suite parity against pandas — the reference's own engine.

The DuckDB oracle (test_oracle.py) proves Spark-vs-SQL agreement;
this file proves the semantics match the REFERENCE's pandas idioms
(main_cuda.py:208-233, main_mps.py:185-240):

  shift(k)                       ↔ q_lag
  rolling(w, min_periods=1)      ↔ q_rolling  (shrinking head frames)
  diff()                         ↔ q_diff
  ewm(alpha, adjust=False).mean()↔ q_ewm      (the custom operator)
  cumcount()                     ↔ q_cumcount

Tolerance 1e-9 relative: pandas computes (1-alpha) at runtime while
the Spark/DuckDB sides use the literal 0.7 — a 1-ulp difference that
compounds through the EWM recurrence; everything else is exact but a
shared comparison keeps the test simple.  NaN placement must match
exactly (pandas NaN ↔ Spark NULL, SURVEY §4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from nfl26_bigdatabowl_prediction_spark.plans.registry import QUERIES
from nfl26_bigdatabowl_prediction_spark.sources.io import table

SF_DIR = "/root/testdata/sf0.001"


def _events_pd(spark) -> pd.DataFrame:
    return (
        table(spark, SF_DIR, "events")
        .select("event_id", "ts", "user_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )


def _check(spark_df: pd.DataFrame, ref: pd.DataFrame, cols: list[str]) -> None:
    s = spark_df.sort_values("event_id").reset_index(drop=True)
    r = ref.sort_values("event_id").reset_index(drop=True)
    assert len(s) == len(r) > 0
    for c in cols:
        sv, rv = s[c].to_numpy(float), r[c].to_numpy(float)
        assert (np.isnan(sv) == np.isnan(rv)).all(), f"NaN placement differs: {c}"
        m = ~np.isnan(sv)
        assert np.allclose(sv[m], rv[m], rtol=1e-9, atol=1e-9), f"values differ: {c}"


def test_lag_matches_pandas_shift(spark):
    pdf = _events_pd(spark)
    g = pdf.groupby("user_id")["value"]
    ref = pdf[["event_id"]].assign(
        value_lag1=g.shift(1), value_lag2=g.shift(2), value_lag3=g.shift(3)
    )
    got = QUERIES["q_lag"](spark, SF_DIR).toPandas()
    _check(got, ref, ["value_lag1", "value_lag2", "value_lag3"])


def test_rolling_matches_pandas_min_periods_1(spark):
    pdf = _events_pd(spark)
    g = pdf.groupby("user_id")["value"]
    ref = pdf[["event_id"]].assign(
        roll3_mean=g.transform(lambda s: s.rolling(3, min_periods=1).mean()).round(6),
        roll3_std=g.transform(lambda s: s.rolling(3, min_periods=1).std()).round(6),
        roll5_max=g.transform(lambda s: s.rolling(5, min_periods=1).max()),
        roll5_min=g.transform(lambda s: s.rolling(5, min_periods=1).min()),
    )
    got = QUERIES["q_rolling"](spark, SF_DIR).toPandas()
    # pandas rolling(3).std() of a 1-row head frame is NaN; Spark
    # stddev_samp over the same shrunk frame is NULL — both land as
    # NaN here, so _check's placement assert covers SURVEY §4.
    _check(got, ref, ["roll3_mean", "roll3_std", "roll5_max", "roll5_min"])


def test_diff_matches_pandas(spark):
    pdf = _events_pd(spark)
    ref = pdf[["event_id"]].assign(
        value_delta=pdf.groupby("user_id")["value"].diff()
    )
    got = QUERIES["q_diff"](spark, SF_DIR).toPandas()
    _check(got, ref, ["value_delta"])


def test_ewm_matches_pandas_adjust_false(spark):
    pdf = _events_pd(spark)
    ref = pdf[["event_id"]].assign(
        ewm03=pdf.groupby("user_id")["value"].transform(
            lambda s: s.ewm(alpha=0.3, adjust=False).mean()
        )
    )
    got = QUERIES["q_ewm"](spark, SF_DIR).toPandas()
    _check(got, ref, ["ewm03"])


def test_cumcount_matches_pandas(spark):
    pdf = _events_pd(spark)
    ref = pdf[["event_id"]].assign(
        frames_elapsed=pdf.groupby("user_id").cumcount()
    )
    got = QUERIES["q_cumcount"](spark, SF_DIR).toPandas()
    _check(got, ref, ["frames_elapsed"])


def test_asof_join_matches_pandas_merge_asof(spark):
    """General as-of (operators/asof.py) vs pandas merge_asof — the
    reference-engine semantics for backward as-of with exact-match
    inclusion and tolerance, on the real events table."""
    from nfl26_bigdatabowl_prediction_spark.operators.asof import asof_join

    ev = table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "value", "event_type"
    )
    left = ev.filter(ev.event_type == "purchase").drop("event_type")
    right = ev.filter(ev.event_type == "click").drop("event_type")
    tol = 2 * 3600 * 1_000_000
    got = (
        asof_join(
            left,
            right,
            on="ts",
            by=["user_id"],
            right_cols=["event_id", "value"],
            tiebreak="event_id",
            dedup_right=True,
            tolerance_us=tol,
        )
        .select("user_id", "event_id", "ts", "event_id_asof", "value_asof")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    lp = left.toPandas().sort_values("ts").reset_index(drop=True)
    rp = right.toPandas()
    # dedup_right: keep the max-event_id row per (user_id, ts)
    rp = (
        rp.sort_values(["user_id", "ts", "event_id"])
        .groupby(["user_id", "ts"], as_index=False)
        .tail(1)
        .sort_values("ts")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lp,
        rp.rename(columns={"event_id": "event_id_asof", "value": "value_asof"}),
        on="ts",
        by="user_id",
        direction="backward",
        tolerance=tol,
    ).sort_values("event_id").reset_index(drop=True)

    assert len(got) == len(want) > 0
    for c in ["event_id_asof", "value_asof"]:
        g, w = got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float)
        both_nan = np.isnan(g) & np.isnan(w)
        assert (both_nan | (g == w)).all(), c
