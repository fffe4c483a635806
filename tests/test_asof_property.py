"""Property test: operators/asof.py vs pandas merge_asof on random
small frames (both directions, with/without ties and empty sides).
hypothesis drives the edge cases the fixture data can't: duplicate
timestamps, left-only users, right-only users, single-row groups."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nfl26_bigdatabowl_prediction_spark.operators.asof import asof_join

ROW = st.tuples(
    st.integers(min_value=0, max_value=3),     # user
    st.integers(min_value=0, max_value=20),    # ts
    st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
)


def _pandas_asof(l, r, direction):
    if len(r):
        # dedup: max event_id per (user, ts) — the operator's
        # dedup_right convention
        r = (
            r.sort_values(["user", "ts", "eid"])
            .groupby(["user", "ts"], as_index=False)
            .last()
        )
    out = []
    for u, lg in l.groupby("user"):
        rg = r[r["user"] == u] if len(r) else r
        lg = lg.sort_values(["ts", "eid"])
        if len(rg):
            m = pd.merge_asof(
                lg,
                rg[["ts", "eid", "val"]].rename(
                    columns={"eid": "eid_asof", "val": "val_asof"}
                ).assign(ts_asof=lambda d: d["ts"]).sort_values("ts"),
                on="ts",
                direction=direction,
            )
        else:
            # float NaN (not object None): keeps the all-NA columns'
            # dtype aligned with merge_asof's NaN output so pd.concat
            # doesn't hit the all-NA-entries FutureWarning.
            m = lg.assign(
                eid_asof=float("nan"), val_asof=float("nan"), ts_asof=float("nan")
            )
        out.append(m)
    if out:
        return pd.concat(out)
    return l.assign(
        eid_asof=float("nan"), val_asof=float("nan"), ts_asof=float("nan")
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    lrows=st.lists(ROW, min_size=0, max_size=12),
    rrows=st.lists(ROW, min_size=0, max_size=12),
)
def test_asof_matches_pandas(spark, direction, lrows, rrows):
    lp = pd.DataFrame(
        [(u, t, v, i) for i, (u, t, v) in enumerate(lrows)],
        columns=["user", "ts", "val", "eid"],
    )
    rp = pd.DataFrame(
        [(u, t, v, 100 + i) for i, (u, t, v) in enumerate(rrows)],
        columns=["user", "ts", "val", "eid"],
    )
    schema = "user bigint, ts bigint, val double, eid bigint"
    l = spark.createDataFrame(lp, schema=schema) if len(lp) else spark.createDataFrame([], schema)
    r = spark.createDataFrame(rp, schema=schema) if len(rp) else spark.createDataFrame([], schema)

    got = (
        asof_join(
            l, r, on="ts", by=["user"], right_cols=["eid", "val"],
            tiebreak="eid", dedup_right=True, direction=direction,
        )
        .select("user", "ts", "eid", "eid_asof", "val_asof", "ts_asof")
        .toPandas()
        .sort_values(["user", "ts", "eid"])
        .reset_index(drop=True)
    )
    want = (
        _pandas_asof(lp, rp, direction)[
            ["user", "ts", "eid", "eid_asof", "val_asof", "ts_asof"]
        ]
        .sort_values(["user", "ts", "eid"])
        .reset_index(drop=True)
        if len(lp)
        else got.iloc[0:0]
    )
    assert len(got) == len(want)
    for c in ["eid_asof", "ts_asof"]:
        ga = got[c].astype("Float64").to_numpy()
        wa = want[c].astype("Float64").to_numpy() if len(want) else ga
        assert ((ga == wa) | (pd.isna(ga) & pd.isna(wa))).all(), (c, got, want)


def _pandas_nearest(l, r):
    """Reference nearest = backward + forward + the operator's
    documented tie rule (ties → backward), built from the same
    per-direction pandas reference above."""
    b = _pandas_asof(l, r, "backward").rename(
        columns={"eid_asof": "b_eid", "val_asof": "b_val", "ts_asof": "b_ts"}
    )
    f = _pandas_asof(l, r, "forward")[["user", "ts", "eid", "eid_asof", "val_asof", "ts_asof"]].rename(
        columns={"eid_asof": "f_eid", "val_asof": "f_val", "ts_asof": "f_ts"}
    )
    m = b.merge(f, on=["user", "ts", "eid"])
    rows = []
    for _, row in m.iterrows():
        has_b, has_f = pd.notna(row["b_ts"]), pd.notna(row["f_ts"])
        if has_b and (not has_f or row["ts"] - row["b_ts"] <= row["f_ts"] - row["ts"]):
            pick = ("b_eid", "b_val", "b_ts") if has_b else ("f_eid", "f_val", "f_ts")
        else:
            pick = ("f_eid", "f_val", "f_ts")
        rows.append(
            (row["user"], row["ts"], row["eid"],
             row[pick[0]], row[pick[1]], row[pick[2]])
        )
    return pd.DataFrame(
        rows, columns=["user", "ts", "eid", "eid_asof", "val_asof", "ts_asof"]
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    lrows=st.lists(ROW, min_size=0, max_size=12),
    rrows=st.lists(ROW, min_size=0, max_size=12),
)
def test_asof_nearest_matches_pandas(spark, lrows, rrows):
    lp = pd.DataFrame(
        [(u, t, v, i) for i, (u, t, v) in enumerate(lrows)],
        columns=["user", "ts", "val", "eid"],
    )
    rp = pd.DataFrame(
        [(u, t, v, 100 + i) for i, (u, t, v) in enumerate(rrows)],
        columns=["user", "ts", "val", "eid"],
    )
    schema = "user bigint, ts bigint, val double, eid bigint"
    l = spark.createDataFrame(lp, schema=schema) if len(lp) else spark.createDataFrame([], schema)
    r = spark.createDataFrame(rp, schema=schema) if len(rp) else spark.createDataFrame([], schema)

    got = (
        asof_join(
            l, r, on="ts", by=["user"], right_cols=["eid", "val"],
            tiebreak="eid", dedup_right=True, direction="nearest",
        )
        .select("user", "ts", "eid", "eid_asof", "val_asof", "ts_asof")
        .toPandas()
        .sort_values(["user", "ts", "eid"])
        .reset_index(drop=True)
    )
    want = (
        _pandas_nearest(lp, rp)
        .sort_values(["user", "ts", "eid"])
        .reset_index(drop=True)
        if len(lp)
        else got.iloc[0:0]
    )
    assert len(got) == len(want)
    for c in ["eid_asof", "ts_asof"]:
        ga = got[c].astype("Float64").to_numpy()
        wa = want[c].astype("Float64").to_numpy() if len(want) else ga
        assert ((ga == wa) | (pd.isna(ga) & pd.isna(wa))).all(), (c, got, want)
