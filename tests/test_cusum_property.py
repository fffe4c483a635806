"""Property test: the CUSUM prefix identity used by q_cusum
(S_t = cs_t − min(0, prefix-min cs)) must equal the stateful
recursion S_t = max(0, S_{t−1} + d_t) on arbitrary series —
hypothesis drives sign flips, all-negative runs, and ties that the
events fixture can't guarantee."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

ROW = st.tuples(
    st.integers(min_value=0, max_value=2),       # user
    st.integers(min_value=-50, max_value=50),    # deviation d_t (int cents)
)


def _recursive_cusum(devs):
    s, out = 0, []
    for d in devs:
        s = max(0, s + d)
        out.append(s)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(ROW, min_size=1, max_size=24))
def test_cusum_prefix_identity_matches_recursion(spark, rows):
    data = [(i, u, d) for i, (u, d) in enumerate(rows)]
    df = spark.createDataFrame(data, "event_id bigint, user_id bigint, dev_c bigint")
    wcs = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    got = (
        df.withColumn("cs_c", F.sum("dev_c").over(wcs))
        .withColumn(
            "s_c", F.col("cs_c") - F.least(F.lit(0), F.min("cs_c").over(wcs))
        )
        .orderBy("event_id")
        .select("user_id", "event_id", "s_c")
        .collect()
    )
    # reference: per-user stateful recursion in event order
    per_user: dict = {}
    for i, (u, d) in enumerate(rows):
        per_user.setdefault(u, []).append((i, d))
    want: dict = {}
    for u, items in per_user.items():
        ss = _recursive_cusum([d for _, d in items])
        for (i, _), s in zip(items, ss):
            want[i] = s
    for r in got:
        assert r.s_c == want[r.event_id], (r, want[r.event_id])
