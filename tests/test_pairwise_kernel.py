"""Grouped-map pairwise kernel ≡ relational self-join plan.

Two physical strategies for the same logical operator (SURVEY §2.9
U3 vs §2.3 J4) must return identical results — including NULL
placement for singleton groups and the packed-argmin tiebreak.
"""

from __future__ import annotations

import pandas as pd

from nfl26_bigdatabowl_prediction_spark.operators.pairwise import (
    pairwise_features_grouped,
)
from nfl26_bigdatabowl_prediction_spark.plans.registry import QUERIES
from nfl26_bigdatabowl_prediction_spark.sources.io import table

SF_DIR = "/root/testdata/sf0.001"


def test_kernel_matches_relational_plan(spark):
    relational = QUERIES["q_pairwise"](spark, SF_DIR).toPandas()
    kernel = pairwise_features_grouped(table(spark, SF_DIR, "events")).toPandas()

    assert len(relational) == len(kernel) > 0
    cols = list(relational.columns)
    assert set(cols) == set(kernel.columns)

    r = relational.sort_values("event_id").reset_index(drop=True)
    k = kernel[cols].sort_values("event_id").reset_index(drop=True)
    for c in cols:
        rv, kv = r[c], k[c]
        assert (rv.isna() == kv.isna()).all(), f"null placement differs in {c}"
        mask = ~rv.isna()
        # exact equality — both strategies run the same integer-scaled
        # arithmetic, so not even float tolerance is needed.
        assert (
            rv[mask].to_numpy(float) == kv[mask].to_numpy(float)
        ).all(), f"values differ in {c}"


def test_kernel_singleton_group_nulls(spark):
    ev = table(spark, SF_DIR, "events").limit(1)
    out = pairwise_features_grouped(ev).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n_pairs"] == 0 and row["n_ally"] == 0
    assert pd.isna(row["mean_dist_ally"]) and pd.isna(row["nearest_event_id"])
