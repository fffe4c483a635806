"""Approximate aggregates vs their exact twins.

q_approx_distinct / q_quantile_approx have no DuckDB oracle (sketch
estimates are engine-specific); these tests bound them against the
exact queries so the scale path is still *validated*, not just run.
"""

from __future__ import annotations

from nfl26_bigdatabowl_prediction_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_approx_distinct_within_rsd(spark):
    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in QUERIES["q_approx_distinct"](spark, SF_DIR).collect()
    }
    from pyspark.sql import functions as F

    from nfl26_bigdatabowl_prediction_spark.sources.io import table

    exact = {
        r["l_returnflag"]: r["n"]
        for r in table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.15, (k, approx[k], n)  # 3x rsd


def test_approx_percentile_within_band(spark):
    rows = {
        r["l_returnflag"]: r
        for r in QUERIES["q_quantile_approx"](spark, SF_DIR).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in QUERIES["q_quantile"](spark, SF_DIR).collect()
    }
    for k, er in exact.items():
        ar = rows[k]
        assert abs(ar["price_median_approx"] - er["price_median"]) <= 0.02 * er["price_median"]
        assert abs(ar["qty_p90_approx"] - er["qty_p90"]) <= max(0.05 * er["qty_p90"], 1.0)
