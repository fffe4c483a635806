"""Differential test: every registered query vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS check (row-count + schema +
order-insensitive values) at the local scale factor, but bitwise.
"""

from __future__ import annotations

import pytest

from nfl26_bigdatabowl_prediction_spark.plans.registry import ORACLES, QUERIES

from .oracle_check import compare


def all_query_names():
    return sorted(QUERIES.keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only contract (non-SQL-expressible op): just require rows
        assert len(spark_pdf) >= 0
        return
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, "\n".join(problems)
