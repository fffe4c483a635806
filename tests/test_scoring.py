"""Exact-value metric fixtures from the reference's only executable
tests (scoring.py:18-31 doctests; FIXTURES.md §1)."""

from __future__ import annotations

import pytest

from nfl26_bigdatabowl_prediction_spark.ml.scoring import score
from nfl26_bigdatabowl_prediction_spark.schema import SUBMISSION_SCHEMA

IDS = ["21_12_2_1", "21_12_2_2", "21_12_2_3"]
SOLUTION = list(zip(IDS, [1.0, 2.0, 3.0], [4.0, 2.0, 3.0]))

CASES = [
    (list(zip(IDS, [1.1, 2.0, 3.0], [4.0, 2.2, 3.0])), 0.0913),
    (list(zip(IDS, [0.0, 2.0, 3.0], [4.0, 2.2, 3.0])), 0.4163),
    (list(zip(IDS, [1.0, 2.0, 1.0], [4.0, 0.0, 3.0])), 1.1547),
]


@pytest.mark.parametrize("sub_rows,expected", CASES)
def test_doctest_values(spark, sub_rows, expected):
    sol = spark.createDataFrame(SOLUTION, SUBMISSION_SCHEMA)
    sub = spark.createDataFrame(sub_rows, SUBMISSION_SCHEMA)
    assert round(score(sol, sub), 4) == expected


def test_missing_column_raises(spark):
    sol = spark.createDataFrame(SOLUTION, SUBMISSION_SCHEMA)
    bad = sol.drop("y")
    with pytest.raises(ValueError, match="missing columns"):
        score(sol, bad)
