"""The official competition metric as a Spark query (scoring.py:10-52).

RMSE = sqrt(0.5 * (MSE_x + MSE_y)) after an inner join of solution
and submission on the row id.  The reference's doctests
(scoring.py:18-31) pin three exact values — mirrored in
tests/test_scoring.py as exact-value fixtures (SURVEY §5.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REQUIRED_COLS = ("id", "x", "y")


def score(solution: DataFrame, submission: DataFrame, row_id: str = "id") -> float:
    """Join on ``row_id`` and compute sqrt(0.5*(MSEx+MSEy)).

    Validates required columns like scoring.py:34-45; the aggregate
    stays distributed (single-row collect at the end).
    """
    for df, name in ((solution, "solution"), (submission, "submission")):
        missing = [c for c in REQUIRED_COLS if c not in df.columns]
        if missing:
            raise ValueError(f"{name} is missing columns: {missing}")
    sol = solution.select(
        F.col(row_id).alias("id"),
        F.col("x").alias("x_true"),
        F.col("y").alias("y_true"),
    )
    sub = submission.select(
        F.col(row_id).alias("id"),
        F.col("x").alias("x_pred"),
        F.col("y").alias("y_pred"),
    )
    row = (
        sol.join(sub, "id", "inner")
        .agg(
            F.sqrt(
                0.5
                * (
                    F.avg(
                        (F.col("x_true") - F.col("x_pred"))
                        * (F.col("x_true") - F.col("x_pred"))
                    )
                    + F.avg(
                        (F.col("y_true") - F.col("y_pred"))
                        * (F.col("y_true") - F.col("y_pred"))
                    )
                )
            ).alias("rmse")
        )
        .collect()[0]
    )
    return float(row["rmse"])
