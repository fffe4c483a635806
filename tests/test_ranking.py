"""operators/ranking.py — exact distributed global rank + NTILE
reconstruction (the q_rfm scale rewrite, round 6).

The contract: exact_global_rank must equal an unpartitioned
ROW_NUMBER() window for ANY total order, and ntile_from_rank must
equal SQL NTILE(k) for every (n, k) remainder shape — including the
n < k edge where some buckets are empty.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from nfl26_bigdatabowl_prediction_spark.operators.ranking import (
    exact_global_rank,
    ntile_from_rank,
)


@pytest.mark.parametrize("n", [1, 3, 5, 7, 100, 257])
def test_exact_rank_matches_single_partition_window(spark, n):
    df = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 7919) % 101).alias("key"),  # duplicate-heavy key
    )
    got = exact_global_rank(
        df, F.desc("key"), F.col("id"), rank_col="r", partitions=4
    )
    want = df.withColumn(
        "r_ref", F.row_number().over(W.orderBy(F.desc("key"), F.col("id")))
    )
    joined = got.join(want, ["id", "key"]).select("r", "r_ref").collect()
    assert len(joined) == n
    assert all(row.r == row.r_ref for row in joined)


@pytest.mark.parametrize("n,k", [(10, 5), (11, 5), (14, 5), (3, 5), (1, 5),
                                 (100, 7), (6, 6)])
def test_ntile_from_rank_matches_sql_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id"))
    ref = df.select(
        "id", F.ntile(k).over(W.orderBy("id")).cast("bigint").alias("b_ref")
    )
    got = df.select(
        "id",
        ntile_from_rank(F.col("id") + 1, F.lit(n), k).alias("b"),
    )
    rows = got.join(ref, "id").collect()
    assert len(rows) == n
    assert all(r.b == r.b_ref for r in rows), sorted(
        (r.id, r.b, r.b_ref) for r in rows if r.b != r.b_ref
    )
