"""plans/vectors._neardup_edges — LSH bits knob + bucket-occupancy guard.

Round-6/7 carried ask #7: the per-bucket collect_list is the OOM point
at 100 TB, so an over-full bucket must raise explicitly (the
MAX_BRUTE_QUERIES pattern) BEFORE the bucket array materializes, and
``bits`` is the documented remedy.  The oracle stays pinned to the
8-bit default (q_embed_neardup / q_embed_components in the registry);
these tests cover the guard and the knob.
"""

from __future__ import annotations

import pytest

from nfl26_bigdatabowl_prediction_spark.plans.vectors import (
    EMBED_DIM,
    _neardup_edges,
)

from .conftest import SF_DIR


def _same_vectors(spark, n):
    return spark.createDataFrame(
        [(i, [1.0] * EMBED_DIM) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    )


def test_guard_fires_on_overfull_bucket(spark):
    # identical vectors land in one bucket; cap 2 < occupancy 4
    with pytest.raises(Exception, match="max_bucket=2"):
        _neardup_edges(_same_vectors(spark, 4), max_bucket=2).count()


def test_guard_passes_at_cap(spark):
    # occupancy == cap is allowed (<=, not <): 4 vectors, cap 4 →
    # C(4,2) = 6 cosine-1.0 edges
    assert _neardup_edges(_same_vectors(spark, 4), max_bucket=4).count() == 6


def test_guard_check_precedes_bucket_materialization(spark):
    """The count pre-pass must sit below the payload collect: the
    broadcast-join filter appears AFTER (deeper than) the
    ObjectHashAggregate in the executed plan string, i.e. the payload
    shuffle only ever sees buckets the guard admitted."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df = _neardup_edges(e)
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in s and "ObjectHashAggregate" in s
    assert s.index("BroadcastHashJoin") > s.index("ObjectHashAggregate")


def test_bits_knob_trades_recall_for_bucket_size(spark):
    """More bits → finer buckets → no more candidates than fewer bits
    admit (monotone non-increasing candidate set), and the default-8
    result is exactly the registry oracle's candidate set."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pairs8 = {
        (r.vec_a, r.vec_b) for r in _neardup_edges(e, bits=8).collect()
    }
    pairs4 = {
        (r.vec_a, r.vec_b) for r in _neardup_edges(e, bits=4).collect()
    }
    assert pairs8 <= pairs4
    assert len(pairs8) > 0
