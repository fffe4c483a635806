"""Direct pins for operators/components.connected_components — both
physical strategies behind the one semantic, and the round-10
regression: the distributed loop's per-round truncation must RESET
plan statistics, not preserve them.

localCheckpoint preserves logical-plan stats
(LogicalRDD.rewriteStatsAndConstraints), and the size-only stats
visitor multiplies join children — so a checkpointed iterative join
loop grows its sizeInBytes bit-length geometrically per round until
java.math.BigInteger overflows ("BigInteger would overflow supported
range").  The 64x honest derivative was the first real input to cross
driver_edge_threshold and died there.  The loop now truncates through
a scratch-parquet round-trip (file-based stats, bounded); the long
path graph below runs enough pointer-jumping rounds that the OLD
checkpointing would have overflowed, so a regression flips this test
from pass to crash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nfl26_bigdatabowl_prediction_spark.operators.components import (
    connected_components,
)


def _labels(df):
    return {r["node"]: r["comp"] for r in df.collect()}


def test_driver_and_distributed_paths_agree(spark):
    """Same clustered graph through both strategies; identical labels
    (min id per component), singletons included."""
    nodes = spark.range(20).select(F.col("id").alias("node"))
    # two components {0..4} (star) and {10,11,12} (chain); 13..19 isolated
    e = [(0, 1), (0, 2), (0, 3), (3, 4), (10, 11), (11, 12)]
    edges = spark.createDataFrame(e, "src long, dst long")
    want = {n: 0 for n in range(5)}
    want.update({10: 10, 11: 10, 12: 10})
    want.update({n: n for n in range(5, 10)})
    want.update({n: n for n in range(13, 20)})
    got_driver = _labels(connected_components(nodes, edges))
    got_dist = _labels(
        connected_components(nodes, edges, driver_edge_threshold=0)
    )
    assert got_driver == want
    assert got_dist == want


def test_distributed_loop_stats_stay_bounded_over_many_rounds(spark):
    """A 100k-node path graph forced onto the distributed strategy:
    pointer jumping needs ~17 rounds, enough that per-round stats
    preservation would overflow BigInteger before converging.  Passing
    means the truncation resets stats every round AND the doubling
    actually converges (one component labeled by its min node)."""
    n = 100_000
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    out = connected_components(
        nodes, edges, driver_edge_threshold=0
    )
    agg = out.agg(
        F.countDistinct("comp").alias("ncomp"),
        F.max("comp").alias("mx"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert agg["n"] == n
    assert agg["ncomp"] == 1
    assert agg["mx"] == 0
