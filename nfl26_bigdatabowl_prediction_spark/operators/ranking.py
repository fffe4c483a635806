"""Exact distributed global ranking — two-level range-partitioned
row numbering, the scale-correct replacement for an unpartitioned
``ROW_NUMBER()/NTILE()`` window.

An ``ORDER BY``-without-``PARTITION BY`` window moves the whole
relation to one partition (Spark's WindowExec warning); fine on a
bounded grid, fatal on a fact- or user-grain table at corpus scale.
The exact alternative used here:

1. ``repartitionByRange`` on the order key (a distributed sort —
   Spark's range partitioner samples boundaries, but with a total
   order key the resulting RANK is boundary-invariant);
2. per-partition ``row_number`` (window PARTITIONED by the physical
   partition id — parallel);
3. a partition-count-sized offset table (one row per partition:
   how many rows sort before it), cumulated with a tiny window whose
   input is bounded by ``spark.sql.shuffle.partitions`` — the
   q_token_budget_trim two-level prefix-sum shape;
4. global rank = offset + local row number.

The caller must pass a TOTAL order (append a unique tiebreak column)
— equal keys across a partition boundary would otherwise make local
numbering ambiguous.

``ntile_from_rank`` reproduces SQL NTILE(k) exactly from (rank, n):
the first ``n % k`` buckets take ``n//k + 1`` rows.  All-integer
arithmetic on non-negative operands, so Spark's truncating ``div``
and DuckDB's flooring ``//`` agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def exact_global_rank(
    df: DataFrame,
    *order: Column,
    rank_col: str = "rank",
    partitions: int | None = None,
) -> DataFrame:
    """Append ``rank_col`` = 1-based global row number under
    ``order`` (which must be a total order) without ever moving the
    relation to a single partition."""
    parted = (
        df.repartitionByRange(partitions, *order)
        if partitions
        else df.repartitionByRange(*order)
    ).withColumn("_pid", F.spark_partition_id())
    # Materialize the range partitioning ONCE.  `local` and `offsets`
    # both consume `parted`; unmaterialized, each consumer re-runs the
    # range exchange, and nothing guarantees the two runs sample the
    # same boundaries (the sampler is seeded per-execution) or that AQE
    # coalesces the no-`partitions` path identically — diverging `_pid`
    # assignments between the join sides would produce silently wrong
    # ranks.  After the round-trip `_pid` is plain column data, so both
    # branches see the identical assignment by construction.  At
    # cluster scale this is one columnar staging pass of the already-
    # shuffled relation — the same cost class as the sort shuffle
    # itself, and the price of determinism for an exact global rank.
    from ..scratch import checkpoint_parquet

    parted = checkpoint_parquet(parted, "rank_parted_")
    local = parted.withColumn(
        "_rn", F.row_number().over(W.partitionBy("_pid").orderBy(*order))
    )
    # one row per partition; the cumulative window input is bounded by
    # the shuffle-partition count (plan contract: bounded-domain
    # unpartitioned window, q_token_budget_trim precedent)
    offsets = (
        parted.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_cnt").over(
                    W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("bigint"))
        .drop("_pid", "_rn", "_off")
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """Exact SQL NTILE(k) bucket from a 1-based ``rank`` and the total
    row count ``n`` (both integral, non-negative)."""
    base = F.floor(n / F.lit(k)).cast("bigint")  # n // k  (non-negative)
    rem = (n % F.lit(k)).cast("bigint")  # n % k
    r0 = rank.cast("bigint") - 1
    big = rem * (base + 1)  # rows covered by the (base+1)-sized buckets
    return F.when(
        r0 < big, F.floor(r0 / (base + 1)).cast("bigint") + 1
    ).otherwise(
        rem + F.floor((r0 - big) / F.greatest(base, F.lit(1))).cast("bigint") + 1
    )
