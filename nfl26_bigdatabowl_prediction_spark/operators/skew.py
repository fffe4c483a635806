"""Skew-mitigation operators (brief: "skewed keys hurt … salting for
skew").

The reference never needs these (pandas has no shuffle), but at
100 TB a single hot key — one viral document, one player appearing in
every frame — turns a shuffle into one straggler task.  Two patterns:

* ``salted_join``: replicate the build side N ways and scatter the
  probe side by a deterministic hash salt, so a hot join key fans out
  over N reducers instead of one.  Result-identical to the plain
  join (each probe row still meets exactly one replica).  AQE's
  skew-join split handles *sort-merge* skew adaptively; explicit
  salting is the portable form that also covers aggregation-feeding
  joins and pre-AQE engines.

* ``salted_distinct_count``: two-stage distinct aggregation.  Plain
  COUNT(DISTINCT x) per hot key concentrates every x of that key on
  one reducer; stage 1 dedups on (key, salt(x)) — a perfect split,
  since duplicates of x share its hash — stage 2 sums partial
  cardinalities.  Exact, unlike approx_count_distinct.

Plain sums/counts do NOT need salting: map-side partial aggregation
is already a per-partition combine (see tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key fanout spread over ``n_salt``
    partitions.  ``small`` is replicated ``n_salt`` times (cheap when
    it is the dimension side); ``big`` rows are scattered by a
    deterministic hash of the join key columns themselves XOR'd with
    a per-row component, so each (key, salt) bucket holds ~1/N of a
    hot key's rows."""
    # hash over ALL of big's columns: deterministic, and rows of a hot
    # key spread uniformly because the non-key columns vary.
    scatter: Column = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt)).cast(
        "int"
    )
    big_s = big.withColumn("_salt", scatter)
    # replicate via explode of a literal sequence — a generator inside
    # the small side's own stage, not a (nested-loop) join operator.
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return big_s.join(small_r, keys + ["_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    group_keys: list[str],
    distinct_col: str,
    n_salt: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-group COUNT(DISTINCT distinct_col) in two shuffles,
    neither of which concentrates a hot group on one task."""
    stage1 = (
        df.select(*group_keys, F.col(distinct_col).alias("_v"))
        .withColumn("_salt", F.pmod(F.xxhash64(F.col("_v")), F.lit(n_salt)).cast("int"))
        .groupBy(*group_keys, "_salt")
        .agg(F.countDistinct("_v").alias("_partial"))
    )
    return stage1.groupBy(*group_keys).agg(F.sum("_partial").alias(out_col))
