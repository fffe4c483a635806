"""M1 — leakage-safe grouped cross-validation folds
(main_cuda.py:596-604, 728-737, 1465-1467: GroupKFold by trajectory).

MLlib's CrossValidator cannot group-split, so folds are a hash-mod
column over the group key: every row of a trajectory lands in the
same fold, deterministically, join-free, on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_fold(
    df: DataFrame,
    group_cols: list[str],
    k: int = 5,
    fold_col: str = "fold",
    portable: bool = False,
) -> DataFrame:
    """Add a fold column in [0, k).  ``portable=True`` uses the
    oracle-checkable Knuth hash (functions.portable); default is
    xxhash64 — the production path (better mixing, JVM codegen)."""
    if portable:
        from ..functions.portable import knuth_fold_expr

        # portable mode supports a single numeric key (oracle parity)
        assert len(group_cols) == 1, "portable folds need one numeric key"
        return df.withColumn(fold_col, knuth_fold_expr(F.col(group_cols[0]), k))
    return df.withColumn(
        fold_col, F.pmod(F.xxhash64(*[F.col(c) for c in group_cols]), F.lit(k))
    )
