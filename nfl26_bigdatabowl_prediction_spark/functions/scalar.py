"""Scalar expression builders (SURVEY.md §2.7, F1-F10).

Every scalar the reference computes with numpy maps to a built-in
Spark SQL function here — JVM-side, inside whole-stage codegen.  No
Python UDFs in this module (UDFs are the slow path; see §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clip(c: Column, lo: float, hi: float) -> Column:
    """np.clip (main_cuda.py:437-438, 1529-1530) → greatest/least (F3)."""
    return F.greatest(F.lit(float(lo)), F.least(F.lit(float(hi)), c))


def cents(c: Column) -> Column:
    """Scale a money-ish double to an exact integer (×100).

    Summing doubles is order-dependent (partial aggregation order is
    nondeterministic on any parallel engine); summing int64 is exact
    and order-independent.  All judged money aggregates go through
    this so the Spark result hashes identically to the DuckDB oracle.
    """
    return F.round(c * F.lit(100.0), 0).cast("bigint")


def make_id(*cols: Column | str) -> Column:
    """Submission id: concat(game,'_',play,'_',nfl,'_',frame)
    (main_cuda.py:415-420, 1534-1537) → concat_ws (F6)."""
    return F.concat_ws("_", *cols)


def parse_feet_inches(c: Column, default: float | None = None) -> Column:
    """'6-2' → 74 inches with a try/except default path
    (main_cuda.py:147-153, nn-mps.py:57-62) → split + cast + coalesce (F5).

    Casting a non-numeric fragment yields NULL (Spark ANSI off /
    try_cast), which coalesce turns into the default — same semantics
    as the reference's except-branch.
    """
    parts = F.split(c, "-")
    inches = (
        parts.getItem(0).try_cast("double") * F.lit(12.0)
        + parts.getItem(1).try_cast("double")
    )
    if default is not None:
        inches = F.coalesce(inches, F.lit(float(default)))
    return inches


def wrap_angle_deg(c: Column) -> Column:
    """Wrap a degree delta into (-180, 180]: x - 360*sign(x) when |x|>180
    (nn-mps.py:217-219) → abs/signum/when (F4)."""
    return F.when(F.abs(c) > 180.0, c - F.lit(360.0) * F.signum(c)).otherwise(c)


def dummy(c: Column, value: str) -> Column:
    """(col == 'X').astype(int) one-hot flag (main_cuda.py:199-202) (P12)."""
    return F.when(c == F.lit(value), F.lit(1)).otherwise(F.lit(0))
