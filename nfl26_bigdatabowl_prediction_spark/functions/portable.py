"""Portable deterministic hashing.

Two hash tiers:

* **Scale path** (production): ``F.xxhash64`` — JVM-native, codegen'd,
  the right choice on a 1000-executor cluster.  Not oracle-checkable
  because DuckDB has no xxhash64.
* **Oracle path** (judged queries): arithmetic hashes expressible
  identically in Spark SQL and ANSI/DuckDB SQL, so the differential
  test hashes bitwise-equal.  Integer arithmetic only — no float
  nondeterminism.

Used by dedup (MinHash/SimHash), fold assignment (SURVEY §2.10 M1,
main_cuda.py:728-737 GroupKFold → hash-mod fold column), and document
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Knuth multiplicative constant; 2**32 modulus keeps int64 math exact
# (key * constant stays far below 2**63 for any realistic key).
_KNUTH = 2654435761
_MOD32 = 4294967296
_POLY_MOD = 1000000007  # prime modulus for the rolling hash


def knuth_fold_expr(key: Column, k: int) -> Column:
    """Deterministic grouped-CV fold id:
    (((key % (1e9+7)) * 2654435761) % 2^32) % k.

    Replaces sklearn GroupKFold (main_cuda.py:596-604, 1465-1467) with
    a join-free column — leakage-safe (whole group lands in one fold)
    and identical on any engine.  The pre-modulus bounds the product
    inside int64 for arbitrarily large keys (a 7×10⁹ id × the Knuth
    constant overflows; 100 TB ids will be larger still) and is the
    identity for every oracle-checked fixture (ids < 1e9+7 there).
    Production alternative: ``pmod(xxhash64(key), k)``.
    """
    pre = key.cast("bigint") % F.lit(_POLY_MOD)
    return ((pre * F.lit(_KNUTH)) % F.lit(_MOD32)) % F.lit(k)


def knuth_fold_sql(key_sql: str, k: int) -> str:
    """DuckDB/ANSI twin of :func:`knuth_fold_expr`."""
    return (
        f"((((CAST({key_sql} AS BIGINT) % {_POLY_MOD}) * {_KNUTH})"
        f" % {_MOD32}) % {k})"
    )


def portable_hash_sql_spark(col_sql: str) -> str:
    """Polynomial rolling hash h = fold(h*31 + ascii(ch)) mod p, as
    Spark SQL text (use via ``F.expr``).  A strict left fold over the
    characters — the identical fold ``list_reduce`` performs in the
    DuckDB twin, so both engines produce the same int64 bit-for-bit.
    """
    return (
        f"aggregate(transform(sequence(1, length({col_sql})), "
        f"i -> cast(ascii(substr({col_sql}, i, 1)) as bigint)), "
        f"cast(0 as bigint), (acc, ch) -> (acc * 31 + ch) % {_POLY_MOD})"
    )


def portable_hash_sql_duckdb(col_sql: str) -> str:
    """DuckDB twin of :func:`portable_hash_sql_spark`."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({col_sql}) + 1), "
        f"i -> CAST(ascii(substring({col_sql}, i, 1)) AS BIGINT))), "
        f"(acc, ch) -> (acc * 31 + ch) % {_POLY_MOD})"
    )


def portable_hash_expr(col_sql: str) -> Column:
    """Spark Column form of the portable polynomial hash."""
    return F.expr(portable_hash_sql_spark(col_sql))
