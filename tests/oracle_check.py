"""Local mirror of the driver's DuckDB differential check.

Stricter than the driver on purpose: we compare cell values *bitwise*
(after row/column canonicalization) and report any cell that is only
approximately equal, because the driver hashes values and we cannot
afford float drift.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _key_repr(v) -> str:
    """Type-normalized repr for row alignment (int64 vs float64
    columns across engines must sort identically; array cells arrive
    as python lists from Spark but numpy arrays from DuckDB)."""
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_key_repr(x) for x in v) + "]"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, (int, float)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return f"{f:.12g}"
    return repr(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by normalized stringified values
    (the driver's compare is order-insensitive)."""
    df = df[sorted(df.columns)].copy()
    key = df.apply(lambda r: tuple(_key_repr(v) for v in r), axis=1)
    df = df.iloc[np.argsort(key.values, kind="stable")].reset_index(drop=True)
    return df


def _cell_equal(a, b) -> tuple[bool, bool]:
    """(exact, close) for one cell pair."""
    if a is None and b is None:
        return True, True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, True
        exact = a == b or repr(a) == repr(b)
        close = exact or math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
        return exact, close
    try:
        if pd.isna(a) and pd.isna(b):
            return True, True
    except (TypeError, ValueError):
        pass
    eq = a == b
    if isinstance(eq, np.ndarray):
        eq = bool(eq.all())
    return eq, eq


# pandas dtype.kind → comparison class.  The driver's value hash is
# type-sensitive (round-1 q_pivot/q_hypertable_rollup: DuckDB HUGEINT
# surfaces as float64 via fetchdf() while Spark yields int64, so equal
# values hash differently).  Catch that class of artifact locally by
# requiring both engines' pandas representations to land in the same
# kind bucket per column.
_KIND = {"i": "int", "u": "int", "f": "float", "b": "bool", "O": "obj", "M": "dt", "m": "td"}


def _dtype_problems(
    name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame
) -> list[str]:
    if len(spark_pdf) == 0:
        return []  # empty frames carry no values to hash
    problems = []
    for col in spark_pdf.columns:
        sd, dd = spark_pdf[col].dtype, duck_pdf[col].dtype
        sk = _KIND.get(sd.kind, sd.kind)
        dk = _KIND.get(dd.kind, dd.kind)
        if sk != dk:
            problems.append(
                f"{name}: dtype-kind mismatch col={col} spark={sd} duck={dd} "
                "(driver value hash is type-sensitive — cast the oracle SQL)"
            )
    return problems


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of problems (empty == pass)."""
    problems: list[str] = []
    sp_cols, du_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sp_cols != du_cols:
        return [f"{name}: column mismatch spark={sp_cols} duck={du_cols}"]
    if len(spark_pdf) != len(duck_pdf):
        return [
            f"{name}: row count mismatch spark={len(spark_pdf)} duck={len(duck_pdf)}"
        ]
    problems.extend(_dtype_problems(name, spark_pdf, duck_pdf))
    if problems:
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    n_approx = 0
    for col in sp_cols:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            exact, close = _cell_equal(x, y)
            if not close:
                problems.append(
                    f"{name}: value mismatch col={col} row={i}: spark={x!r} duck={y!r}"
                )
                if len(problems) > 5:
                    return problems
            elif not exact:
                n_approx += 1
                if n_approx <= 3:
                    problems.append(
                        f"{name}: NON-BITWISE (close) col={col} row={i}: "
                        f"spark={x!r} duck={y!r}"
                    )
    return problems
